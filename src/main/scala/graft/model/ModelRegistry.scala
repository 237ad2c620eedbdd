package graft.model

import graft.functions.K
import graft.operators.Pooling

/** Quantization modes of the reference
  * (/root/reference/src/models/quantization.rs:1-8). `Dynamic` fits
  * activation ranges per batch, so the whole input must be one batch
  * (src/text_embedding/impl.rs:330-347) — in Spark terms: the operator
  * must run single-partition (`coalesce(1)`), an anti-parallel semantic
  * constraint we surface as a flag rather than silently violate. */
sealed trait Quantization
object Quantization {
  case object None extends Quantization
  case object Static extends Quantization
  case object Dynamic extends Quantization
}

/** The reference keeps a registry per modality (text_embedding.rs,
  * sparse.rs, bgem3.rs, reranking.rs, image_embedding.rs under
  * /root/reference/src/models/); here one catalog with a `kind`
  * discriminator serves the same five surfaces. */
sealed trait ModelKind
object ModelKind {
  case object Dense extends ModelKind
  case object Sparse extends ModelKind
  case object Bgem3 extends ModelKind
  case object Rerank extends ModelKind
  case object Image extends ModelKind
}

/** Model descriptor — the analogue of the reference's `ModelInfo`
  * (/root/reference/src/models/model_info.rs:4-14): name, dim,
  * description, pooling default (src/text_embedding/impl.rs:158-218),
  * quantization, truncation cap, kind, output-key override
  * (src/models/text_embedding.rs:423 `sentence_embedding` for Gemma),
  * and external-initializer side files (`additional_files`,
  * src/models/reranking.rs:32 — `model.onnx.data` for the >2 GiB ONNX
  * external-data layout). */
final case class ModelInfo(
    name: String,
    dim: Int,
    description: String,
    pooling: Pooling,
    quantization: Quantization = Quantization.None,
    maxLength: Int = K.MaxLength,
    kind: ModelKind = ModelKind.Dense,
    outputKey: Option[String] = None,
    additionalFiles: Seq[String] = Nil)

/** Static in-memory registry, the analogue of the reference's
  * `OnceLock<HashMap<Model, ModelInfo>>`
  * (/root/reference/src/models/text_embedding.rs:6, 556-558). Names are
  * this engine's own (deterministic hashing-projector variants) — the
  * reference's ONNX checkpoints have no meaning in a zero-egress build,
  * but the registry surface (default model, lookup, list, user-defined
  * add — src/text_embedding/init.rs:88-138) is preserved. */
object ModelRegistry {
  val DefaultModel = "graft-hash-64-mean"

  private val builtin: Map[String, ModelInfo] = Seq(
    ModelInfo("graft-hash-64-mean", 64, "64-d hashing projector, mean pooling", Pooling.Mean),
    ModelInfo("graft-hash-64-cls", 64, "64-d hashing projector, CLS pooling", Pooling.Cls),
    ModelInfo("graft-hash-64-last", 64, "64-d hashing projector, last-token pooling", Pooling.Last),
    ModelInfo("graft-hash-128-mean", 128, "128-d hashing projector, mean pooling", Pooling.Mean),
    ModelInfo("graft-hash-384-mean", 384, "384-d hashing projector, mean pooling (BGE-small shape)", Pooling.Mean),
    ModelInfo("graft-hash-64-mean-dynq", 64, "64-d projector, dynamic quantization (single-batch rule)",
      Pooling.Mean, Quantization.Dynamic),
    ModelInfo("graft-sparse-64", 64, "occurrence-score sparse extractor (SPLADE role)",
      Pooling.Mean, kind = ModelKind.Sparse),
    ModelInfo("graft-bgem3-64", 64, "joint dense+sparse+colbert (BGE-M3 role)",
      Pooling.Mean, kind = ModelKind.Bgem3),
    ModelInfo("graft-rerank-jaccard", 1, "token-set Jaccard cross-encoder role",
      Pooling.Mean, kind = ModelKind.Rerank,
      // the reference's BGE v2-m3 reranker ships its weights as ONNX
      // external data beside the graph (reranking.rs:32)
      additionalFiles = Seq("model.onnx.data")),
    ModelInfo("graft-image-16", 16, "pixel hash projector, CLIP preprocessing",
      Pooling.Mean, kind = ModelKind.Image),
    ModelInfo("graft-hash-64-sentemb", 64, "pooled-output model (sentence_embedding key, Gemma role)",
      Pooling.Mean, outputKey = Some("sentence_embedding")),
    ModelInfo("graft-transformer-8", 8,
      "transformer-contract backend: left-pad batch-longest, causal+pad mask, last-token pooling (Qwen3 role)",
      Pooling.Last),
    ModelInfo("graft-moe-8", 8,
      "MoE-routing backend: top-2 expert dispatch, shared output bias (NomicBert-MoE role)",
      Pooling.Mean),
    ModelInfo("graft-gqa-8", 8,
      "learned GQA attention with q/k norms, weights from a sharded safetensors checkpoint",
      Pooling.Last),
    ModelInfo("graft-qwen3-8", 8,
      "one complete learned decoder layer (pre-norm residuals, final model norm) from safetensors",
      Pooling.Last),
    ModelInfo("graft-qwen3-8-x2", 8,
      "two-layer learned decoder stack with distinct per-layer weights",
      Pooling.Last),
    ModelInfo("graft-qwen3-8-full", 8,
      "the COMPLETE learned model: learned embed_tokens + two-layer stack + final norm from one checkpoint",
      Pooling.Last),
    ModelInfo("graft-nomic-8", 8,
      "the COMPLETE learned NomicBert-MoE model: word+type embeddings, emb_ln, post-norm bidirectional blocks, megablocks MoE layer, from one checkpoint",
      Pooling.Mean)
  ).map(m => m.name -> m).toMap

  /** The breadth catalog: one row per reference registry variant, with
    * the reference's REAL structural metadata — dim, default pooling
    * (text_embedding/impl.rs:158-218), quantization mode
    * (impl.rs:220-268: `Q` names quantize; six families dynamically —
    * the single-batch rule — the rest statically; the 4-bit variant is
    * batching-safe `None`), output-key override (text_embedding.rs:423
    * `sentence_embedding`), and external-initializer side files
    * (text_embedding.rs:293-296, 332, 422-443; reranking.rs:32) —
    * under synthetic names (zero-egress: the checkpoints themselves
    * are meaningless here; the catalog SHAPE is what the registry
    * surface and its exhaustiveness spec exercise). Counts mirror the
    * reference exactly: 46 dense text (text_embedding.rs:603-719's
    * exhaustive guard), 2 sparse (sparse.rs), 1 quantized joint
    * (bgem3.rs), 4 rerankers (reranking.rs), 5 image
    * (image_embedding.rs). */
  private val catalog: Map[String, ModelInfo] = {
    import Pooling.{Cls, Mean}
    import Quantization.{Dynamic, Static}
    val none = Quantization.None
    // (ordinal, dim, pooling, quantization, outputKey, additionalFiles)
    val text: Seq[ModelInfo] = Seq[(Int, Int, Pooling, Quantization, Option[String], Seq[String])](
      (1, 384, Mean, none, None, Nil), (2, 384, Mean, Dynamic, None, Nil),
      (3, 384, Mean, none, None, Nil), (4, 384, Mean, Dynamic, None, Nil),
      (5, 768, Mean, none, None, Nil),
      (6, 768, Cls, none, None, Nil), (7, 768, Cls, Static, None, Nil),
      (8, 1024, Cls, none, None, Nil), (9, 1024, Cls, Static, None, Nil),
      (10, 384, Cls, none, None, Nil), (11, 384, Cls, Static, None, Nil),
      (12, 768, Mean, none, None, Nil), (13, 768, Mean, none, None, Nil),
      (14, 768, Mean, Dynamic, None, Nil),
      (15, 384, Mean, none, None, Nil), (16, 384, Mean, Static, None, Nil),
      (17, 768, Mean, none, None, Nil),
      (18, 512, Cls, none, None, Nil), (19, 1024, Cls, none, None, Nil),
      (20, 1024, Cls, none, None,
        Seq("onnx/model.onnx_data", "onnx/Constant_7_attr__value")),
      (21, 1024, Mean, none, None, Nil),
      (22, 384, Mean, none, None, Nil), (23, 768, Mean, none, None, Nil),
      (24, 1024, Mean, none, None, Seq("model.onnx_data")),
      (25, 1024, Cls, none, None, Nil), (26, 1024, Cls, Dynamic, None, Nil),
      (27, 768, Cls, none, None, Nil), (28, 768, Cls, Dynamic, None, Nil),
      (29, 1024, Cls, none, None, Nil), (30, 1024, Cls, Dynamic, None, Nil),
      (31, 512, Mean, none, None, Nil),
      (32, 768, Mean, none, None, Nil), (33, 768, Mean, none, None, Nil),
      (34, 768, Mean, none, Some("sentence_embedding"), Seq("onnx/model.onnx_data")),
      (35, 768, Mean, none, Some("sentence_embedding"), Seq("onnx/model_q4.onnx_data")),
      (36, 768, Mean, Dynamic, Some("sentence_embedding"), Seq("onnx/model_quantized.onnx_data")),
      (37, 384, Cls, none, None, Nil), (38, 384, Cls, Dynamic, None, Nil),
      (39, 384, Cls, none, None, Nil), (40, 384, Cls, Dynamic, None, Nil),
      (41, 768, Cls, none, None, Nil), (42, 768, Cls, Dynamic, None, Nil),
      (43, 768, Cls, none, None, Nil), (44, 768, Cls, Dynamic, None, Nil),
      (45, 1024, Cls, none, None, Nil), (46, 1024, Cls, Dynamic, None, Nil)
    ).map { case (i, dim, pool, quant, ok, af) =>
      ModelInfo(f"graft-text-$i%02d-$dim", dim,
        s"catalog text model $i: $dim-d, ${pool.toString.toLowerCase} pooling" +
          (if (quant != none) s", ${quant.toString.toLowerCase} quantization" else ""),
        pool, quant, kind = ModelKind.Dense, outputKey = ok, additionalFiles = af)
    }
    // sparse.rs: SPLADE++ and the BGE-M3 sparse head (dim 0 = vocab-sized)
    val sparse = Seq(
      ModelInfo("graft-catalog-sparse-01", 0, "catalog sparse model 1 (SPLADE role)",
        Mean, kind = ModelKind.Sparse),
      ModelInfo("graft-catalog-sparse-02", 0, "catalog sparse model 2 (M3 sparse head role)",
        Mean, kind = ModelKind.Sparse,
        additionalFiles = Seq("onnx/model.onnx_data", "onnx/Constant_7_attr__value")))
    // bgem3.rs: the quantized joint dense+sparse+colbert checkpoint
    val joint = Seq(
      ModelInfo("graft-catalog-joint-01-q", 1024, "catalog quantized joint model (M3 role)",
        Cls, Static, kind = ModelKind.Bgem3))
    // reranking.rs: four cross-encoders; dim 1 = one score per pair
    val rerank = Seq(
      ModelInfo("graft-catalog-rerank-01", 1, "catalog reranker 1", Cls, kind = ModelKind.Rerank),
      ModelInfo("graft-catalog-rerank-02", 1, "catalog reranker 2", Cls, kind = ModelKind.Rerank,
        additionalFiles = Seq("model.onnx.data")),
      ModelInfo("graft-catalog-rerank-03", 1, "catalog reranker 3", Cls, kind = ModelKind.Rerank),
      ModelInfo("graft-catalog-rerank-04", 1, "catalog reranker 4", Cls, kind = ModelKind.Rerank))
    // image_embedding.rs: five vision towers
    val image = Seq((1, 512), (2, 2048), (3, 768), (4, 512), (5, 768)).map {
      case (i, dim) =>
        ModelInfo(f"graft-catalog-image-$i%02d-$dim", dim,
          s"catalog image model $i: $dim-d", Mean, kind = ModelKind.Image)
    }
    (text ++ sparse ++ joint ++ rerank ++ image).map(m => m.name -> m).toMap
  }

  @volatile private var userModels: Map[String, ModelInfo] = Map.empty

  /** "Bring your own model" (src/text_embedding/init.rs:88-138 analogue). */
  def register(info: ModelInfo): Unit = synchronized { userModels += (info.name -> info) }

  def get(name: String): Option[ModelInfo] =
    userModels.get(name).orElse(builtin.get(name)).orElse(catalog.get(name))
  def apply(name: String): ModelInfo =
    get(name).getOrElse(throw new NoSuchElementException(s"unknown model: $name"))
  def listSupportedModels(): Seq[ModelInfo] =
    (catalog ++ builtin ++ userModels).values.toSeq.sortBy(_.name)

  /** Per-modality listing — the analogue of each reference registry's
    * own `list_supported_models`. */
  def listSupportedModels(kind: ModelKind): Seq[ModelInfo] =
    listSupportedModels().filter(_.kind == kind)

  /** S6 staging probe: every `additional_files` entry must stage next
    * to the model file before a session opens — the reference fetches
    * each at init and errors on a miss
    * (text_embedding/impl.rs:58-64, reranking/impl.rs:68-73,
    * sparse_text_embedding/impl.rs:56-61). Zero-egress: presence is
    * validated against a caller-supplied listing (the S4/S10
    * treatment); the return value is the cache path each file stages
    * at, in declaration order. A miss errors with the reference's
    * "Failed to retrieve {file}" message. */
  def stageAdditionalFiles(model: String, available: Set[String],
                           env: String => Option[String] = sys.env.get): Seq[String] = {
    val info = apply(model)
    info.additionalFiles.map { f =>
      require(available.contains(f), s"Failed to retrieve $f")
      CacheDir.modelDir(model, env) + "/" + f
    }
  }

  /** S4 cache-dir surface: where a hub fetch would land model files.
    * Pure no-network resolution — the zero-egress stand-in for the
    * reference's hub pull; nothing here touches the filesystem or the
    * network, it only answers "which directory".
    *
    * Precedence mirrors the reference exactly:
    *  - `get_cache_dir()` (/root/reference/src/common.rs:12-16):
    *    `FASTEMBED_CACHE_DIR` env, else the literal `.fastembed_cache`.
    *  - `pull_from_hf` (/root/reference/src/common.rs:167-192): `HF_HOME`
    *    env OVERRIDES the caller-supplied default (which callers pass as
    *    `get_cache_dir()`'s result) — so effectively
    *    HF_HOME → FASTEMBED_CACHE_DIR → default.
    *
    * `env` is injectable so specs pin the precedence without mutating
    * process state. */
  object CacheDir {
    val Default = ".fastembed_cache"

    /** common.rs:14-16 `get_cache_dir`. */
    def cacheDir(env: String => Option[String] = sys.env.get): String =
      env("FASTEMBED_CACHE_DIR").getOrElse(Default)

    /** The directory a hub pull would use (common.rs:178-180): HF_HOME
      * wins over the resolved default. */
    def hubCacheDir(env: String => Option[String] = sys.env.get): String =
      env("HF_HOME").getOrElse(cacheDir(env))

    /** Endpoint override surface (common.rs:183 `HF_ENDPOINT`): None
      * means "the default public hub endpoint" — deliberately not
      * materialized as a URL here, and never dereferenced in this
      * zero-egress build. */
    def endpointOverride(env: String => Option[String] = sys.env.get): Option[String] =
      env("HF_ENDPOINT")

    /** Directory a given model's files would land in, hf-hub snapshot
      * layout (`models--{org}--{name}` path component). */
    def modelDir(model: String, env: String => Option[String] = sys.env.get): String =
      hubCacheDir(env) + "/models--" + model.replace("/", "--")
  }
}
