package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model.ModelRegistry
import graft.model.ModelRegistry.CacheDir

/** S4 cache-dir resolution surface: the no-network env-precedence rules
  * of the reference (/root/reference/src/common.rs:12-16 `get_cache_dir`,
  * :167-192 `pull_from_hf`), pinned with injected env maps — no process
  * state is read or mutated, nothing touches the filesystem. */
class RegistrySpec extends AnyFunSuite {

  private def env(kv: (String, String)*): String => Option[String] =
    kv.toMap.get _

  test("default cache dir is .fastembed_cache (common.rs:12)") {
    assert(CacheDir.cacheDir(env()) == ".fastembed_cache")
  }

  test("FASTEMBED_CACHE_DIR overrides the default (common.rs:14-16)") {
    assert(CacheDir.cacheDir(env("FASTEMBED_CACHE_DIR" -> "/tmp/fe")) == "/tmp/fe")
  }

  test("HF_HOME overrides the resolved default for hub pulls (common.rs:178-180)") {
    // HF_HOME wins even when FASTEMBED_CACHE_DIR is set: pull_from_hf
    // consults HF_HOME before falling back to the caller's default
    assert(CacheDir.hubCacheDir(
      env("FASTEMBED_CACHE_DIR" -> "/tmp/fe", "HF_HOME" -> "/tmp/hf")) == "/tmp/hf")
    assert(CacheDir.hubCacheDir(env("FASTEMBED_CACHE_DIR" -> "/tmp/fe")) == "/tmp/fe")
    assert(CacheDir.hubCacheDir(env()) == ".fastembed_cache")
  }

  test("endpoint override is surfaced but never defaulted to a URL") {
    assert(CacheDir.endpointOverride(env()).isEmpty)
    assert(CacheDir.endpointOverride(
      env("HF_ENDPOINT" -> "http://localhost:9000")).contains("http://localhost:9000"))
  }

  test("model dir follows the hf-hub snapshot path component layout") {
    assert(CacheDir.modelDir("Qdrant/all-MiniLM-L6-v2-onnx", env("HF_HOME" -> "/c")) ==
      "/c/models--Qdrant--all-MiniLM-L6-v2-onnx")
  }

  test("S6: additional_files stage next to the model or the init fails") {
    // the reranker role mirrors reranking.rs:32 (model.onnx.data)
    assert(ModelRegistry("graft-rerank-jaccard").additionalFiles ==
      Seq("model.onnx.data"))
    // present: returns the cache path each side file stages at
    assert(ModelRegistry.stageAdditionalFiles("graft-rerank-jaccard",
      Set("model.onnx", "model.onnx.data"), env("HF_HOME" -> "/c")) ==
      Seq("/c/models--graft-rerank-jaccard/model.onnx.data"))
    // absent: the reference's "Failed to retrieve {file}" error class
    val e = intercept[IllegalArgumentException] {
      ModelRegistry.stageAdditionalFiles("graft-rerank-jaccard",
        Set("model.onnx"), env())
    }
    assert(e.getMessage.contains("Failed to retrieve model.onnx.data"))
    // a model with no side files stages nothing, vacuously
    assert(ModelRegistry.stageAdditionalFiles("graft-hash-64-mean",
      Set.empty, env()).isEmpty)
  }

  test("registry lookup still resolves every builtin") {
    ModelRegistry.listSupportedModels().foreach { m =>
      assert(ModelRegistry(m.name).dim == m.dim)
    }
  }

  test("breadth catalog mirrors the reference's variant counts") {
    // the reference's exhaustive guards pin its registries at 46 text
    // variants (models/text_embedding.rs:603-719), 2 sparse
    // (sparse.rs), 1 quantized joint (bgem3.rs), 4 rerankers
    // (reranking.rs), 5 image (image_embedding.rs)
    val all = ModelRegistry.listSupportedModels()
    assert(all.count(_.name.startsWith("graft-text-")) == 46)
    assert(all.count(_.name.startsWith("graft-catalog-sparse-")) == 2)
    assert(all.count(_.name.startsWith("graft-catalog-joint-")) == 1)
    assert(all.count(_.name.startsWith("graft-catalog-rerank-")) == 4)
    assert(all.count(_.name.startsWith("graft-catalog-image-")) == 5)
    // the quantization split mirrors impl.rs:220-268: 12 dynamic
    // catalog variants (six families), 4 static, and the 4-bit row
    // stays batching-safe None
    val text = all.filter(_.name.startsWith("graft-text-"))
    import graft.model.Quantization
    assert(text.count(_.quantization == Quantization.Dynamic) == 12)
    assert(text.count(_.quantization == Quantization.Static) == 4)
    // the Gemma-role rows carry the sentence_embedding output key and
    // external data beside the graph (text_embedding.rs:422-443)
    assert(text.count(_.outputKey.contains("sentence_embedding")) == 3)
    assert(text.count(_.additionalFiles.nonEmpty) == 5)
    // every catalog row resolves and lists under its kind
    import graft.model.ModelKind
    assert(ModelRegistry.listSupportedModels(ModelKind.Image)
      .count(_.name.startsWith("graft-catalog-image-")) == 5)
  }

  test("Backends.forModel constructs the registered backends (S5/A4 wiring)") {
    assert(graft.backend.Backends.forModel("graft-transformer-8") ==
      graft.backend.TransformerBackend(dim = 8))
    assert(graft.backend.Backends.forModel("graft-moe-8") ==
      graft.backend.MoEBackend(dim = 8))
    assert(graft.backend.Backends.forModel("graft-hash-64-mean") ==
      graft.backend.HashingBackend(64))
    // the learned-checkpoint backends resolve and embed (their weights
    // load from generated safetensors banks at construction)
    assert(graft.backend.Backends.forModel("graft-gqa-8") ==
      graft.backend.GqaAttentionBackend.withQkNorm())
    assert(graft.backend.Backends.forModel("graft-qwen3-8") ==
      graft.backend.DecoderLayerBackend.fromBank())
    val stacked = graft.backend.Backends.forModel("graft-qwen3-8-x2")
    assert(stacked == graft.backend.DecoderLayerBackend.stacked())
    assert(stacked.embedBatch(Seq(Array(5L, 17L))).head.length == 8)
    intercept[NoSuchElementException](graft.backend.Backends.forModel("nope"))
  }
}
