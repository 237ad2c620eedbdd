package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{K, Kernel}

/** Pooling strategies of the reference (/root/reference/src/pooling.rs:9-16):
  * Cls = token 0, Mean = masked mean over sequence, Last = last token
  * (/root/reference/src/models/qwen3.rs:158-174). On the hashing projector
  * all three reduce to "integer-mean over a token subset", which keeps the
  * math exact and order-independent. */
sealed trait Pooling
object Pooling {
  case object Cls extends Pooling
  case object Mean extends Pooling
  case object Last extends Pooling
}

/** Dense text embedding pipeline (the flagship path of the reference,
  * /root/reference/src/text_embedding/impl.rs:322-449):
  * tokenize → truncate → project → pool → L2-normalize.
  *
  * Expressed entirely as Catalyst column expressions (no UDF): narrow,
  * shuffle-free, whole-stage-codegen'd, and therefore embarrassingly
  * parallel at any scale — each row embeds independently, so on a 1000-
  * executor cluster the operator scales linearly with input splits and
  * the parquet scan prunes to just (id, text) columns.
  */
case class TextEmbedder(
    dim: Int = K.Dim,
    maxLength: Int = K.MaxLength,
    pooling: Pooling = Pooling.Mean,
    quantization: graft.model.Quantization = graft.model.Quantization.None) {

  /** Token subset the pooling sees (Cls = first token, Last = last). */
  private def pooledTokens(tids: Column): Column = pooling match {
    case Pooling.Mean => tids
    case Pooling.Cls  => slice(tids, 1, 1)
    case Pooling.Last => slice(tids, -1, 1)
  }

  /** Adds `outCol: array<double>` (unit-norm, length `dim`) computed from
    * `textCol`. Rows whose text has no tokens are dropped (the reference
    * cannot embed an empty encoding either).
    *
    * Dynamic quantization fits activation ranges over the WHOLE input
    * batch (/root/reference/src/text_embedding/impl.rs:330-347 errors if
    * the user batch splits the input) — the Spark analogue of that
    * semantic constraint is single-partition execution, so the operator
    * coalesces to 1 partition first. Anti-parallel by nature; surfaced
    * here rather than silently violated. */
  def embed(df: DataFrame, textCol: String, outCol: String): DataFrame = {
    val tids = "__graft_tids"
    val in = quantization match {
      case graft.model.Quantization.Dynamic => df.coalesce(1)
      case _ => df
    }
    val withTids = in
      .withColumn(tids, pooledTokens(Kernel.tokenIds(col(textCol), maxLength)))
      .filter(size(col(tids)) > 0)
    TextEmbedder.denseTail(withTids, tids, outCol, dim).drop(tids)
  }
}

object TextEmbedder {
  /** The shared dense tail: token ids → integer-pooled projection →
    * mean scale → L2 normalize. The ONE definition both the doc-level
    * [[TextEmbedder.embed]] and [[chunkEmbed]] run, so the two paths
    * stay bit-identical by construction. */
  private[operators] def denseTail(df: DataFrame, tidsCol: String,
                                   outCol: String, dim: Int): DataFrame = {
    val sums = "__graft_sums"
    val mean = "__graft_mean"
    val nrm = "__graft_norm"
    df.withColumn(sums, Kernel.pooledSums(col(tidsCol), dim))
      .withColumn(mean, Kernel.meanScaled(col(sums), size(col(tidsCol))))
      .withColumn(nrm, Kernel.l2norm(col(mean)))
      // zip_with + array_repeat: the norm evaluates once per row; a
      // transform lambda referencing it would re-fold it per element
      .withColumn(outCol,
        zip_with(col(mean), array_repeat(col(nrm) + lit(K.Eps), lit(dim)), (x, n) => x / n))
      .drop(sums, mean, nrm)
  }

  /** Dense-embed a PRE-TOKENIZED id column through the same tail — the
    * tokenizer-swap surface: any id stream (hashing, WordPiece vocab,
    * a future BPE) feeds the identical project→mean→normalize chain,
    * exactly like the reference swaps tokenizer.json files under one
    * forward (/root/reference/src/common.rs:57-157). Rows with empty
    * id arrays are dropped (nothing to pool). */
  def embedTokens(df: DataFrame, tidsCol: String, outCol: String,
                  dim: Int = K.Dim): DataFrame =
    denseTail(df.filter(size(col(tidsCol)) > 0), tidsCol, outCol, dim)

  /** Dense embedding through a LEARNED projection head: the pooled
    * integer sums are projected by a real [dimOut × dimIn] weight
    * matrix (row-major `wqFlat`, on its integer grid — see
    * [[graft.backend.ProjectionBank]]) and the projected vector is l2
    * normalized directly. y = W·sums stays in exact int64 — both the
    * matrix entries' 1/Scale and the mean's 1/n are COMMON scalar
    * factors the normalization divides out, so no intermediate float
    * scaling exists at all. Narrow, zero shuffle; the bank rides as a
    * dimOut·dimIn literal array. */
  def embedProjectedTokens(df: DataFrame, tidsCol: String, outCol: String,
                           wqFlat: Array[Long], dimIn: Int,
                           dimOut: Int): DataFrame = {
    require(wqFlat.length == dimIn * dimOut,
      s"bank of ${wqFlat.length} != $dimOut x $dimIn")
    val bridge = org.apache.spark.sql.graftbridge.Bridge
    val sums = "__graft_sums"
    val proj = "__graft_proj"
    val nrm = "__graft_norm"
    df.filter(size(col(tidsCol)) > 0)
      .withColumn(sums, Kernel.pooledSums(col(tidsCol), dimIn))
      // ONE native mat-vec per row: the HOF formulation (aggregate over
      // dims referencing the sums column inside the lambda) gets
      // pooledSums inlined by project collapse and re-evaluated per
      // (d, e) element — measured ~30x slower on the q82 gate at sf0.1
      .withColumn(proj,
        transform(
          bridge.column(graft.functions.MatVecQ(
            bridge.expression(col(sums)), wqFlat.toIndexedSeq, dimIn, dimOut)),
          y => y.cast("double")))
      .withColumn(nrm, Kernel.l2norm(col(proj)))
      .withColumn(outCol,
        zip_with(col(proj), array_repeat(col(nrm) + lit(K.Eps), lit(dimOut)),
          (x, n) => x / n))
      .drop(sums, proj, nrm)
  }

  /** RAG-style chunk embedding: split each doc's token stream into
    * fixed-`budget` windows whose starts step by `budget - overlap`
    * (consecutive chunks share `overlap` tokens of context), and embed
    * each window through the same project→mean→normalize tail as the
    * doc-level pipeline. Output: (idCol, chunk_id, n_tokens, outCol).
    * Narrow — one per-row explode of window starts; no shuffle — so a
    * 100 TB corpus chunks exactly like it embeds. Deterministic chunk
    * boundaries (token positions, no RNG). Like standard chunkers, the
    * window sequence stops once a window reaches the end of the stream:
    * a start is emitted only if the PREVIOUS window did not already
    * cover the last token (otherwise the tail chunk would be a strict
    * subset of its predecessor — duplicate retrieval hits). */
  def chunkEmbed(df: DataFrame, idCol: String, textCol: String,
                 budget: Int, overlap: Int, dim: Int = K.Dim,
                 maxLength: Int = K.MaxLength,
                 outCol: String = "emb"): DataFrame = {
    require(overlap >= 0 && overlap < budget, "need 0 <= overlap < budget")
    val stride = budget - overlap
    val chunks = df
      .select(col(idCol), Kernel.tokenIds(col(textCol), maxLength).as("__tids"))
      .filter(size(col("__tids")) > 0)
      .withColumn("__start",
        explode(sequence(lit(0), size(col("__tids")) - 1, lit(stride))))
      .filter(col("__start") === 0 ||
        col("__start") - lit(stride) + lit(budget) < size(col("__tids")))
      .withColumn("__ct", slice(col("__tids"), col("__start") + 1, lit(budget)))
      .withColumn("chunk_id", expr(s"__start div $stride"))
    denseTail(chunks, "__ct", outCol, dim)
      .select(col(idCol), col("chunk_id"),
        size(col("__ct")).cast("long").as("n_tokens"), col(outCol))
  }

  /** Build the pipeline from a registry entry — the analogue of
    * `TextEmbedding::try_new(InitOptions { model_name, .. })` resolving
    * ModelInfo → dim/pooling/quantization/max_length
    * (/root/reference/src/text_embedding/impl.rs:36-80). */
  def fromModel(name: String = graft.model.ModelRegistry.DefaultModel): TextEmbedder = {
    val m = graft.model.ModelRegistry(name)
    TextEmbedder(dim = m.dim, maxLength = m.maxLength, pooling = m.pooling,
      quantization = m.quantization)
  }
}
