package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Kernel
import graft.operators.TextEmbedder

/** Structured Streaming surface — beyond parity (the reference is
  * strictly batch, SURVEY.md §2.7), but a training-data pipeline ingests
  * continuously. Every narrow operator in this engine (dense/sparse/
  * BGE-M3 embed, simhash, text analysis, the typed-mapPartitions
  * backend) is a per-row column expression and therefore applies to a
  * `readStream` DataFrame unchanged; these helpers name the two
  * streaming-specific shapes that need more than that. */
object StreamingOps {

  /** Embed a streaming corpus: identical plan to the batch path — the
    * pipeline is narrow, so each micro-batch embeds partition-local with
    * no state and no shuffle. */
  def embedStream(stream: DataFrame, textCol: String, outCol: String,
                  embedder: TextEmbedder = TextEmbedder()): DataFrame =
    embedder.embed(stream, textCol, outCol)

  /** Streaming exact dedup: keep the first occurrence per
    * normalized-text hash. State is BOUNDED by the watermark
    * (`dropDuplicatesWithinWatermark`), so at 100 TB/day the state store
    * holds only the horizon's hashes — 16 bytes per distinct doc —
    * instead of growing forever. */
  def dedupExactStream(stream: DataFrame, textCol: String,
                       eventTimeCol: String, watermark: String): DataFrame =
    stream
      .withColumn("text_hash", md5(concat_ws(" ", Kernel.tokens(col(textCol)))))
      .withWatermark(eventTimeCol, watermark)
      .dropDuplicatesWithinWatermark("text_hash")

  /** Windowed quality/volume stats over a document stream — watermarked
    * tumbling-window aggregation (late data beyond the watermark is
    * dropped, windows finalize incrementally). */
  def qualityStatsStream(stream: DataFrame, textCol: String,
                         eventTimeCol: String, watermark: String,
                         windowLen: String): DataFrame = {
    val toks = Kernel.tokens(col(textCol))
    stream
      .withColumn("__nw", size(toks).cast("long"))
      .withWatermark(eventTimeCol, watermark)
      .groupBy(window(col(eventTimeCol), windowLen))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__nw")).as("total_words"),
        min(col("__nw")).as("min_words"),
        max(col("__nw")).as("max_words"))
  }
}
