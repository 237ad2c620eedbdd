package graft

import org.apache.spark.sql.functions._
import graft.operators.{Sampling, TextAnalysis}

/** Shard-count scaling for sequence packing (SCALING.md): packing is an
  * inherently sequential recurrence, so the shard is its ONLY
  * parallelism unit — this probe measures what the `nShards` knob
  * actually buys at a given corpus size, for both forms:
  *
  *  - greedy first-fit ([[Sampling.packGreedyFirstFit]]): an ordered
  *    fold per shard via flatMapGroups — wall-clock should fall with
  *    shards until per-task overhead dominates; nShards=1 is the fully
  *    sequential worst case (one task walks the whole corpus).
  *  - offset binning ([[Sampling.packByOffset]]): a window cumsum per
  *    shard — same shape, but the sort is the cost, not the fold.
  *
  * Usage: runMain graft.PackProbe <sfDir> [reps=3]
  * One JSON line per (form, nShards).
  */
object PackProbe {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) { System.err.println("usage: PackProbe <sfDir> [reps=3]"); sys.exit(1) }
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Graft.tunedBuilder(sfDir, cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // token counts staged once OUTSIDE the timers: the probe measures
    // the packing recurrence, not the tokenizer
    // SPARK_GRAFT_PACK_FACTOR=N widens the staged (id, tokens) table N×
    // with offset ids — the row-count knob for stressing the recurrence
    // past what the parquet corpus provides (token counts, not text, so
    // the widened table stays MB-sized)
    val factor = math.max(1, sys.env.get("SPARK_GRAFT_PACK_FACTOR")
      .flatMap(v => scala.util.Try(v.toInt).toOption).getOrElse(1))
    val stage = s"/tmp/graft_packprobe/${new java.io.File(sfDir).getName}-x$factor"
    val base = TextAnalysis.tokenCounts(
        spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text")
      .select(col("doc_id"), col("ws_tokens"))
    val step = base.agg(max(col("doc_id"))).head().getLong(0) + 1L
    base.select(explode(array((0 until factor).map(lit): _*)).as("__r"),
        col("doc_id"), col("ws_tokens"))
      .select((col("doc_id") + col("__r") * lit(step)).as("doc_id"), col("ws_tokens"))
      .write.mode("overwrite").parquet(stage)
    val docs = spark.read.parquet(stage)
    val n = docs.count()
    val budget = 2048L

    def timed(form: String, shards: Int)(body: => Unit): Unit = {
      val secs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        body
        val sec = (System.nanoTime() - t0) / 1e9
        System.gc(); Thread.sleep(500)
        sec
      }
      println(f"""{"probe":"pack_$form","sf":"$sfDir","n":$n,"n_shards":$shards,"budget":$budget,"sec":${secs.min}%.3f,"passes":[${secs.map(s => f"$s%.3f").mkString(",")}]}""")
    }

    def drain(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    for (shards <- Seq(1, 8, 32, 128)) {
      timed("greedy", shards) {
        drain(Sampling.packGreedyFirstFit(docs, "doc_id", "ws_tokens", budget, shards))
      }
      timed("offset", shards) {
        drain(Sampling.packByOffset(docs, "doc_id", "ws_tokens", budget, shards))
      }
    }
    spark.stop()
  }
}
