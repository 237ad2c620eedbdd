package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{FullText, FullTextIndex}

/** Scale harness for the persisted BM25 index (SCALING.md): what
  * [[graft.operators.FullTextIndex]] exists to buy at 100 TB is
  * per-query-batch cost decoupled from corpus size —
  *
  *   - `oneshot`  — [[FullText.bm25Search]]: re-tokenizes and
  *     re-weights EVERY corpus row per query batch; O(N) by
  *     construction.
  *   - `indexed`  — [[FullTextIndex.searchTopK]]: reads only the query
  *     terms' postings (pushed-down IN over the sorted token column) +
  *     a vocab-sized df sum; cost tracks matched postings, not N.
  *   - `append_1pct` — the daily-ingest leg: tokenize just the batch,
  *     stack partial stats.
  *
  * Usage: runMain graft.FtIndexProbe <sfDir> [reps=2]
  *        runMain graft.FtIndexProbe <sfDir> sustained [nBatches=50]
  *
  * The `sustained` mode measures what the single-shot probes skip
  * (r17 verdict #4): 50 consecutive 1% removal batches with NO manual
  * compaction call, once under the auto-compaction policy
  * ([[FullTextIndex.maybeCompact]], fired by every removeDocs) and once
  * with the policy disabled — the per-batch query-cost curve is the
  * evidence that the tombstone mask is bounded BY POLICY, not by an
  * operator remembering the maintenance window.
  */
object FtIndexProbe {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) { System.err.println("usage: FtIndexProbe <sfDir> [reps=2|sustained [nBatches]]"); sys.exit(1) }
    val sfDir = args(0)
    if (args.contains("sustained")) { sustained(sfDir, args); return }
    val reps = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Graft.tunedBuilder(sfDir, cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val n = d.count()
    // search-shaped queries: a handful of terms each (a 60-char prefix),
    // NOT whole documents — the cost law under measure is "matched
    // postings, not corpus", and a full-document query matches nearly
    // every row group by construction
    val queries = d.filter(col("doc_id") < 4)
      .select(col("doc_id").as("qid"), substring(col("text"), 1, 60).as("qtext"))

    def timed(label: String)(body: => Unit): Unit = {
      val secs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        body
        val sec = (System.nanoTime() - t0) / 1e9
        System.gc(); Thread.sleep(1000)
        sec
      }
      println(f"""{"probe":"ftindex_$label","sf":"$sfDir","n":$n,"sec":${secs.min}%.3f,"passes":[${secs.map(s => f"$s%.3f").mkString(",")}]}""")
    }
    def drain(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val path = java.nio.file.Files.createTempDirectory("graft_ftprobe").toString
    timed("build") {
      FullTextIndex.write(d, "doc_id", "text", path)
    }
    timed("oneshot_per_batch") {
      drain(FullText.bm25Search(queries, "qid", "qtext", d, "doc_id", "text", 5))
    }
    timed("indexed_per_batch") {
      drain(FullTextIndex.searchTopK(spark, queries, "qid", "qtext", path, 5))
    }
    var rep = 0
    timed("append_1pct") {
      val r = rep; rep += 1
      FullTextIndex.appendBatch(spark,
        d.filter(col("doc_id") % 100 === 0)
          .select((col("doc_id") + lit((10L + r) * n)).as("doc_id"), col("text")),
        "doc_id", "text", path)
    }
    // post-append queries still pay only the term-pruned scan
    timed("indexed_after_appends_per_batch") {
      drain(FullTextIndex.searchTopK(spark, queries, "qid", "qtext", path, 5))
    }
    // the update legs the tombstone design exists for: removal stages
    // O(batch) deltas + tombstones (doc-pruned forward scan, NO
    // inverted-file pass), upsert = removal + batch append — both must
    // stay flat as the corpus grows
    var rrep = 0
    timed("remove_1pct") {
      val r = rrep; rrep += 1
      FullTextIndex.removeDocs(spark,
        d.filter(col("doc_id") % 100 === 0)
          .select((col("doc_id") + lit((10L + r) * n)).as("doc_id")),
        "doc_id", path)
    }
    var urep = 0
    timed("upsert_1pct") {
      val r = urep; urep += 1
      FullTextIndex.upsertBatch(spark,
        d.filter(col("doc_id") % 100 === 1).select(col("doc_id"), col("text")),
        "doc_id", "text", path)
    }
    // queries after removals pay the same pruned scan + one broadcast
    // tombstone anti-join
    timed("indexed_after_updates_per_batch") {
      drain(FullTextIndex.searchTopK(spark, queries, "qid", "qtext", path, 5))
    }
    // the deferred physical leg: ONE inverted-file rewrite amortizing
    // every removal above (the cost removal no longer pays per batch).
    // Single-pass — a second pass would measure the idle early-return
    // (tombstones already cleared), not compaction
    locally {
      val t0 = System.nanoTime()
      FullTextIndex.compactPostings(spark, path)
      val sec = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      FullTextIndex.compactPostings(spark, path) // idle re-entry: O(1)
      val idle = (System.nanoTime() - t1) / 1e9
      println(f"""{"probe":"ftindex_compact","sf":"$sfDir","n":$n,"sec":$sec%.3f,"idle_reentry_sec":$idle%.3f}""")
    }
    spark.stop()
  }

  /** Sustained removals, no manual compaction: one leg with the
    * built-in trigger (production default), one with it disabled (the
    * unbounded-mask contrast). Per batch: removal wall time; every 5th
    * batch also times a query and reads the pending-tombstone count. */
  private def sustained(sfDir: String, args: Array[String]): Unit = {
    val nBatches = args.drop(1).flatMap(a => scala.util.Try(a.toInt).toOption)
      .headOption.getOrElse(50)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Graft.tunedBuilder(sfDir, cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val n = d.count()
    val queries = d.filter(col("doc_id") < 4)
      .select(col("doc_id").as("qid"), substring(col("text"), 1, 60).as("qtext"))
    for (policy <- Seq("auto", "none")) {
      val path = java.nio.file.Files
        .createTempDirectory(s"graft_ftsust_$policy").toString
      FullTextIndex.write(d, "doc_id", "text", path)
      for (b <- 0 until nBatches) {
        val t0 = System.nanoTime()
        FullTextIndex.removeDocs(spark,
          d.filter(col("doc_id") % 100 === b).select(col("doc_id")),
          "doc_id", path, autoCompact = policy == "auto")
        val rSec = (System.nanoTime() - t0) / 1e9
        if (b % 5 == 4 || b == nBatches - 1) {
          val pend = spark.read.parquet(s"$path/tombstones")
            .select(col("doc_id")).distinct().count()
          val t1 = System.nanoTime()
          FullTextIndex.searchTopK(spark, queries, "qid", "qtext", path, 5)
            .write.format("noop").mode("overwrite").save()
          val qSec = (System.nanoTime() - t1) / 1e9
          println(f"""{"probe":"ftindex_sustained","policy":"$policy","sf":"$sfDir","n":$n,"batch":${b + 1},"remove_sec":$rSec%.3f,"query_sec":$qSec%.3f,"pending_tombstones":$pend}""")
        }
      }
    }
    spark.stop()
  }
}
