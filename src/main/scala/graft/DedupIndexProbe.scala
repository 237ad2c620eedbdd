package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, DedupIndex}

/** Scale harness for the persisted MinHash dedup index (SCALING.md):
  * measures the per-ingest cost the index exists to remove. The one-shot
  * form re-signs and re-self-joins the WHOLE corpus on every ingest;
  * the incremental form signs only the batch and joins the prebuilt
  * bucketed keys. Corpus = 99% of documents, batch = 1% (`doc_id % 100
  * == 1` — a daily-ingest-sized slice).
  *
  * The legs are a COST comparison of the ingest workflow, not a result
  * equivalence: the one-shot path verifies candidates with exact
  * Jaccard, the index path with the signature-overlap estimator (its
  * correctness has its own oracle gate, q124).
  *
  * Usage: runMain graft.DedupIndexProbe <sfDir> [reps=3]
  */
object DedupIndexProbe {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) { System.err.println("usage: DedupIndexProbe <sfDir> [reps=3]"); sys.exit(1) }
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Graft.tunedBuilder(sfDir, cpus.toInt)
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_didx_wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val corpus = d.filter(col("doc_id") % 100 =!= 1)
    val batch = d.filter(col("doc_id") % 100 === 1)
    val n = d.count()
    val nBatch = batch.count()

    def timed(label: String)(body: => Unit): Unit = {
      val secs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        body
        val sec = (System.nanoTime() - t0) / 1e9
        System.gc()
        Thread.sleep(1000)
        sec
      }
      println(f"""{"probe":"dedup_$label","sf":"$sfDir","n":$n,"n_batch":$nBatch,"sec":${secs.min}%.3f,"passes":[${secs.map(s => f"$s%.3f").mkString(",")}]}""")
    }

    def drain(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // the index build: one corpus pass, paid once per corpus lifetime
    timed("index_build") {
      DedupIndex.writeMinhash(corpus, "doc_id", "text", table = "graft_didx_probe")
    }

    // per-ingest, one-shot: re-sign and re-self-join corpus+batch
    timed("oneshot_per_ingest") {
      drain(Dedup.minhashNearDups(d, "doc_id", "text", threshold = 0.35))
    }

    // per-ingest, incremental: sign the batch, join prebuilt keys,
    // estimator-verify, then grow the index with the batch
    timed("incremental_per_ingest") {
      drain(DedupIndex.nearDupsAgainst(spark, batch, "doc_id", "text",
        "graft_didx_probe", threshold = 0.35))
    }

    // each rep appends a DISTINCT id range (same text, offset ids): the
    // same ids re-appended would duplicate rows and change what reps 2+
    // measure
    var appendRep = 0
    val step = d.agg(org.apache.spark.sql.functions.max(col("doc_id")))
      .head().getLong(0) + 1L
    timed("append_batch") {
      val r = appendRep; appendRep += 1
      DedupIndex.appendBatch(spark,
        batch.select((col("doc_id") + lit(r * step)).as("doc_id"), col("text")),
        "doc_id", "text", "graft_didx_probe")
    }

    spark.stop()
  }
}
