package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.DedupIndex

/** Persisted MinHash dedup index: incremental ingest must equal a full
  * rebuild, and the corpus side of the candidate join must read
  * pre-bucketed keys. Absolute correctness of the estimator path is the
  * q124 DuckDB gate; these pin the index lifecycle. */
class DedupIndexSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private lazy val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private def corpus = d.filter(col("doc_id") % 2 === 0)
  private def batch = d.filter(col("doc_id") % 2 === 1)

  private def asSet(df: org.apache.spark.sql.DataFrame) = df
    .select(col("doc_id"), col("corpus_id"), col("est_jaccard"))
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("appendBatch == rebuilding the index over the grown corpus") {
    DedupIndex.writeMinhash(corpus.filter(col("doc_id") < 250),
      "doc_id", "text", table = "graft_didx_a")
    DedupIndex.appendBatch(spark, corpus.filter(col("doc_id") >= 250),
      "doc_id", "text", table = "graft_didx_a")
    DedupIndex.writeMinhash(corpus, "doc_id", "text", table = "graft_didx_b")
    val incr = asSet(DedupIndex.nearDupsAgainst(spark, batch,
      "doc_id", "text", "graft_didx_a", threshold = 0.3))
    val full = asSet(DedupIndex.nearDupsAgainst(spark, batch,
      "doc_id", "text", "graft_didx_b", threshold = 0.3))
    assert(incr == full)
    assert(incr.nonEmpty)
  }

  test("corpus bands table joins bucketed: merge self-join has no exchange") {
    DedupIndex.writeMinhash(corpus, "doc_id", "text", table = "graft_didx_c")
    val t = spark.table("graft_didx_c_bands")
    val l = t.select(col("doc_id").as("id_a"), col("band"), col("key"))
    val r = t.select(col("doc_id").as("id_b"), col("band"), col("key"))
    val joined = l.hint("merge").join(r.hint("merge"), Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
  }

  test("recap: sign-free bands rebuild == fresh writeMinhash of the grown corpus") {
    // grow by append (which skips the hub cap), then recap from sigs
    DedupIndex.writeMinhash(corpus.filter(col("doc_id") < 250),
      "doc_id", "text", table = "graft_didx_r", maxBucketSize = 3)
    DedupIndex.appendBatch(spark, corpus.filter(col("doc_id") >= 250),
      "doc_id", "text", table = "graft_didx_r")
    DedupIndex.recap(spark, "graft_didx_r", "doc_id", maxBucketSize = 3)
    // reference: a fresh build (text re-signed) with the same cap
    DedupIndex.writeMinhash(corpus, "doc_id", "text",
      table = "graft_didx_rf", maxBucketSize = 3)
    def bands(t: String) = spark.table(s"${t}_bands")
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Int]("band"), r.getAs[Long]("key"))).toSet
    assert(bands("graft_didx_r") == bands("graft_didx_rf"))
    assert(bands("graft_didx_r").nonEmpty)
    // the cap actually binds: at maxBucketSize=3 some keys must be gone
    // vs an uncapped rebuild
    DedupIndex.recap(spark, "graft_didx_r", "doc_id", maxBucketSize = Int.MaxValue)
    assert(bands("graft_didx_r").size > bands("graft_didx_rf").size,
      "cap=3 must have dropped hub-bucket keys")
    // the rebuilt table keeps its bucketed layout (no exchange on self-join)
    val t = spark.table("graft_didx_r_bands")
    val l = t.select(col("doc_id").as("id_a"), col("band"), col("key"))
    val r2 = t.select(col("doc_id").as("id_b"), col("band"), col("key"))
    val plan = l.hint("merge").join(r2.hint("merge"), Seq("band", "key"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"recapped table must stay bucketed:\n$plan")
  }

  test("parameter mismatch against the persisted meta refuses loudly") {
    DedupIndex.writeMinhash(corpus, "doc_id", "text", table = "graft_didx_m")
    // different numHashes/bands hash into different band key spaces:
    // a silent empty join would read as "no near-dups found"
    intercept[IllegalArgumentException] {
      DedupIndex.nearDupsAgainst(spark, batch, "doc_id", "text", "graft_didx_m",
        threshold = 0.3, numHashes = 32, bands = 8)
    }
    intercept[IllegalArgumentException] {
      DedupIndex.appendBatch(spark, batch, "doc_id", "text", "graft_didx_m", n = 5)
    }
    // matching parameters pass
    assert(DedupIndex.nearDupsAgainst(spark, batch, "doc_id", "text",
      "graft_didx_m", threshold = 0.3).count() >= 0)
  }

  test("removeIds scrubs a batch from both tables; the index equals its pre-append state") {
    DedupIndex.writeMinhash(corpus, "doc_id", "text", table = "graft_didx_rm")
    val before = asSet(DedupIndex.nearDupsAgainst(spark, batch,
      "doc_id", "text", "graft_didx_rm", threshold = 0.3))
    val beforeIds = spark.table("graft_didx_rm_sigs")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    // append a (disjoint-id) batch, then scrub it back out
    val extra = batch.select((col("doc_id") + 100000L).as("doc_id"), col("text"))
    DedupIndex.appendBatch(spark, extra, "doc_id", "text", "graft_didx_rm")
    DedupIndex.removeIds(spark, "graft_didx_rm",
      extra.select(col("doc_id")), "doc_id")
    assert(spark.table("graft_didx_rm_sigs")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet == beforeIds)
    assert(spark.table("graft_didx_rm_bands")
      .filter(col("doc_id") >= 100000L).count() == 0L)
    val after = asSet(DedupIndex.nearDupsAgainst(spark, batch,
      "doc_id", "text", "graft_didx_rm", threshold = 0.3))
    assert(after == before)
    assert(after.nonEmpty)
  }

  test("removeIds crash states: READY swap rolls forward, pre-READY staging discards") {
    DedupIndex.writeMinhash(corpus, "doc_id", "text", table = "graft_didx_cr")
    val before = asSet(DedupIndex.nearDupsAgainst(spark, batch,
      "doc_id", "text", "graft_didx_cr", threshold = 0.3))
    val beforeIds = spark.table("graft_didx_cr_sigs")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val extra = batch.select((col("doc_id") + 100000L).as("doc_id"), col("text"))
    DedupIndex.appendBatch(spark, extra, "doc_id", "text", "graft_didx_cr")
    val grownIds = beforeIds ++ extra.select(col("doc_id"))
      .collect().map(_.getLong(0))
    // stage manually (the exact writes removeIds performs)
    val drop = extra.select(col("doc_id")).distinct().localCheckpoint(true)
    def stage(): Unit = {
      spark.table("graft_didx_cr_sigs").join(drop, Seq("doc_id"), "left_anti")
        .write.format("parquet").saveAsTable("graft_didx_cr_sigs_stage")
      spark.table("graft_didx_cr_bands").join(drop, Seq("doc_id"), "left_anti")
        .write.format("parquet")
        .bucketBy(32, "band", "key").sortBy("band", "key")
        .saveAsTable("graft_didx_cr_bands_stage")
    }
    // state A: crash BEFORE READY — staging discards at the next entry
    // point, the live tables serve as if the removal never started
    stage()
    DedupIndex.reconcile(spark, "graft_didx_cr")
    assert(!spark.catalog.tableExists("graft_didx_cr_sigs_stage"))
    assert(!spark.catalog.tableExists("graft_didx_cr_bands_stage"))
    assert(spark.table("graft_didx_cr_sigs")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet == grownIds,
      "pre-READY staging must leave the live tables untouched")
    // state B: crash mid-promote — READY written, sigs already swapped
    // in, bands stage still pending; a second crash here must lose
    // NOTHING (this is the exact drop-then-rewrite hazard: the kept
    // rows live on disk in the stage table, not in a checkpoint)
    stage()
    val fs = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"))
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), "graft_didx_cr__swap_ready")
    fs.create(marker, true).close()
    spark.sql("DROP TABLE `graft_didx_cr_sigs`")
    spark.sql("ALTER TABLE `graft_didx_cr_sigs_stage` RENAME TO `graft_didx_cr_sigs`")
    // any entry point reconciles: bands promote, marker drops
    val after = asSet(DedupIndex.nearDupsAgainst(spark, batch,
      "doc_id", "text", "graft_didx_cr", threshold = 0.3))
    assert(!fs.exists(marker))
    assert(!spark.catalog.tableExists("graft_didx_cr_bands_stage"))
    assert(spark.table("graft_didx_cr_sigs")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet == beforeIds)
    assert(spark.table("graft_didx_cr_bands")
      .filter(col("doc_id") >= 100000L).count() == 0L)
    assert(after == before)
    assert(after.nonEmpty)
    // the promoted bands table keeps its bucketed layout through the
    // catalog rename (no exchange on a merge self-join)
    val t = spark.table("graft_didx_cr_bands")
    val l = t.select(col("doc_id").as("id_a"), col("band"), col("key"))
    val r = t.select(col("doc_id").as("id_b"), col("band"), col("key"))
    val plan = l.hint("merge").join(r.hint("merge"), Seq("band", "key"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"promoted table must stay bucketed:\n$plan")
  }

  test("estimator column: overlap fraction of positionally-matched components") {
    import spark.implicits._
    val df = Seq(
      (Seq(1L, 2L, 3L, 4L), Seq(1L, 2L, 9L, 4L)),
      (Seq(1L, 2L, 3L, 4L), Seq(5L, 6L, 7L, 8L))
    ).toDF("a", "b")
    val got = df.select(DedupIndex.estJaccard(col("a"), col("b"), 4).as("e"))
      .collect().map(_.getDouble(0)).toSeq
    assert(got == Seq(0.75, 0.0))
  }
}
