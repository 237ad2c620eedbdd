package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Sketch, SketchStore}

/** Persisted incremental sketches: build+append must equal the in-plan
  * whole-corpus sketch, replays must not double-count (CMS) or change
  * anything (HLL), and a half-built store must refuse. Absolute
  * correctness is the q153/q154/q155 DuckDB gates; these pin the
  * lifecycle. */
class SketchStoreSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private lazy val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    .select(col("doc_id"), col("source"), col("text"))

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def cmsMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("CMS store: build + two appends == whole-corpus in-plan estimates") {
    val path = tmp("graft_cms_store")
    SketchStore.writeCms(d.filter(col("doc_id") % 3 === 0), "text", 3, 16, path)
    SketchStore.appendCms(d.filter(col("doc_id") % 3 === 1), "text", path)
    SketchStore.appendCms(d.filter(col("doc_id") % 3 === 2), "text", path)
    val cand = d.select(explode(graft.functions.Kernel.tokenIds(col("text")))
      .as("token_id")).distinct()
    val stored = cmsMap(SketchStore.cmsEstimates(spark, cand, path))
    val whole = cmsMap(Sketch.cmsEstimates(d, "text", 3, 16))
    assert(stored == whole)
    assert(stored.nonEmpty)
  }

  test("CMS store: a replayed batch overwrites, never double-counts") {
    val path = tmp("graft_cms_replay")
    SketchStore.writeCms(d.filter(col("doc_id") % 2 === 0), "text", 3, 16, path)
    val batch = d.filter(col("doc_id") % 2 === 1)
    val lbl = SketchStore.streamLabel("specstream", 7L)
    SketchStore.appendCmsBatch(batch, "text", path, lbl)
    SketchStore.appendCmsBatch(batch, "text", path, lbl) // at-least-once redelivery
    val cand = d.select(explode(graft.functions.Kernel.tokenIds(col("text")))
      .as("token_id")).distinct()
    assert(cmsMap(SketchStore.cmsEstimates(spark, cand, path)) ==
      cmsMap(Sketch.cmsEstimates(d, "text", 3, 16)))
  }

  test("CMS store: rebuild clears prior partials; missing conf refuses") {
    val path = tmp("graft_cms_rebuild")
    SketchStore.writeCms(d, "text", 3, 16, path)
    SketchStore.appendCms(d, "text", path) // store now counts the corpus twice
    SketchStore.writeCms(d, "text", 3, 16, path) // rebuild supersedes everything
    val cand = d.select(explode(graft.functions.Kernel.tokenIds(col("text")))
      .as("token_id")).distinct()
    assert(cmsMap(SketchStore.cmsEstimates(spark, cand, path)) ==
      cmsMap(Sketch.cmsEstimates(d, "text", 3, 16)))
    val empty = tmp("graft_cms_none")
    intercept[IllegalArgumentException] {
      SketchStore.appendCms(d, "text", empty)
    }
  }

  test("HLL store: build + append == whole in-plan estimate; duplicate ingest changes nothing") {
    val path = tmp("graft_hll_store")
    val sh = SketchStore.shingleRows(d, "source", "text", n = 3)
    val h1 = sh.filter(crc32(col("shingle").cast("string")) % 2 === 0)
    val h2 = sh.filter(crc32(col("shingle").cast("string")) % 2 === 1)
    SketchStore.writeHll(h1, "source", "shingle", p = 6, path = path)
    SketchStore.appendHll(h2, "source", "shingle", path)
    def ests = SketchStore.hllEstimates(spark, path)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val whole = Sketch.hllDistinct(sh, "source", "shingle", 6)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val once = ests
    assert(once == whole)
    assert(once.nonEmpty)
    // a whole OVERLAPPING re-ingest (new batch id, same rows): per-bucket
    // max is idempotent, the estimates cannot move
    SketchStore.appendHll(h2, "source", "shingle", path)
    assert(ests == once)
  }

  test("CMS store: stream namespace never collides with driver counter or another stream") {
    val path = tmp("graft_cms_ns")
    val thirds = (0 to 2).map(i => d.filter(col("doc_id") % 3 === i))
    SketchStore.writeCms(thirds(0), "text", 3, 16, path)       // batch=0
    // a streaming sink's FIRST micro-batch (foreachBatch id 0) and a
    // second stream's — neither may touch batch=0 or each other
    SketchStore.appendCmsBatch(thirds(1), "text", path, SketchStore.streamLabel("a", 0L))
    SketchStore.appendCmsBatch(thirds(2), "text", path, SketchStore.streamLabel("b", 0L))
    // driver-side counter skips the stream namespace: lands at batch=1
    // (if it parsed stream labels or reused 0, a partial would vanish)
    val cand = d.select(explode(graft.functions.Kernel.tokenIds(col("text")))
      .as("token_id")).distinct()
    assert(cmsMap(SketchStore.cmsEstimates(spark, cand, path)) ==
      cmsMap(Sketch.cmsEstimates(d, "text", 3, 16)))
    intercept[IllegalArgumentException] {
      SketchStore.streamLabel("bad/stream", 0L)
    }
  }
}
