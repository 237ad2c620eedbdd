package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{FullText, FullTextIndex}

/** Persisted incremental BM25 index: append/remove must equal a fresh
  * whole-corpus (resp. survivors-only) search with CURRENT statistics,
  * the query-term predicate must reach the postings scan, and stats
  * compaction must be invisible. Absolute correctness is the q141/q141b
  * DuckDB gates; these pin the lifecycle and the plan shape. */
class FullTextIndexSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private lazy val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    .select(col("doc_id"), col("text"))
  private def queries = d.filter(col("doc_id") < 4)
    .select(col("doc_id").as("qid"), col("text").as("qtext"))

  private def asSet(df: org.apache.spark.sql.DataFrame) = df
    .select(col("qid"), col("doc_id"), col("rank"), col("score"))
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet

  test("build + append == batch bm25Search over the grown corpus, bit-for-bit") {
    FullTextIndex.write(d.filter(col("doc_id") % 2 === 0), "doc_id", "text",
      table = "graft_ftidx_a")
    FullTextIndex.appendBatch(spark, d.filter(col("doc_id") % 2 === 1),
      "doc_id", "text", table = "graft_ftidx_a")
    val indexed = asSet(FullTextIndex.searchTopK(spark, queries, "qid", "qtext",
      "graft_ftidx_a", k = 5))
    val batch = asSet(FullText.bm25Search(queries, "qid", "qtext",
      d, "doc_id", "text", 5))
    assert(indexed == batch)
    assert(indexed.nonEmpty)
  }

  test("recapStats folds df/meta partials without changing any result") {
    FullTextIndex.write(d.filter(col("doc_id") % 2 === 0), "doc_id", "text",
      table = "graft_ftidx_r")
    FullTextIndex.appendBatch(spark, d.filter(col("doc_id") % 2 === 1),
      "doc_id", "text", table = "graft_ftidx_r")
    val before = asSet(FullTextIndex.searchTopK(spark, queries, "qid", "qtext",
      "graft_ftidx_r", k = 5))
    val partialRows = spark.table("graft_ftidx_r_df").count()
    FullTextIndex.recapStats(spark, "graft_ftidx_r")
    assert(spark.table("graft_ftidx_r_df").count() < partialRows,
      "two appends must have stacked duplicate per-token partials")
    assert(spark.table("graft_ftidx_r_meta").count() == 1L)
    assert(asSet(FullTextIndex.searchTopK(spark, queries, "qid", "qtext",
      "graft_ftidx_r", k = 5)) == before)
  }

  test("removeDocs: statistics re-derive over survivors == fresh build on them") {
    FullTextIndex.write(d, "doc_id", "text", table = "graft_ftidx_d")
    FullTextIndex.removeDocs(spark,
      d.filter(col("doc_id") % 7 === 0).select(col("doc_id")),
      "doc_id", table = "graft_ftidx_d")
    FullTextIndex.write(d.filter(col("doc_id") % 7 =!= 0), "doc_id", "text",
      table = "graft_ftidx_d2")
    val removed = asSet(FullTextIndex.searchTopK(spark, queries, "qid", "qtext",
      "graft_ftidx_d", k = 5))
    val fresh = asSet(FullTextIndex.searchTopK(spark, queries, "qid", "qtext",
      "graft_ftidx_d2", k = 5))
    assert(removed == fresh)
    assert(removed.nonEmpty)
    assert(removed.forall(_._2 % 7 != 0), "removed docs must never rank")
  }

  test("query-term IN predicate reaches the postings parquet scan") {
    FullTextIndex.write(d, "doc_id", "text", table = "graft_ftidx_p")
    val res = FullTextIndex.searchTopK(spark, queries, "qid", "qtext",
      "graft_ftidx_p", k = 5)
    val plan = res.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator
      .find(l => l.contains("graft_ftidx_p_postings") && l.contains("PushedFilters"))
    assert(scanLine.isDefined, s"expected a postings scan with PushedFilters:\n$plan")
    assert(scanLine.get.contains("In(token_id"),
      s"the term set must push down as In(token_id, ...): ${scanLine.get}")
  }

  test("searching a never-written table refuses loudly") {
    intercept[IllegalArgumentException] {
      FullTextIndex.searchTopK(spark, queries, "qid", "qtext",
        "graft_ftidx_missing", k = 5)
    }
  }
}
