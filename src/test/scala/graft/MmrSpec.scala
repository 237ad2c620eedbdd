package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Greedy MMR diversity rerank: first-pick rule, redundancy penalty,
  * λ extremes, and the plan shape (no Window; one gather exchange). */
class MmrSpec extends AnyFunSuite with SparkSessionTestWrapper {

  // one query, four candidates: two near-identical high-rel vectors
  // (10, 11), one diverse mid-rel (12), one diverse low-rel (13)
  private def cands = {
    import spark.implicits._
    Seq(
      (0L, 10L, 0.95, Array(1.0, 0.0, 0.0)),
      (0L, 11L, 0.94, Array(0.999, 0.01, 0.0)),
      (0L, 12L, 0.80, Array(0.0, 1.0, 0.0)),
      (0L, 13L, 0.60, Array(0.0, 0.0, 1.0))
    ).toDF("qid", "cid", "rel", "vec")
  }

  test("first pick is argmax relevance; redundant twin deferred") {
    val got = Similarity.mmrRerank(cands, "qid", "cid", "rel", "vec", 4, 0.5)
      .collect().map(r => (r.getLong(1), r.getInt(2), r.getDouble(3))).sortBy(_._2)
    assert(got.map(_._1).toSeq == Seq(10L, 12L, 13L, 11L),
      s"expected diverse picks before the near-duplicate twin, got ${got.toSeq}")
    // rank-1 score is λ·rel − (1−λ)·0.0
    assert(got.head._3 == 0.5 * 0.95 - 0.5 * 0.0)
  }

  test("λ=1 reduces to pure relevance ranking") {
    val got = Similarity.mmrRerank(cands, "qid", "cid", "rel", "vec", 4, 1.0)
      .collect().map(r => (r.getLong(1), r.getInt(2))).sortBy(_._2).map(_._1)
    assert(got.toSeq == Seq(10L, 11L, 12L, 13L))
  }

  test("k larger than candidate set returns all candidates") {
    val got = Similarity.mmrRerank(cands, "qid", "cid", "rel", "vec", 99, 0.5)
    assert(got.count() == 4)
  }

  test("real corpus: mmr picks are a diverse subset of the candidates") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") < 2)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val cand = Similarity.knnJoin(q, "qid", "qv", e, "vec_id", "embedding", 15)
    val withVec = e.select(col("vec_id"), col("embedding"))
      .join(broadcast(cand), Seq("vec_id"))
    val got = Similarity.mmrRerank(withVec, "qid", "vec_id", "score", "embedding", 5, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.length == 10)
    val candSet = cand.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.forall(r => candSet.contains((r._1, r._2))))
    // picks are distinct per query
    got.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._2).distinct.length == rs.length)
    }
  }

  test("plan shape: no Window; selection is row-local above one gather") {
    val plan = Similarity.mmrRerank(cands, "qid", "cid", "rel", "vec", 3, 0.5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"))
    assert(plan.contains("MmrSelect") || plan.toLowerCase.contains("mmr"))
  }
}
