package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{K, Kernel}
import graft.operators.{FullText, Similarity}
import graft.operators.TextEmbedder

/** BM25 weights/search and reciprocal-rank fusion: statistical sanity
  * (idf monotone in df, length normalization), self-retrieval, a
  * brute-force score recompute, RRF fusion semantics, and the plan
  * shapes (broadcast query join, no Window, partial top-k). */
class FullTextSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private lazy val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    .select(col("doc_id"), col("text"))

  private lazy val weights = FullText.bm25DocWeights(d, "doc_id", "text")

  test("bm25 weights: positive, idf factor decreases with df") {
    val rows = weights.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._5 > 0.0), "all BM25 weights positive")
    // same tf and dl → the weight ratio is exactly the idf ratio, which
    // must fall as df rises; check across tokens of one doc with tf=1
    val n = d.count()
    val idf = (df: Long) =>
      math.floor(math.log(1.0 + ((n - df).toDouble + 0.5) / (df.toDouble + 0.5)) *
        FullText.IdfScale + 0.5) / FullText.IdfScale
    rows.foreach { case (_, _, _, df, _) => assert(idf(df) > 0.0) }
    assert(idf(1) > idf(10) && idf(10) > idf(100))
  }

  test("bm25 search: query doc retrieved in its own top-10") {
    val q = d.filter(col("doc_id") < 4)
      .select(col("doc_id").as("qid"), col("text").as("qtext"))
    val got = FullText.bm25Search(q, "qid", "qtext", d, "doc_id", "text", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(got.count(_._3 == 1) == 4)
    // self-top-1 is NOT guaranteed: the synthetic corpus shares most of
    // its vocabulary across docs, and BM25 length normalization lets a
    // shorter doc with the same terms outscore the query doc itself —
    // but matching every one of its own terms keeps self in the top-10
    (0L until 4L).foreach { qid =>
      assert(got.exists(r => r._1 == qid && r._2 == qid),
        s"query $qid absent from its own top-10")
    }
  }

  test("bm25 search score equals brute-force recompute") {
    val q = d.filter(col("doc_id") === 2)
      .select(col("doc_id").as("qid"), col("text").as("qtext"))
    val got = FullText.bm25Search(q, "qid", "qtext", d, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(1), r.getDouble(3))).toMap
    // recompute from the weights table: the doc's weights over the
    // query's distinct terms, snapped to the fixed-point grid and summed
    // as longs (the operator's order-independent fold), then /ScoreScale
    val qTerms = d.filter(col("doc_id") === 2)
      .select(explode(array_distinct(Kernel.tokenIds(col("text")))).as("t"))
      .collect().map(_.getLong(0)).toSet
    val byDoc = weights.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(4)))
      .filter(t => qTerms.contains(t._2))
      .groupBy(_._1)
    got.foreach { case (docId, score) =>
      val expected = byDoc(docId)
        .map(t => math.floor(t._3 * FullText.ScoreScale + 0.5).toLong)
        .sum.toDouble / FullText.ScoreScale
      assert(score == expected, s"doc $docId: $score vs $expected")
    }
  }

  test("rrf: doc ranked in both legs beats single-leg docs; scores exact") {
    import spark.implicits._
    val a = Seq((0L, 10L, 1), (0L, 11L, 2)).toDF("qid", "doc_id", "rank")
    val b = Seq((0L, 10L, 2), (0L, 12L, 1)).toDF("qid", "doc_id", "rank")
    val got = FullText.rrfFuse(a, b, "qid", "doc_id", 10)
      .collect().map(r => (r.getLong(1), r.getInt(2), r.getDouble(3))).sortBy(_._2)
    assert(got.map(_._1).toSeq == Seq(10L, 12L, 11L))
    assert(got.head._3 == 1.0 / 61.0 + 1.0 / 62.0)   // both legs
    assert(got(1)._3 == 1.0 / 61.0)                  // leg-b only
    assert(got(2)._3 == 1.0 / 62.0)                  // leg-a only
  }

  test("hybrid rrf on real corpus: self-doc fused first") {
    val emb = TextEmbedder().embed(d, "text", "emb")
    val qEmb = emb.filter(col("doc_id") < 2)
      .select(col("doc_id").as("qid"), col("emb").as("qv"))
    val dense = Similarity.knnJoin(qEmb, "qid", "qv", emb, "doc_id", "emb", 10)
    val q = d.filter(col("doc_id") < 2)
      .select(col("doc_id").as("qid"), col("text").as("qtext"))
    val sparse = FullText.bm25Search(q, "qid", "qtext", d, "doc_id", "text", 10)
    val fused = FullText.rrfFuse(dense, sparse, "qid", "doc_id", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    fused.filter(_._3 == 1).foreach { case (qid, top1, _) =>
      assert(top1 == qid, s"query $qid fused top-1 was $top1")
    }
  }

  test("plan shapes: broadcast query join, no Window, partial top-k heap") {
    val q = d.filter(col("doc_id") < 4)
      .select(col("doc_id").as("qid"), col("text").as("qtext"))
    val plan = FullText.bm25Search(q, "qid", "qtext", d, "doc_id", "text", 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "ranking must be the top-k heap, not a window")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      "query terms must broadcast")
    assert(plan.contains("TopKAgg") || plan.contains("topkagg") ||
      plan.toLowerCase.contains("topk"), "partial top-k aggregate in plan")
  }
}
