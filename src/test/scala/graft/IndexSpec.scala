package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{K, Kernel}
import graft.operators.Similarity

/** Bucketed LSH index: build once, join shuffle-free forever. */
class IndexSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private lazy val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("writeLshIndex + bucketed self-join elides both exchanges") {
    Similarity.writeLshIndex(e, "vec_id", "embedding", K.Dim, 8, "graft_lsh_idx")
    val t = spark.table("graft_lsh_idx")
    // force sort-merge (broadcast would trivially have no shuffle) and
    // check the bucketed join reads pre-shuffled data on BOTH sides
    val l = t.select(col("vec_id").as("id_a"), col("embedding").as("va"), col("bucket"))
    val r = t.select(col("vec_id").as("id_b"), col("embedding").as("vb"), col("bucket"))
    val joined = l.hint("merge").join(r.hint("merge"), Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
    assert(joined.count() > 0)
  }

  test("annLshJoinIndexed == on-the-fly annLshJoin results") {
    Similarity.writeLshIndex(e, "vec_id", "embedding", K.Dim, 8, "graft_lsh_idx2")
    val q = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    def asSet(df: org.apache.spark.sql.DataFrame) = df
      .select(col("qid"), col("vec_id"), col("rank"), col("score"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    val indexed = asSet(Similarity.annLshJoinIndexed(spark, q, "qid", "qv",
      "graft_lsh_idx2", "vec_id", "embedding", K.Dim, 8, 5))
    val fresh = asSet(Similarity.annLshJoin(q, "qid", "qv", e, "vec_id", "embedding",
      K.Dim, 8, 5))
    assert(indexed == fresh)
  }
}
