package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators._

/** BGE-M3 joint-output invariants mirroring the reference's tests
  * (/root/reference/tests/bgem3.rs:13-160, 221-236): all three outputs
  * from one pass, each bit-identical to its standalone operator. */
class Bgem3Spec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    .select(col("doc_id"), col("text")).filter(col("doc_id") < 50)

  private lazy val joint = Bgem3Embedder.embed(docs, "doc_id", "text").cache()

  test("joint dense == standalone TextEmbedder(Mean) bit-for-bit") {
    val jd = joint.select(col("doc_id"), col("bgem3.dense").as("emb"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toList).toMap
    val sd = TextEmbedder().embed(docs, "text", "emb")
      .select(col("doc_id"), col("emb"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toList).toMap
    assert(jd == sd)
  }

  test("joint sparse == standalone SparseEmbedder(skipSpecial) bit-for-bit") {
    val jp = joint
      .select(col("doc_id"), explode(
        arrays_zip(col("bgem3.sparse.indices").as("t"), col("bgem3.sparse.values").as("w"))).as("z"))
      .select(col("doc_id"), col("z.t"), col("z.w"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val sp = SparseEmbedder.sparseExplodedRelational(docs, "doc_id", "text", skipSpecial = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(jp == sp)
  }

  test("native sparsePairs == HOF formulation on real corpus") {
    val tids = docs.withColumn("tids", graft.functions.Kernel.tokenIds(col("text")))
      .filter(size(col("tids")) > 0)
    val cmp = tids
      .withColumn("fast", Bgem3Embedder.sparsePairs(col("tids")))
      .withColumn("hof", Bgem3Embedder.sparsePairsHof(col("tids")))
      .filter(not(col("fast") === col("hof")))
    assert(cmp.count() == 0)
  }

  test("joint sparse: indices sorted asc, distinct, values > 0, specials absent") {
    joint.select(col("bgem3.sparse.indices"), col("bgem3.sparse.values")).collect().foreach { r =>
      val idx = r.getSeq[Long](0)
      val vals = r.getSeq[Double](1)
      assert(idx.length == vals.length)
      assert(idx == idx.sorted && idx.distinct.length == idx.length)
      assert(vals.forall(_ > 0.0))
      assert(idx.forall(_ > 3L))
    }
  }

  test("joint colbert == standalone ColbertEmbedder bit-for-bit") {
    val jc = joint
      .select(col("doc_id"), posexplode(col("bgem3.colbert")).as(Seq("i", "vec")))
      .select(col("doc_id"), (col("i") + 1).as("pos"), col("vec"))
      .collect().map(r => (r.getLong(0), r.getInt(1) + 0L) -> r.getSeq[Double](2).toList).toMap
    val sc = ColbertEmbedder.colbertExploded(docs, "doc_id", "text", dim = 16)
      .collect().map(r => (r.getLong(0), r.getInt(1) + 0L) -> r.getSeq[Double](2).toList).toMap
    assert(jc == sc)
  }

  test("colbert truncation: max_length=5 yields exactly 4 token vectors (tests/bgem3.rs:221-236)") {
    val one = Seq((0L, "one two three four five six seven")).toDF("doc_id", "text")
    val out = Bgem3Embedder.embed(one, "doc_id", "text", maxLength = 5)
      .select(size(col("bgem3.colbert"))).head().getInt(0)
    assert(out == 4)
  }

  test("joint plan is shuffle-free (no Exchange)") {
    val plan = Bgem3Embedder.embed(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"joint plan must be narrow:\n$plan")
  }
}
