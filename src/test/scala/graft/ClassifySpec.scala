package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Label-prototype centroids and nearest-centroid classification:
  * exactness of the quantized mean, partitioning invariance, majority
  * self-consistency, and the narrow plan. */
class ClassifySpec extends AnyFunSuite with SparkSessionTestWrapper {

  private lazy val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def collectCents = Similarity.labelCentroids(e, "label", "embedding")
    .collect()
    .map(r => (r.getInt(0).toLong, r.getSeq[Double](1).toArray))
    .sortBy(_._1)

  test("centroids: one per label, quantized mean matches local recompute") {
    val cents = collectCents.toMap
    val rows = e.collect()
      .map(r => (r.getInt(2), r.getSeq[Float](1)))
    val byLabel = rows.groupBy(_._1)
    assert(cents.keySet == byLabel.keySet.map(_.toLong))
    byLabel.foreach { case (lbl, rs) =>
      val dim = rs.head._2.length
      val n = rs.length.toLong
      (0 until dim).foreach { d =>
        val s = rs.map(r => math.floor(r._2(d).toDouble * 1000000.0 + 0.5).toLong).sum
        val expected = s.toDouble / (n * 1000000L).toDouble
        assert(cents(lbl.toLong)(d) == expected, s"label $lbl dim $d")
      }
    }
  }

  test("centroids are partitioning-invariant (bit-exact)") {
    val a = collectCents.map { case (l, v) => (l, v.toSeq) }.toSeq
    val b = Similarity.labelCentroids(e.repartition(7), "label", "embedding")
      .collect()
      .map(r => (r.getInt(0).toLong, r.getSeq[Double](1).toSeq))
      .sortBy(_._1).toSeq
    assert(a == b)
  }

  test("classification: plurality of rows get their own label back") {
    val cents = collectCents
    val got = Similarity.classifyByCentroids(e, "embedding", cents)
      .select(col("label").cast("long"), col("pred"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val acc = got.count(r => r._1 == r._2).toDouble / got.length
    // prototypes are means of their own class; on clustered synthetic
    // data self-consistency should beat the 1/|labels| chance floor
    assert(acc > 0.3, s"self-consistency accuracy $acc")
    assert(got.map(_._2).toSet.subsetOf(cents.map(_._1).toSet))
  }

  test("labelCentroids ≡ the exploded per-(label,dim) formulation it replaced") {
    // the round-6 posexplode → groupBy(label, dim) shape, demoted to a
    // cross-check: same floor(v·S + 0.5) quantized mean, dim× more
    // shuffle rows — the VecSumAgg operator must be value-identical
    val got = collectCents.map { case (l, v) => (l, v.toSeq) }.toSeq
    val s9 = 1000000L
    val ref = e.select(col("label"), posexplode(col("embedding")).as(Seq("__d", "__v")))
      .groupBy(col("label"), col("__d"))
      .agg((sum(floor(col("__v").cast("double") * lit(s9.toDouble) + lit(0.5))
        .cast("long")).cast("double") /
        (count(lit(1)) * lit(s9)).cast("double")).as("__c"))
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("__d"), col("__c")))).as("__a"))
      .select(col("label"), transform(col("__a"), s => s("__c")).as("centroid"))
      .collect()
      .map(r => (r.getInt(0).toLong, r.getSeq[Double](1).toSeq))
      .sortBy(_._1).toSeq
    assert(got == ref)
  }

  test("labelCentroids plan aggregates vectors whole: no dim explosion") {
    val plan = Similarity.labelCentroids(e, "label", "embedding")
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Generate"),
      "centroid aggregation must not posexplode dims into label×dim rows")
  }

  test("classify plan is narrow: no exchange above the scan") {
    val plan = Similarity.classifyByCentroids(e, "embedding", collectCents)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "classification must not shuffle")
  }
}
