package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.{BloomBank, InlineBloom, BroadcastBloom, Kernel}
import graft.operators.{Dedup, Sketch}

/** Sketch family: CMS one-sided error + exact-at-no-collision, HLL
  * estimator accuracy + integer rho math, Bloom no-false-negatives +
  * narrow probe plan + bank inline/broadcast split. */
class SketchSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private lazy val d = spark.read
    .parquet("/root/testdata/sf0.01/documents.parquet")

  private lazy val exactCounts: Map[Long, Long] = d
    .select(explode(Kernel.tokenIds(col("text"), 512)).as("t"))
    .groupBy("t").count()
    .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("cmsEstimates: est >= exact for every token (one-sided error)") {
    val est = Sketch.cmsEstimates(d, "text", depth = 3, width = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(est.keySet == exactCounts.keySet)
    est.foreach { case (t, e) =>
      assert(e >= exactCounts(t), s"token $t: est $e < exact ${exactCounts(t)}")
    }
    // width 16 over a 31-token vocabulary MUST collide somewhere: the
    // sketch is genuinely lossy here, not a disguised exact count
    assert(est.exists { case (t, e) => e > exactCounts(t) })
  }

  test("cmsEstimates: exact when the grid is collision-free; partitioning-invariant") {
    // width far above the vocabulary: every token alone in its cells
    val wide = Sketch.cmsEstimates(d, "text", depth = 3, width = 1 << 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(wide == exactCounts)
    val rep = Sketch.cmsEstimates(d.repartition(7), "text", depth = 3, width = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val base = Sketch.cmsEstimates(d, "text", depth = 3, width = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rep == base)
  }

  test("cmsMerge: three-way disjoint merge == whole-corpus sketch") {
    val parts = (0 until 3).map(i =>
      Sketch.cmsSketch(d.filter(pmod(col("doc_id"), lit(3)) === i), "text", 3, 16))
    val merged = Sketch.cmsMerge(parts: _*)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val whole = Sketch.cmsSketch(d, "text", 3, 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == whole)
  }

  test("hllMerge: idempotent under overlapping slices") {
    import spark.implicits._
    val vals = (1L to 200L).map(("g", _)).toDF("grp", "v")
    val whole = Sketch.hllSketchTable(vals, "grp", "v", 6)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // two OVERLAPPING slices: 1..150 and 100..200 — max is idempotent
    val merged = Sketch.hllMerge("grp",
      Sketch.hllSketchTable(vals.filter(col("v") <= 150), "grp", "v", 6),
      Sketch.hllSketchTable(vals.filter(col("v") >= 100), "grp", "v", 6))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == whole)
  }

  test("hllDistinctShingles: estimate lands within the m=64 error band") {
    val rows = Sketch.hllDistinctShingles(d, "source", "text", n = 3, p = 6)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length == 20)
    rows.foreach { case (src, exact, est) =>
      // standard error 1.04/sqrt(64) = 13%; 3 sigma = 39%
      assert(math.abs(est - exact) / exact < 0.39,
        s"$src: est $est vs exact $exact")
    }
  }

  test("hllDistinct: rho/bucket math matches a JVM mirror") {
    import spark.implicits._
    val p = 6
    val m = 1 << p
    val vals = Seq(1L, 7L, 12345L, 999999L, 31L, 1000002L)
    val got = Sketch.hllDistinct(
      vals.map(("g", _)).toDF("grp", "v"), "grp", "v", p)
      .collect().map(r => r.getDouble(1)).head
    // mirror: same hash row, same bucket/rho, same scaled harmonic sum
    val (a, b) = Dedup.minhashPerm(Sketch.HllPermRow)
    val w = 32 - p
    val buckets = scala.collection.mutable.Map.empty[Long, Long]
    vals.foreach { v =>
      val g = (v * a + b) % graft.functions.K.P32
      val bucket = g & (m - 1)
      val r = g >> p
      val msb = (1 to w).count(i => r >= (1L << (i - 1)))
      val rho = (w + 1 - msb).toLong
      buckets(bucket) = math.max(buckets.getOrElse(bucket, 0L), rho)
    }
    val s = buckets.values.map(r => 1L << (40 - r)).sum +
      (m - buckets.size).toLong * (1L << 40)
    val expect = Sketch.hllNumerator(p) / s.toDouble
    assert(got == expect)
  }

  test("bloomContamination: supersets the exact contamination join") {
    val eval = d.filter(col("doc_id") < 100)
    val train = d.filter(col("doc_id") >= 100)
    val bank = Sketch.bloomBank(spark, eval, "doc_id", "text",
      n = 3, k = 2, nBits = 1 << 14)
    val flagged = Sketch.bloomContamination(train, bank, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // exact truth: docs sharing >= 1 shingle with the eval set
    val exact = Dedup.contamination(train, eval, "doc_id", "text",
      n = 3, minShared = 1L)
      .select(col("train_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(exact.subsetOf(flagged.keySet),
      s"false negatives: ${exact -- flagged.keySet}")
    // and the probe genuinely over-approximates at these parameters —
    // it is a Bloom filter, not a disguised join
    assert((flagged.keySet -- exact).nonEmpty)
    // flagged-shingle count per doc is at least the doc's true shared count
    val sharedShingles = {
      val ts = Dedup.shingleSet(train, "doc_id", "text", 3)
        .select(col("doc_id").as("tid"), col("shingle"))
      val es = Dedup.shingleSet(eval, "doc_id", "text", 3)
        .select(col("shingle")).distinct()
      ts.join(es, "shingle").groupBy("tid").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    sharedShingles.foreach { case (id, n) =>
      assert(flagged.getOrElse(id, 0L) >= n, s"doc $id: ${flagged.get(id)} < $n")
    }
  }

  test("bloom probe plan is narrow: no exchange, no join") {
    val bank = Sketch.bloomBank(spark, d.filter(col("doc_id") < 100),
      "doc_id", "text", n = 3, k = 2, nBits = 1 << 14)
    val plan = Sketch.bloomContamination(
      d.filter(col("doc_id") >= 100), bank, "doc_id", "text", n = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"bloom probe must not shuffle:\n$plan")
    assert(!plan.contains("Join"), s"bloom probe must not join:\n$plan")
  }

  test("BloomBank: bit round-trip, bounds check, inline/broadcast split") {
    val inline = BloomBank.of(spark, Array(0L, 63L, 64L, 16383L), 1 << 14, 2)
    assert(inline.isInstanceOf[InlineBloom])
    assert(inline.test(0L) && inline.test(63L) && inline.test(64L) &&
      inline.test(16383L))
    assert(!inline.test(1L) && !inline.test(62L) && !inline.test(65L))
    val big = BloomBank.of(spark, Array(99999L), 1 << 20, 3)
    assert(big.isInstanceOf[BroadcastBloom])
    assert(big.test(99999L) && !big.test(99998L))
    assertThrows[IllegalArgumentException] {
      BloomBank.of(spark, Array(1L << 14), 1 << 14, 2) // position == nBits
    }
    assertThrows[IllegalArgumentException] {
      BloomBank.of(spark, Array(1L), 100, 2) // nBits not a multiple of 64
    }
  }
}
