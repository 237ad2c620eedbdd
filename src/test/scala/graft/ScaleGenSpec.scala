package graft

import org.scalatest.funsuite.AnyFunSuite

/** Gates the scale-generator's perturbation recipes (ADVICE r12): the
  * whole point of ScaleGen is that replicas of one source row must NOT
  * look like near-duplicates of each other — otherwise the scaled
  * corpus measures a factor²-inflated dedup/ANN candidate structure no
  * real 10× corpus has.
  */
class ScaleGenSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private def shingles(text: String, k: Int = 3): Set[String] =
    text.split(" ").sliding(k).map(_.mkString(" ")).toSet

  private def jaccard(a: Set[String], b: Set[String]): Double =
    if (a.isEmpty && b.isEmpty) 1.0
    else a.intersect(b).size.toDouble / a.union(b).size

  private val doc = (0 until 200).map(i => s"w$i").mkString(" ")

  test("permuteWords: seed 0 is identity; other seeds preserve the word multiset") {
    assert(ScaleGen.permuteWords(doc, 0) == doc)
    for (s <- 1 to 9) {
      val p = ScaleGen.permuteWords(doc, s)
      assert(p != doc)
      assert(p.length == doc.length)
      assert(p.split(" ").sorted.toSeq == doc.split(" ").sorted.toSeq)
    }
  }

  test("permuteWords: permutations are independent across seeds (not rotations)") {
    // A rotation preserves all but ~k-1 shingles → Jaccard ≈ 0.97 on a
    // 200-word doc. Independent permutations share only chance shingles.
    val perms = (0 to 9).map(s => shingles(ScaleGen.permuteWords(doc, s)))
    for (i <- 0 to 9; j <- (i + 1) to 9) {
      val jac = jaccard(perms(i), perms(j))
      assert(jac < 0.05, s"seeds $i/$j share ${jac * 100}%% of 3-shingles")
    }
  }

  test("permuteWords: same seed is deterministic across calls") {
    assert(ScaleGen.permuteWords(doc, 3) == ScaleGen.permuteWords(doc, 3))
  }

  test("rotationLag: nonzero and pairwise-distinct for seeds 1..9 at dim 64") {
    val lags = (1 to 9).map(ScaleGen.rotationLag(_, 64))
    assert(lags.forall(l => l > 0 && l < 64))
    assert(lags.distinct.size == lags.size)
  }

  test("embedding rotation: replica-pair cosine well below typical neighbor cosine") {
    // The sf0.1 corpus's typical top-5 neighbor cosine is ~0.37; a ±5%
    // jitter leaves replica pairs at ~0.9996 (an effective kNN tie).
    // Dimension rotation must land them in the ordinary-point range.
    val vecs = spark.read
      .parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select("embedding")
      .limit(500)
      .collect()
      .map(_.getSeq[Float](0).toArray)
    def rotate(v: Array[Float], k: Int): Array[Float] =
      Array.tabulate(v.length)(i => v((i - k + v.length) % v.length))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / math.max(math.sqrt(na) * math.sqrt(nb), 1e-12)
    }
    for (seed <- Seq(1, 2, 5, 9)) {
      val lag = ScaleGen.rotationLag(seed, 64)
      val cosines = vecs.map(v => math.abs(cos(v, rotate(v, lag))))
      val mean = cosines.sum / cosines.length
      assert(mean < 0.2, s"seed $seed mean replica-pair |cos| $mean")
    }
  }
}
