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

  test("substituteWords: seed 0 identity; consistent per-type tagging; word count preserved") {
    assert(ScaleGen.substituteWords(doc, 0) == doc)
    val s = ScaleGen.substituteWords("a b a c a b", 3)
    val ws = s.split(" ")
    assert(ws.length == 6)
    // content-keyed: every occurrence of a type substitutes the same way
    assert(ws.zip("a b a c a b".split(" ")).groupBy(_._2).forall {
      case (_, occ) => occ.map(_._1).distinct.length == 1
    })
    // roughly half the types tagged over a big vocab (the calibrated
    // default — see substituteWords scaladoc)
    val big = (0 until 2000).map(i => s"w$i").mkString(" ")
    val tagged = ScaleGen.substituteWords(big, 1).split(" ")
      .count(w => w.endsWith("1") && !w.dropRight(1).endsWith("1"))
    assert(tagged > 800 && tagged < 1200, s"tagged $tagged of 2000")
  }

  test("perturbWords breaks SimHash replica identity (real kernel, real docs)") {
    // Permutation alone leaves the token multiset — and so the SimHash
    // signature — IDENTICAL across replicas (hamming 0, a 10-way exact
    // dup family). The composed perturbation must push replica pairs
    // past the q15 near-dup radius (maxDist 3) for nearly all docs;
    // a small straggler rate (docs dominated by unsubstituted types)
    // is a plausible natural near-dup rate, not an artifact.
    import org.apache.spark.sql.functions._
    val base = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("doc_id"), col("text")).limit(300).cache()
    val perturbU = udf((t: String, s: Int) => ScaleGen.perturbWords(t, s))
    def sigs(seed: Int) = graft.operators.Dedup.simhash(
      base.withColumn("text", perturbU(col("text"), lit(seed))), "doc_id", "text")
      .withColumnRenamed("simhash", s"sig$seed")
    val joined = sigs(0).join(sigs(1), "doc_id").join(sigs(2), "doc_id")
      .select(
        bit_count(col("sig0").bitwiseXOR(col("sig1"))).as("h01"),
        bit_count(col("sig0").bitwiseXOR(col("sig2"))).as("h02"),
        bit_count(col("sig1").bitwiseXOR(col("sig2"))).as("h12"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("h01") <= 3, 1).otherwise(0)
          + when(col("h02") <= 3, 1).otherwise(0)
          + when(col("h12") <= 3, 1).otherwise(0)).as("near"))
      .head()
    val frac = joined.getLong(1).toDouble / (3 * joined.getLong(0))
    assert(frac < 0.12, s"${frac * 100}% of replica pairs still simhash-near")
    base.unpersist()
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

    // Past the lag period (seed ≥ dim — factor-100 territory) lags
    // collide: seeds 0 and 64 share lag 0 and rotation alone would
    // leave them byte-identical (cos 1, an exact tie). High-group
    // seeds switch to the affine permutation composed with per-seed
    // signs, which must land colliding-lag pairs in the same
    // ordinary-point range. (A shared-rotation sign pattern alone
    // measured mean |cos| ≈ 0.22 here — kurtosis-bound.)
    assert(ScaleGen.rotationLag(64, 64) == ScaleGen.rotationLag(0, 64))
    def applyHigh(v: Array[Float], seed: Int): Array[Float] = {
      val p = ScaleGen.affinePerm(seed, v.length)
      val s = ScaleGen.signVector(seed, v.length)
      Array.tabulate(v.length)(j => v(p(j)) * s(j))
    }
    for (seed <- Seq(64, 87, 93)) { // lags collide with seeds 0, 23, 29
      assert(ScaleGen.rotationLag(seed, 64) == ScaleGen.rotationLag(seed - 64, 64))
      val perm = ScaleGen.affinePerm(seed, 64)
      assert(perm.distinct.length == 64, "affinePerm must be a bijection")
      val cosines = vecs.map { v =>
        val a = applyHigh(v, seed)
        val b = rotate(v, ScaleGen.rotationLag(seed - 64, 64))
        math.abs(cos(a, b))
      }
      val mean = cosines.sum / cosines.length
      assert(mean < 0.2, s"seed pair (${seed - 64},$seed) mean replica-pair |cos| $mean")
    }
    // and high-group pairs against EACH OTHER — including (83, 84),
    // the pair the r13 independent-hash draw collided to one (a, b)
    // (both drew (13, 2) at dim 64), which collapsed it to the
    // sign-only regime (mean |cos| ≈ 0.22) this assertion rejects
    val highPairs = for (Seq(s1, s2) <- Seq(64, 83, 84, 87, 93, 99).combinations(2).toSeq) yield {
      val cosines = vecs.map(v => math.abs(cos(applyHigh(v, s1), applyHigh(v, s2))))
      (s1, s2, cosines.sum / cosines.length)
    }
    highPairs.foreach { case (s1, s2, mean) =>
      assert(mean < 0.2, s"high seed pair ($s1,$s2) mean replica-pair |cos| $mean")
    }
  }

  test("affinePerm: (a, b) pairwise distinct across the full dim²/2 seed window") {
    // the injectivity that makes the sign-only regime unreachable by
    // construction: every seed in a window of dim²/2 consecutive seeds
    // (2048 at dim 64 — far past any bench factor) must get its own
    // (a, b), i.e. its own permutation ARRAY; the r13 birthday-collision
    // counterexample (83, 84) is inside the asserted window
    val dim = 64
    val perms = (dim until dim + dim * dim / 2).map { s =>
      val p = ScaleGen.affinePerm(s, dim)
      assert(p.distinct.length == dim, s"affinePerm($s) must be a bijection")
      p.toSeq
    }
    assert(perms.distinct.length == perms.length,
      "affinePerm must assign distinct permutations within the seed window")
  }
}
