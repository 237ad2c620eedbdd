package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.K
import graft.operators.Sampling

/** Deterministic sampling: rate accuracy, partitioning invariance,
  * stratified rates, quota-cap selection rule, and plan shapes (narrow
  * filter; no per-key window). */
class SamplingSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private lazy val d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    .select(col("doc_id"), col("lang"), col("source"))

  test("dsirMasses: matches a driver-side recomputation; partitioning-invariant") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x y x y z"), (2L, "x y q r"), (3L, "p q p q"), (4L, "z"))
      .toDF("doc_id", "text")
    val target = docs.filter(col("doc_id") === 1L)
    val B = 4096
    val got = Sampling.dsirMasses(docs, "doc_id", "text", target, B, 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // independent recomputation from the exploded feature walk
    val feats = docs
      .select(col("doc_id"), graft.functions.Kernel.tokenIds(col("text"), 512).as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), explode(graft.operators.Dedup.shingles(col("t"), 2)).as("sh"))
      .collect().map(r => (r.getLong(0), r.getLong(1) % B))
    val tc = feats.filter(_._1 == 1L).groupBy(_._2).map { case (b, xs) => b -> xs.size.toLong }
    val sc = feats.groupBy(_._2).map { case (b, xs) => b -> xs.size.toLong }
    val expected = feats.groupBy(_._1).map { case (id, fs) =>
      val byB = fs.groupBy(_._2).map { case (b, xs) => b -> xs.size.toLong }
      id -> ((byB.map { case (b, c) => c * (tc.getOrElse(b, 0L) + 1L) }.sum,
        byB.map { case (b, c) => c * (sc(b) + 1L) }.sum))
    }
    assert(got == expected)
    assert(!got.contains(4L), "a doc below the shingle width carries no features")
    val rep = Sampling.dsirMasses(docs.repartition(5), "doc_id", "text", target, B, 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rep == got)
  }

  test("dsirTopK: target-like docs rank first by the smoothed likelihood ratio") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x y x y x y"), (2L, "x y x y q r"), (3L, "p q p q p q"), (4L, "s t u v w a"))
      .toDF("doc_id", "text")
    val target = docs.filter(col("doc_id") === 1L)
    val top = Sampling.dsirTopK(docs, "doc_id", "text", target, 2, 4096, 2)
      .select("doc_id").collect().map(_.getLong(0))
    // doc 1 IS the target, doc 2 shares most features with it — the
    // off-target docs 3/4 must not outrank them
    assert(top.toSet == Set(1L, 2L))
  }

  test("ratioKey: exact ordering where a double-cast ratio collapses") {
    import spark.implicits._
    // (2^62+1)/2^62 < 2^62/(2^62-1), but BOTH ratios round to exactly
    // 1.0 as doubles; plus boundary shapes (huge q, s=1, equal ratios
    // in unequal terms) — the key must order precisely like BigDecimal
    val p62 = 1L << 62
    val rows = Seq(
      (1L, p62 + 1, p62), (2L, p62, p62 - 1), (3L, Long.MaxValue, 1L),
      (4L, 1L, Long.MaxValue), (5L, 6L, 4L), (6L, 3L, 2L), (7L, 7L, 2L))
    val keys = rows.toDF("id", "t", "s")
      .select(col("id"), Sampling.ratioKey("t", "s").as("key"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // scala BigDecimal./ rounds to DECIMAL128 (34 digits) — not enough
    // here; divide at the key's own 54-digit scale explicitly
    def exact(t: Long, s: Long) = new java.math.BigDecimal(t)
      .divide(new java.math.BigDecimal(s), 54, java.math.RoundingMode.FLOOR)
    for ((ia, ta, sa) <- rows; (ib, tb, sb) <- rows) {
      val (ka, kb) = (keys(ia), keys(ib))
      val cmp = exact(ta, sa).compareTo(exact(tb, sb))
      assert(Integer.signum(ka.compareTo(kb)) == cmp,
        s"key order for $ta/$sa vs $tb/$sb diverged from exact ($ka vs $kb)")
    }
    // the doubles really do collapse — the case the key exists for
    assert(ta2d(p62 + 1, p62) == ta2d(p62, p62 - 1))
    assert(keys(1L) < keys(2L))
  }
  private def ta2d(t: Long, s: Long): Double = t.toDouble / s.toDouble

  test("quantileThreshold/topFraction: exact order statistic, ties resolved to k") {
    import spark.implicits._
    // tie-heavy scores: one giant boundary bucket is the hard case
    val rows = (1L to 100L).map(i => (i, if (i <= 10) 90L else if (i <= 60) 50L else 10L))
    val df = rows.toDF("id", "score").repartition(7)
    val k = math.ceil(0.3 * 100).toInt // 30: 10 at 90 + 20 of the fifty 50s
    val exact = Sampling.topFraction(df, "id", "score", 0.3)
      .select(col("id"), col("score")).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(exact.length == k, s"topFraction kept ${exact.length}, want exactly $k")
    assert(exact.count(_._2 == 90L) == 10 && exact.count(_._2 == 50L) == 20)
    // boundary picks are the lowest-hash 50-scored ids
    def hv(id: Long): Long = ((id % K.M + K.M) % K.M * K.A2 + K.C2) % K.M
    val wantBoundary = (11L to 60L).sortBy(id => (hv(id), id)).take(20).toSet
    assert(exact.filter(_._2 == 50L).map(_._1).toSet == wantBoundary)
    // threshold variant keeps the whole boundary bucket (a superset)
    val loose = Sampling.quantileThreshold(df, "id", "score", 0.3)
      .select(col("id"), col("score")).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(loose.length == 60 && loose.map(_._1).toSet.size == 60)
    assert(exact.map(_._1).toSet.subsetOf(loose.map(_._1).toSet))
    // frac = 1 keeps everything
    assert(Sampling.quantileThreshold(df, "id", "score", 1.0).count() == 100)
    assert(Sampling.topFraction(df, "id", "score", 1.0).count() == 100)
  }

  test("topFraction: degenerate single-score corpus — whole corpus on the boundary") {
    import spark.implicits._
    // every row ties at the boundary: the case where a naive global
    // row_number window would funnel the ENTIRE corpus through one
    // reducer; the two-level hash-range selection must keep exactly k
    // and pick the same lowest-(hash, id) lottery winners
    val n = 5000
    val df = (1L to n.toLong).map(i => (i, 7L)).toDF("id", "score").repartition(11)
    val frac = 0.2
    val k = math.ceil(n * frac).toInt
    val kept = Sampling.topFraction(df, "id", "score", frac)
      .select(col("id")).collect().map(_.getLong(0))
    assert(kept.length == k, s"kept ${kept.length}, want exactly $k")
    def hv(id: Long): Long = ((id % K.M + K.M) % K.M * K.A2 + K.C2) % K.M
    val want = (1L to n.toLong).sortBy(id => (hv(id), id)).take(k).toSet
    assert(kept.toSet == want, "degenerate boundary picked the wrong lottery winners")
  }

  test("curationPipeline: every stage's invariant holds on the kept rows") {
    val full = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
    val rates = Seq("en" -> 0.5, "zh" -> 0.1)
    val out = Sampling.curationPipeline(full, "doc_id", "text", "lang", "source",
        lengthFrac = 0.5, maxPerSource = 20, rates = rates, defaultRate = 0.25)
      .select(col("doc_id"), col("lang"), col("source"), col("n_tokens"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out.nonEmpty)
    // dedup invariant: only exact-dedup keep ids survive
    val keepIds = graft.operators.Dedup.exact(
        full.withColumn("__ct", graft.operators.TextAnalysis.cleanText(col("text")))
          .select(col("doc_id"), col("__ct").as("text")), "doc_id", "text")
      .select(col("keep_id")).collect().map(_.getLong(0)).toSet
    assert(out.forall(r => keepIds(r._1)), "a non-keeper survived dedup")
    // quota invariant: no source above the cap
    out.groupBy(_._3).foreach { case (src, rows) =>
      assert(rows.length <= 20, s"source $src kept ${rows.length} > 20") }
    // stratified invariant: every kept row clears its language's hash rate
    def hv(id: Long): Long = ((id % K.M + K.M) % K.M * K.A2 + K.C2) % K.M
    val rateOf = rates.toMap
    out.foreach { case (id, lang, _, _) =>
      val thr = Sampling.threshold(rateOf.getOrElse(lang, 0.25))
      assert(hv(id) < thr, s"doc $id ($lang) fails its stratum's hash rate") }
  }

  test("uniform sample: ~rate kept, decision is per-id stable") {
    val n = d.count().toDouble
    val kept = Sampling.sample(d, "doc_id", 0.3)
    val frac = kept.count() / n
    assert(frac > 0.2 && frac < 0.4, s"kept fraction $frac far from 0.3")
    // partitioning invariance: same ids kept after a repartition
    val ids1 = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = Sampling.sample(d.repartition(7), "doc_id", 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2)
    // monotone in rate: the 0.3-sample contains the 0.1-sample
    val ids01 = Sampling.sample(d, "doc_id", 0.1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids01.subsetOf(ids1))
  }

  test("stratified sample applies per-stratum rates with default fallback") {
    val got = Sampling.stratifiedSample(d, "doc_id", "lang",
      Seq("en" -> 1.0, "zh" -> 0.0), 0.25)
    val byLang = got.groupBy("lang").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val total = d.groupBy("lang").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(byLang("en") == total("en"), "rate 1.0 keeps every en doc")
    assert(!byLang.contains("zh"), "rate 0.0 drops every zh doc")
    val deFrac = byLang("de").toDouble / total("de")
    assert(deFrac > 0.1 && deFrac < 0.45, s"default-rate stratum kept $deFrac")
  }

  test("capPerKey keeps at most maxN per key, lowest hash first") {
    val capped = Sampling.capPerKey(d, "source", "doc_id", 7)
    val byKey = capped.groupBy("source").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(byKey.values.forall(_ <= 7L))
    assert(byKey.values.forall(_ == 7L), "every source has ≥7 docs at sf0.01")
    // the kept set per key is exactly the maxN lowest id-hashes
    val all = d.select(col("source"), col("doc_id"),
        Sampling.sampleHash(col("doc_id")).as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = all.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      rows.sortBy(r => (r._3, r._2)).take(7).map(r => (r._1, r._2)).toSeq
    }.toSet
    val got = capped.select("source", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == expected)
  }

  test("packGreedyFirstFit: budget respected, packs contiguous, every doc kept once") {
    import spark.implicits._
    val docsDf = graft.operators.TextAnalysis
      .tokenCounts(spark.read.parquet("/root/testdata/sf0.01/documents.parquet"),
        "doc_id", "text")
      .select(col("doc_id"), col("ws_tokens"))
    val budget = 256L
    val got = Sampling.packGreedyFirstFit(docsDf, "doc_id", "ws_tokens", budget, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == docsDf.count(), "every doc assigned exactly once")
    // no pack exceeds the budget unless it is a single over-budget doc
    got.groupBy(t => (t._2, t._3)).foreach { case ((sh, p), rows) =>
      val total = rows.map(_._4).sum
      assert(total <= budget || rows.length == 1,
        s"shard $sh pack $p holds $total tokens across ${rows.length} docs")
    }
    // within a shard, walking docs in id order the pack id is
    // non-decreasing and steps by at most 1 (contiguity), and matches a
    // driver-side replay of the first-fit recurrence
    got.groupBy(_._2).foreach { case (sh, rows) =>
      val inOrder = rows.sortBy(_._1)
      var pack = 0L; var used = 0L
      inOrder.foreach { case (id, _, gotPack, tok) =>
        if (used > 0 && used + tok > budget) { pack += 1; used = 0L }
        used += tok
        assert(gotPack == pack, s"shard $sh doc $id: pack $gotPack != replay $pack")
      }
    }
    // partitioning invariance: the recurrence depends only on id order
    val rep = Sampling.packGreedyFirstFit(docsDf.repartition(13),
        "doc_id", "ws_tokens", budget, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rep.toSet == got.toSet)
  }

  test("packGreedyFirstFit: zero-token head + over-budget doc stay in pack 0") {
    // the used>0 rollover guard: an empty doc leaves used==0, so the
    // following over-budget doc must NOT open a new pack (it lands in
    // the still-empty pack 0) — the oracle's recursive CASE carries the
    // same guard, or the q128/q131 gates would diverge on any corpus
    // with a whitespace-only doc at a shard head
    import spark.implicits._
    val df = Seq((0L, 0L), (8L, 999L), (16L, 5L)).toDF("doc_id", "t")
    val got = Sampling.packGreedyFirstFit(df, "doc_id", "t", budget = 256L, nShards = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(got == Map(0L -> 0L, 8L -> 0L, 16L -> 1L))
  }

  test("packByOffset: pack = first-token window of the per-shard concat stream") {
    val docsDf = graft.operators.TextAnalysis
      .tokenCounts(spark.read.parquet("/root/testdata/sf0.01/documents.parquet"),
        "doc_id", "text")
      .select(col("doc_id"), col("ws_tokens"))
    val budget = 256L
    val got = Sampling.packByOffset(docsDf, "doc_id", "ws_tokens", budget, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    got.groupBy(_._2).foreach { case (sh, rows) =>
      var offset = 0L
      rows.sortBy(_._1).foreach { case (id, _, pack, tok) =>
        assert(pack == offset / budget, s"shard $sh doc $id: pack $pack != ${offset / budget}")
        offset += tok
      }
    }
    // offset binning packs tighter than first-fit: same pack count or
    // fewer per shard (no fragmentation — it splits docs at boundaries)
    val greedy = Sampling.packGreedyFirstFit(docsDf, "doc_id", "ws_tokens", budget, 8)
      .groupBy(col("shard")).agg(max(col("pack")).as("mx"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.groupBy(_._2).foreach { case (sh, rows) =>
      assert(rows.map(_._3).max <= greedy(sh))
    }
  }

  test("plan shapes: sample is a narrow filter; cap has no Window") {
    val samplePlan = Sampling.sample(d, "doc_id", 0.3)
      .queryExecution.executedPlan.toString
    assert(!samplePlan.contains("Exchange"), "uniform sample must not shuffle")
    val capPlan = Sampling.capPerKey(d, "source", "doc_id", 7)
      .queryExecution.executedPlan.toString
    assert(!capPlan.contains("Window"), "quota cap must use the partial top-k heap")
  }
}
