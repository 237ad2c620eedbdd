package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Sampling, Similarity, TextAnalysis}

/** Round-5 curation operators: SemDeDup, bigram LM scoring, hard-negative
  * mining, temperature mixture weights. */
class CurationSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private lazy val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("semDedupPairs: within-cell only, cosine-gated, HOF-assignment consistent") {
    val cents = Similarity.firstKCentroids(e, "vec_id", "embedding", 16)
    val pairs = Dedup.semDedupPairs(e, "vec_id", "embedding", cents, 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.nonEmpty)
    assert(pairs.forall { case (a, b, c) => a < b && c >= 0.4 })
    // independent assignment via the literal sort-slice HOF (BankSpec's
    // cross-check formulation, nProbe = 1 ≡ argmin)
    val centLit = array(cents.map { case (id, v) =>
      struct(lit(id).as("cell"), lit(v).as("cvec"))
    }: _*)
    val hofCell = element_at(transform(
      slice(array_sort(transform(centLit, c =>
        struct(Similarity.l2sq(col("embedding"), c("cvec")).as("d"), c("cell").as("cell")))),
        1, 1), s => s("cell")), 1)
    val cellOf = e.select(col("vec_id"), hofCell.as("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    pairs.foreach { case (a, b, _) => assert(cellOf(a) == cellOf(b)) }
  }

  test("semDedupPairs: hub-cell cap drops oversized cells") {
    val cents = Similarity.firstKCentroids(e, "vec_id", "embedding", 2)
    // 2 cells over the whole corpus — both far above a cap of 3
    val capped = Dedup.semDedupPairs(e, "vec_id", "embedding", cents, -1.0,
      maxCellSize = 3)
    assert(capped.count() == 0)
  }

  test("dupBlockStats: non-overlapping blocks, cross-doc only, short docs absent") {
    import spark.implicits._
    // w=2 blocks: doc1 = [ab][ab] (self-repeat, NOT cross-doc), doc2
    // shares [ab] with doc1, doc3 disjoint, doc4 too short for a block
    val docs = Seq(
      (1L, "a b a b"), (2L, "a b c d"), (3L, "e f g h"), (4L, "z"))
      .toDF("doc_id", "text")
    val got = Dedup.dupBlockStats(docs, "doc_id", "text", 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(
      1L -> ((2L, 2L)), // both [ab] blocks duplicated via doc2
      2L -> ((2L, 1L)), // [ab] duplicated, [cd] unique
      3L -> ((2L, 0L)))) // doc4 absent: no block
    // partitioning invariance
    val rep = Dedup.dupBlockStats(docs.repartition(5), "doc_id", "text", 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rep == got)
  }

  test("dropDupBlockDocs: integer-threshold filter; blockless docs survive") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b"), (2L, "a b c d"), (3L, "e f g h"), (4L, "z"))
      .toDF("doc_id", "text")
    // threshold 1/2: doc1 (2/2 dup) dropped, doc2 (1/2) kept (strict >),
    // doc3 (0/2) kept, doc4 (no blocks) kept
    val kept = Dedup.dropDupBlockDocs(docs, "doc_id", "text", 2, 1, 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L, 4L))
  }

  test("lmScore: conditional-probability fixture + partitioning invariance") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x y"), (2L, "x y"), (3L, "x y"), (4L, "x z"),
      (5L, "q")) // under 2 tokens → dropped
      .toDF("doc_id", "text")
    // contexts: x starts 4 bigrams; c2(x y)=3, c2(x z)=1
    val scores = TextAnalysis.lmScore(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(scores.length == 4) // doc 5 dropped
    val byId = scores.map(t => t._1 -> ((t._2, t._3))).toMap
    assert(byId(1L) == ((1L, 0.75)) && byId(2L) == ((1L, 0.75)) && byId(3L) == ((1L, 0.75)))
    assert(byId(4L) == ((1L, 0.25)))
    val rep = TextAnalysis.lmScore(docs.repartition(7), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rep == scores.toSet)
  }

  test("hardNegatives: rank window + margin vs the window formulation") {
    val q = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val got = Similarity.hardNegatives(q, "qid", "qv", e, "vec_id", "embedding", 4, 20, 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(got.nonEmpty)
    val full = Similarity.knnJoin(q, "qid", "qv", e, "vec_id", "embedding", 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    val best = full.filter(_._3 == 1).map(t => t._1 -> t._4).toMap
    val expected = full.filter(t => t._3 >= 4 && t._4 <= best(t._1) * 0.95).toSet
    assert(got.toSet == expected)
  }

  test("spliceRepeatedSpans: cuts cross-doc spans, keeps unique tails and clean docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h uniqueone uniquetwo"), // shared 8-span + tail
      (2L, "a b c d e f g h"),                     // exactly the shared span
      (3L, "hello world"))                         // clean, under n tokens
      .toDF("doc_id", "text")
    val out = Dedup.spliceRepeatedSpans(docs, "doc_id", "text", 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    val tids = docs.select(col("doc_id"), graft.functions.Kernel.tokenIds(col("text")))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    // only window pos 0 is cross-doc (doc 1's pos 1/2 windows include the
    // unique tail), so exactly tokens [0, 8) are cut from both docs
    assert(out(1L) == tids(1L).drop(8))
    assert(out(2L).isEmpty)
    assert(out(3L) == tids(3L))
  }

  test("spliceDupSpansKeepFirst: first occurrence survives, later copies cut, within-doc repeats too") {
    import spark.implicits._
    val span = "a b c d e f g h"
    val docs = Seq(
      (1L, s"$span uniqueone uniquetwo"),  // FIRST occurrence (min doc id) — survives
      (2L, span),                          // later cross-doc copy — cut entirely
      (3L, s"$span $span"),                // within-doc repeat of an already-seen span
      (4L, "hello world"))                 // clean
      .toDF("doc_id", "text")
    val out = Dedup.spliceDupSpansKeepFirst(docs, "doc_id", "text", 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    val tids = docs.select(col("doc_id"), graft.functions.Kernel.tokenIds(col("text")))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    assert(out(1L) == tids(1L)) // keep-first: doc 1 is UNTOUCHED (q67 would cut it)
    assert(out(2L).isEmpty)
    assert(out(4L) == tids(4L))
    // doc 3: every window covering a duplicated span beyond the first
    // occurrence is cut; the straddling windows are duplicated NOWHERE
    // (they include the seam), so only the aligned copies' positions go —
    // both aligned copies are non-first (doc 1 holds the first), so the
    // whole doc is covered
    assert(out(3L).isEmpty)
    // and a within-doc-ONLY repeat keeps its first copy
    val solo = Seq((7L, s"$span $span")).toDF("doc_id", "text")
    val out2 = Dedup.spliceDupSpansKeepFirst(solo, "doc_id", "text", 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    val tids2 = solo.select(col("doc_id"), graft.functions.Kernel.tokenIds(col("text")))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    // positions 0..7 survive (first occurrence); 8..15 cut; the seam
    // windows (starts 1..7) occur once each and cut nothing
    assert(out2(7L) == tids2(7L).take(8))
  }

  test("qualityOlsFit: partitioning-invariant coefficients; outliers rank by |residual|") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = graft.operators.TextAnalysis.qualityOlsFit(d, "doc_id", "text").collect()(0)
    val b = graft.operators.TextAnalysis.qualityOlsFit(d.repartition(7), "doc_id", "text")
      .collect()(0)
    // exact-integer moments → bit-identical doubles under any partitioning
    assert(a.getLong(0) == b.getLong(0) && a.getLong(0) > 0)
    (1 to 3).foreach(i => assert(a.getDouble(i) == b.getDouble(i)))
    val out = graft.operators.TextAnalysis.qualityOlsOutliers(d, "doc_id", "text", k = 10)
      .collect()
    assert(out.length == 10)
    val res = out.map(r => math.abs(r.getDouble(5)))
    assert(res.zip(res.tail).forall { case (x, y) => x >= y }) // ranked desc
    // residual really is y - (b0 + b1 w + b2 s) under the fitted betas
    out.foreach { r =>
      val pred = a.getDouble(1) + a.getDouble(2) * r.getLong(1) + a.getDouble(3) * r.getLong(2)
      assert(math.abs(r.getDouble(4) - pred) < 1e-9)
    }
  }

  test("mixtureWeights: sqrt-damped fixture") {
    import spark.implicits._
    val df = (Seq.fill(4)("a") ++ Seq.fill(1)("b")).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "source")
    val got = Sampling.mixtureWeights(df, "source")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sortBy(_._1)
    // z = √4 + √1 = 3; weights 2/3 and 1/3; targets floor(5·w)
    assert(got.map(t => (t._1, t._2, t._4)).toSeq ==
      Seq(("a", 4L, 3L), ("b", 1L, 1L)))
    assert(math.abs(got(0)._3 - 2.0 / 3.0) < 1e-15)
    assert(math.abs(got(1)._3 - 1.0 / 3.0) < 1e-15)
    // weights sum to 1 exactly-ish; targets never exceed the corpus
    assert(got.map(_._4).sum <= 5L)
  }

  test("SpliceSpans: native two-pointer sweep ≡ exists-HOF, incl. pathological docs") {
    import spark.implicits._
    val bridge = org.apache.spark.sql.graftbridge.Bridge
    val n = 8
    // fixtures: empty starts, single cut, overlapping windows, a gap,
    // and the pathological all-flagged doc (every window start flagged —
    // the case where the HOF goes O(tokens²))
    val rows = Seq(
      (1L, (0L until 20L).toArray, Array.empty[Long]),
      (2L, (0L until 20L).toArray, Array(0L)),
      (3L, (0L until 20L).toArray, Array(0L, 3L, 5L)),
      (4L, (0L until 30L).toArray, Array(2L, 20L)),
      (5L, (0L until 200L).toArray, (0L to 192L).toArray), // all flagged
      (6L, (0L until 10L).toArray, Array(2L))              // covers past end
    ).toDF("id", "tids", "starts")
    val native = bridge.column(graft.functions.SpliceSpans(
      bridge.expression(col("tids")), bridge.expression(col("starts")), n))
    val got = rows
      .select(col("id"), native.as("nat"),
        Dedup.spliceSpansHof(col("tids"), col("starts"), n).as("hof"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"id=${r.getLong(0)}")
    }
    // the all-flagged doc cuts to nothing; the gap doc cuts [2,10)∪[20,28)
    val byId = got.map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    assert(byId(5L).isEmpty)
    assert(byId(4L) ==
      ((0L until 2L) ++ (10L until 20L) ++ (28L until 30L)).toList)
  }

  test("spliceSpans kernel: empty starts returns a FRESH array, never the input") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    // the input ArrayData may alias a reused UnsafeRow buffer — returning
    // it unchanged would hand mutable memory downstream
    val in = new GenericArrayData(Array(1L, 2L, 3L))
    val out = graft.functions.VectorKernels.spliceSpans(
      in, new GenericArrayData(Array.emptyLongArray), 8)
    assert(out ne in)
    assert(out.toLongArray().toSeq == Seq(1L, 2L, 3L))
  }

  test("spliceSpans kernel: unsorted starts fail fast instead of under-splicing") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val in = new GenericArrayData((0L until 20L).toArray)
    val ex = intercept[IllegalArgumentException] {
      graft.functions.VectorKernels.spliceSpans(
        in, new GenericArrayData(Array(5L, 2L)), 4)
    }
    assert(ex.getMessage.contains("sorted"))
  }
}
