package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import graft.functions.{AdcDist, CentroidBank, CodebookBank, PqEncode, ProbeCells}
import graft.operators.Similarity

/** The broadcast-backed centroid/codebook banks must be value-identical
  * to the plan-literal HOF formulations they replaced (the oracle
  * continuity guarantee), and must keep the plan O(1) in nCells (the
  * 100 TB guarantee: a 65k-cell quantizer can't ride in the Catalyst
  * tree). */
class BankSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private lazy val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  private lazy val q = e.filter(col("vec_id") < 8)
    .select(col("vec_id").as("qid"), col("embedding").as("qv"))

  private def firstK(k: Int): Array[(Long, Array[Double])] =
    e.filter(col("vec_id") < k)
      .select(col("vec_id").cast("long"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Any](1).map {
        case f: Float => f.toDouble
        case d: Double => d
      }.toArray))
      .sortBy(_._1)

  test("ProbeCells == literal sort-slice HOF probes, bit for bit") {
    val cents = firstK(16)
    val centLit = array(cents.map { case (id, v) =>
      struct(lit(id).as("cell"), lit(v).as("cvec"))
    }: _*)
    val hof = transform(
      slice(array_sort(transform(centLit, c =>
        struct(Similarity.l2sq(col("qv"), c("cvec")).as("d"), c("cell").as("cell")))),
        1, 4),
      s => s("cell"))
    val bank = CentroidBank.of(spark, cents)
    val native = Bridge.column(ProbeCells(Bridge.expression(col("qv")), bank, 4))
    val cmp = q.select(col("qid"), hof.as("h"), native.as("n"))
      .collect()
    assert(cmp.nonEmpty)
    cmp.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"qid=${r.get(0)}")
    }
  }

  test("PqEncode + AdcDist == literal per-subspace HOF, bit for bit") {
    val m = 8
    val cb = Similarity.pqCodebook(e, "vec_id", "embedding", 16)
    val sub = cb.head.length / m
    val books = Array.tabulate(m)(j =>
      cb.map(c => java.util.Arrays.copyOfRange(c, j * sub, (j + 1) * sub)))

    // HOF encode: m NearestCell-equivalent argmins over slices
    val hofCodes = array(books.zipWithIndex.map { case (book, j) =>
      Bridge.column(graft.functions.NearestCell(
        Bridge.expression(slice(col("embedding"), j * sub + 1, sub)),
        Array.tabulate(book.length)(_.toLong), book))
    }: _*)
    val bank = CodebookBank.of(spark, books)
    val nativeCodes = Bridge.column(PqEncode(Bridge.expression(col("embedding")), bank))
    val enc = e.select(col("vec_id"), hofCodes.as("h"), nativeCodes.as("n")).collect()
    enc.foreach(r => assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"id=${r.get(0)}"))

    // HOF ADC distance: per-subspace literal book lookups, left-assoc sum
    val hofDist = books.zipWithIndex.map { case (book, j) =>
      val subCentLit = array(book.map(lit(_)): _*)
      Similarity.l2sq(slice(col("qv"), j * sub + 1, sub),
        element_at(subCentLit, element_at(col("codes"), j + 1).cast("int") + 1))
    }.reduce(_ + _)
    val codes = e.select(col("vec_id"), nativeCodes.as("codes"))
    val joined = codes.crossJoin(broadcast(q))
    val nativeDist = Bridge.column(AdcDist(
      Bridge.expression(col("qv")), Bridge.expression(col("codes")), bank))
    val cmp = joined.select(hofDist.as("h"), nativeDist.as("n"))
      .filter(col("h") =!= col("n"))
    assert(cmp.count() == 0)
  }

  test("plan size is O(1) in nCells: 16 vs 512 cells within 2x") {
    def planLen(nCells: Int): Int =
      Similarity.ivfFlatWith(q, "qid", "qv", e, "vec_id", "embedding",
        firstK(nCells), nProbe = 4, k = 5)
        .queryExecution.optimizedPlan.treeString.length
    val small = planLen(16)
    val big = planLen(512) // 512×64 doubles — far beyond the inline cap
    assert(big < small * 2,
      s"plan grew with nCells: $small chars @16 cells vs $big @512")
  }

  test("large banks broadcast, small banks inline") {
    assert(CentroidBank.of(spark, firstK(16)).isInstanceOf[graft.functions.InlineBank])
    assert(!CentroidBank.of(spark, firstK(512)).isInstanceOf[graft.functions.InlineBank])
  }

  test("CodebookBank.of rejects an empty subspace book at construction") {
    // an empty book would surface as PqEncode code -1 and an opaque
    // AIOOBE inside AdcDist at search time — fail at build instead
    val books: Array[Array[Array[Double]]] =
      Array(Array(Array(1.0, 2.0)), Array.empty[Array[Double]])
    val ex = intercept[IllegalArgumentException] {
      CodebookBank.of(spark, books)
    }
    assert(ex.getMessage.contains("subspace 1"))
  }

  test("VecSumAgg: 65k cells aggregate to k ROWS of array sums (the scale shape)") {
    // the k-means update at the advertised 65k-cell scale: the driver
    // must see k rows of (sums: array<long>, ns: array<long>) — never
    // k×dim rows. 4 rows per cell, dim 16, exact integer sums.
    val dim = 16
    val nCells = 65536L
    val df = spark.range(0, nCells * 4)
      .select((col("id") % nCells).as("cell"),
        transform(sequence(lit(0), lit(dim - 1)),
          d => (col("id") % 1000L + d).cast("double") / 100.0).as("vec"))
    val rows = df.groupBy(col("cell"))
      .agg(graft.functions.VecSumAgg.vecSum(col("vec"), 1000000L).as("sn"))
      .select(col("cell"), col("sn.sums"), col("sn.ns"))
      .collect()
    assert(rows.length == nCells.toInt)
    val byCell = rows.map(r =>
      r.getLong(0) -> (r.getSeq[Long](1).toArray, r.getSeq[Long](2).toArray)).toMap
    // spot-check cell 7: its 4 member rows are ids {7, 65543, 131079, 196615},
    // all ≡ id%1000 known; sums must equal the direct quantized fold
    val ids = Seq(7L, 65543L, 131079L, 196615L)
    val (sums, ns) = byCell(7L)
    assert(ns.toSeq == Seq.fill(dim)(4L))
    (0 until dim).foreach { d =>
      val expect = ids.map(i => math.floor(((i % 1000L) + d).toDouble / 100.0 * 1000000L + 0.5).toLong).sum
      assert(sums(d) == expect, s"dim $d")
    }
  }

  test("VecSumAgg survives the ObjectHashAggregate sort-based fallback") {
    // TypedImperativeAggregate runs as ObjectHashAggregate; past the
    // in-memory group cap it falls back to sort-based aggregation —
    // executor-memory boundedness is this operator's scale claim, so pin
    // that the fallback path (serialize → sort → merge) produces the
    // identical exact sums. Threshold 4 forces the fallback immediately.
    val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "4")
    try {
      val dim = 8
      val nGroups = 2048L
      val df = spark.range(0, nGroups * 3)
        .select((col("id") % nGroups).as("g"), col("id"),
          transform(sequence(lit(0), lit(dim - 1)),
            d => (col("id") + d).cast("double") / 10.0).as("vec"))
      val agg = df.groupBy(col("g"))
        .agg(graft.functions.VecSumAgg.vecSum(col("vec"), 1000L).as("sn"))
        .select(col("g"), col("sn.sums"), col("sn.ns"))
      assert(agg.queryExecution.executedPlan.toString.contains("ObjectHashAggregate"),
        "VecSumAgg must plan as ObjectHashAggregate")
      val rows = agg.collect()
      assert(rows.length == nGroups.toInt)
      val byG = rows.map(r =>
        r.getLong(0) -> (r.getSeq[Long](1).toArray, r.getSeq[Long](2).toArray)).toMap
      // group 5's members are ids {5, 2053, 4101}: exact quantized folds
      val ids = Seq(5L, 2053L, 4101L)
      val (sums, ns) = byG(5L)
      assert(ns.toSeq == Seq.fill(dim)(3L))
      (0 until dim).foreach { d =>
        val expect = ids.map(i =>
          math.floor((i + d).toDouble / 10.0 * 1000L + 0.5).toLong).sum
        assert(sums(d) == expect, s"dim $d")
      }
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("trainKmeans ≡ the exploded per-(cell,dim) formulation it replaced") {
    val got = Similarity.trainKmeans(e, "vec_id", "embedding", k = 8, iterations = 2)
    // reference impl: the round-6 posexplode → groupBy(cell, dim) shape
    var cents = firstK(8)
    val S = 1000000L
    for (_ <- 1 to 2) {
      val bank = CentroidBank.of(spark, cents)
      val sums = e.withColumn("__cell", Bridge.column(graft.functions.NearestCell(
          Bridge.expression(col("embedding")), bank)))
        .select(col("__cell"), posexplode(col("embedding")).as(Seq("__d", "__v")))
        .groupBy(col("__cell"), col("__d"))
        .agg(sum(floor(col("__v").cast("double") * lit(S.toDouble) + lit(0.5))
          .cast("long")).as("__s"), count(lit(1)).as("__n"))
        .collect()
        .map(r => ((r.getLong(0), r.getInt(1)), (r.getLong(2), r.getLong(3))))
        .toMap
      cents = cents.map { case (cellId, oldVec) =>
        val nv = oldVec.clone()
        var d = 0
        while (d < nv.length) {
          sums.get((cellId, d)).foreach { case (s, n) =>
            nv(d) = s.toDouble / (n * S).toDouble
          }
          d += 1
        }
        (cellId, nv)
      }
    }
    assert(got.map(_._1).toSeq == cents.map(_._1).toSeq)
    got.zip(cents).foreach { case ((_, a), (_, b)) =>
      assert(java.util.Arrays.equals(a, b))
    }
  }

  test("trainKmeans exercises the broadcast-bank path and destroys superseded banks") {
    // 512 cells × 64 dims is far beyond the inline cap, so every
    // iteration builds a BroadcastBank; training must complete with the
    // per-iteration destroy in place (a destroyed-too-early bank would
    // fail the NEXT iteration's assignment pass)
    // the sf0.001 fixture holds 500 vectors, so the first-k init yields
    // min(512, |corpus|) cells — still 500×64 doubles, beyond the inline cap
    val expected = math.min(512L, e.count()).toInt
    val cents = Similarity.trainKmeans(e, "vec_id", "embedding", k = 512, iterations = 2)
    assert(cents.length == expected)
    assert(cents.forall(_._2.length == 64))
  }
}
