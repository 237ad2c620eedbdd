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
}
