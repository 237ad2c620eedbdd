package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Serializable handle to a (cellId, centroid) bank consumed by the
  * quantizer expressions. Two wire forms:
  *
  *  - [[InlineBank]] rides in the expression tree — right for banks of a
  *    few hundred cells (specs, probes over small indexes).
  *  - [[BroadcastBank]] holds only a torrent-broadcast handle, so the
  *    serialized plan and every task binary stay O(1) in nCells — the
  *    100 TB shape: a 65k-cell × 384-dim coarse quantizer is ~200 MB
  *    that must ship once per executor, never once per task and never
  *    as a Catalyst literal the analyzer walks per rule.
  *
  * Both forms hold the same data, so every expression below is
  * value-identical (and oracle-identical) under either. */
sealed trait CentroidBank extends Serializable {
  def cells: Array[Long]
  def vecs: Array[Array[Double]]
}

final case class InlineBank(cells: Array[Long], vecs: Array[Array[Double]])
    extends CentroidBank

final class BroadcastBank(
    val handle: Broadcast[(Array[Long], Array[Array[Double]])])
    extends CentroidBank {
  @transient private lazy val v = handle.value
  override def cells: Array[Long] = v._1
  override def vecs: Array[Array[Double]] = v._2
}

object CentroidBank {
  /** Threshold (total double count) above which a bank broadcasts. */
  private val InlineMax = 4096

  def of(spark: SparkSession, cents: Array[(Long, Array[Double])]): CentroidBank = {
    val cells = cents.map(_._1)
    val vecs = cents.map(_._2)
    if (vecs.length == 0 || vecs.length.toLong * vecs(0).length <= InlineMax)
      InlineBank(cells, vecs)
    else new BroadcastBank(spark.sparkContext.broadcast((cells, vecs)))
  }
}

/** Handle to per-subspace PQ codebooks (m books × k centroids × sub dims);
  * same inline/broadcast split as [[CentroidBank]]. */
sealed trait CodebookBank extends Serializable {
  def books: Array[Array[Array[Double]]]
}

final case class InlineBooks(books: Array[Array[Array[Double]]])
    extends CodebookBank

final class BroadcastBooks(val handle: Broadcast[Array[Array[Array[Double]]]])
    extends CodebookBank {
  @transient private lazy val v = handle.value
  override def books: Array[Array[Array[Double]]] = v
}

object CodebookBank {
  private val InlineMax = 4096

  def of(spark: SparkSession, books: Array[Array[Array[Double]]]): CodebookBank = {
    // Fail FAST at bank construction: an empty subspace book would make
    // [[PqEncode]] emit code -1 and [[AdcDist]] throw an opaque
    // ArrayIndexOutOfBoundsException at search time, long after the
    // mistake (usually a bad m/k split) was made.
    books.zipWithIndex.foreach { case (book, j) =>
      require(book.nonEmpty,
        s"PQ codebook subspace $j is empty: every subspace needs >= 1 centroid " +
          s"(got ${books.length} subspaces; check the m/k split)")
    }
    val n = books.length.toLong *
      (if (books.length == 0) 0 else books(0).length.toLong * books(0)(0).length)
    if (n <= InlineMax) InlineBooks(books)
    else new BroadcastBooks(spark.sparkContext.broadcast(books))
  }
}

private[functions] object BankKernels {
  /** In-order squared-L2 fold between a row vector (starting at `off`)
    * and a centroid — the exact double arithmetic of the HOF
    * `aggregate(zip_with(...))` leg it replaces (left fold from 0.0 in
    * dim order), so results are bit-identical under the SQL oracle. */
  def l2To(v: ArrayData, isFloat: Boolean, off: Int, n: Int,
           cent: Array[Double]): Double = {
    val m = math.min(n, cent.length)
    var d = 0.0
    var i = 0
    while (i < m) {
      val x = (if (isFloat) v.getFloat(off + i).toDouble else v.getDouble(off + i)) - cent(i)
      d += x * x
      i += 1
    }
    d
  }
}

/** The `nProbe` nearest bank cells of the input vector, ordered by
  * (squared-L2 distance asc, cell id asc) — the IVF query-side probe
  * list as ONE native expression over the bank, replacing a
  * `transform(<literal centroid array>, ...) → array_sort → slice` chain
  * whose plan grew O(nCells·dim). Selection order matches the
  * `array_sort(struct(d, cell))` it replaces exactly (same fold
  * arithmetic per distance, same (d, cell) tiebreak). */
case class ProbeCells(child: Expression, bank: CentroidBank, nProbe: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private lazy val elemIsFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    evalVec(input.asInstanceOf[ArrayData])

  def evalVec(v: ArrayData): ArrayData = {
    val cells = bank.cells
    val vecs = bank.vecs
    val n = v.numElements()
    val nc = cells.length
    val ds = new Array[Double](nc)
    val idx = new Array[Integer](nc)
    var c = 0
    while (c < nc) {
      ds(c) = BankKernels.l2To(v, elemIsFloat, 0, n, vecs(c))
      idx(c) = c
      c += 1
    }
    java.util.Arrays.sort(idx, (a: Integer, b: Integer) => {
      val cmp = java.lang.Double.compare(ds(a), ds(b))
      if (cmp != 0) cmp else java.lang.Long.compare(cells(a), cells(b))
    })
    val k = math.min(nProbe, nc)
    val out = new Array[Long](k)
    var i = 0
    while (i < k) { out(i) = cells(idx(i)); i += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("probeCells", this, classOf[ProbeCells].getName)
    defineCodeGen(ctx, ev, c => s"$ref.evalVec($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): ProbeCells =
    copy(child = newChild)
}

/** All `m` per-subspace PQ codes of the input vector in one pass — the
  * corpus-side PQ encoder. Per subspace j, the code is the argmin
  * (strict <, ties → lowest index) squared-L2 centroid of book j against
  * dims [j·sub, (j+1)·sub) — identical semantics to the m
  * `NearestCell(slice(vec, ...))` columns it replaces, without the m
  * per-row slice allocations and with the books living in ONE bank
  * handle instead of m plan-embedded arrays. */
case class PqEncode(child: Expression, bank: CodebookBank)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private lazy val elemIsFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    evalVec(input.asInstanceOf[ArrayData])

  def evalVec(v: ArrayData): ArrayData = {
    val books = bank.books
    val m = books.length
    val out = new Array[Long](m)
    var j = 0
    var off = 0
    while (j < m) {
      val book = books(j)
      val sub = if (book.length == 0) 0 else book(0).length
      val remain = math.max(v.numElements() - off, 0)
      var best = -1L
      var bestD = Double.MaxValue
      var c = 0
      while (c < book.length) {
        val d = BankKernels.l2To(v, elemIsFloat, off, math.min(sub, remain), book(c))
        if (d < bestD) { bestD = d; best = c.toLong }
        c += 1
      }
      out(j) = best
      off += sub
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncode", this, classOf[PqEncode].getName)
    defineCodeGen(ctx, ev, c => s"$ref.evalVec($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** The coarse residual `vec − centroid[cell]` as array<double> — the
  * vector a RESIDUAL-encoded IVF-PQ quantizes and queries with (the
  * standard Jégou et al. 2011 formulation: within a cell only the
  * residual energy remains for PQ to resolve, so the same m codes buy
  * more ordering than quantizing the raw vector). Cell ids resolve by
  * binary search over the bank's sorted cells; composes with
  * [[PqEncode]] / [[AdcDist]] unchanged (both accept double arrays). */
case class ResidualVec(left: Expression, right: Expression, bank: CentroidBank)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  private lazy val elemIsFloat =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any, cell: Any): Any =
    evalPair(v.asInstanceOf[ArrayData], cell.asInstanceOf[Long])

  def evalPair(v: ArrayData, cell: Long): ArrayData = {
    val i = java.util.Arrays.binarySearch(bank.cells, cell)
    require(i >= 0, s"cell $cell not in the centroid bank")
    val cent = bank.vecs(i)
    val n = v.numElements()
    // fail loudly on a dimension mismatch (wrong column, corrupt row):
    // a silently truncated residual yields plausible-but-wrong distances
    require(n == cent.length,
      s"ResidualVec dimension mismatch: vector has $n elements, centroid ${cent.length}")
    val out = new Array[Double](n)
    var d = 0
    while (d < n) {
      out(d) = (if (elemIsFloat) v.getFloat(d).toDouble else v.getDouble(d)) - cent(d)
      d += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("residualVec", this, classOf[ResidualVec].getName)
    defineCodeGen(ctx, ev, (a, b) => s"$ref.evalPair($a, $b)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): ResidualVec =
    copy(left = newLeft, right = newRight)
}

/** Asymmetric PQ distance Σ_j ‖q_sub_j − book_j[code_j]‖² between a
  * full-precision query vector (left) and a corpus code row (right,
  * array<bigint> of length m) — the ADC search kernel over the bank,
  * replacing a per-subspace `element_at(<literal book>, code+1)` chain.
  * Accumulation order matches the HOF formulation exactly: each
  * subspace's l2 folds from 0.0 in dim order, subspace sums add
  * left-associatively in subspace order. */
case class AdcDist(left: Expression, right: Expression, bank: CodebookBank)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private lazy val elemIsFloat =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(q: Any, codes: Any): Any =
    evalPair(q.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData])

  def evalPair(q: ArrayData, codes: ArrayData): Double = {
    val books = bank.books
    val m = math.min(books.length, codes.numElements())
    var tot = 0.0
    var j = 0
    var off = 0
    while (j < m) {
      val book = books(j)
      val sub = if (book.length == 0) 0 else book(0).length
      val code = codes.getLong(j).toInt
      val cent = book(code)
      val remain = math.max(q.numElements() - off, 0)
      tot += BankKernels.l2To(q, elemIsFloat, off, math.min(sub, remain), cent)
      off += sub
      j += 1
    }
    tot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("adcDist", this, classOf[AdcDist].getName)
    defineCodeGen(ctx, ev, (a, b) => s"$ref.evalPair($a, $b)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): AdcDist =
    copy(left = newLeft, right = newRight)
}
