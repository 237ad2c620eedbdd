package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Coarse-quantizer assignment: the id of the bank centroid with minimal
  * squared-L2 distance to the input vector (strict < keeps the earliest
  * = lowest cell id on ties — identical semantics to the HOF fold it
  * replaces in [[graft.operators.Similarity.ivfFlat]] and to the oracle's
  * `ORDER BY dist, cell LIMIT 1`). One tight JVM loop per row — the
  * per-row hot path of an IVF index build over a 100 TB corpus. The
  * centroids live behind a [[CentroidBank]] handle, so a large bank
  * ships once per executor (torrent broadcast) instead of riding in the
  * serialized plan. */
case class NearestCell(child: Expression, bank: CentroidBank)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  private lazy val elemIsFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    evalVec(input.asInstanceOf[ArrayData])

  def evalVec(v: ArrayData): Long = {
    val cells = bank.cells
    val centroids = bank.vecs
    val n = v.numElements()
    var best = -1L
    var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val d = BankKernels.l2To(v, elemIsFloat, 0, n, centroids(c))
      if (d < bestD) { bestD = d; best = cells(c) }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCell", this, classOf[NearestCell].getName)
    defineCodeGen(ctx, ev, c => s"$ref.evalVec($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCell =
    copy(child = newChild)
}

object NearestCell {
  /** Inline-bank convenience for small centroid sets (specs, tiny banks). */
  def apply(child: Expression, cells: Array[Long],
            centroids: Array[Array[Double]]): NearestCell =
    NearestCell(child, InlineBank(cells, centroids))
}

/** [[NearestCell]]'s distance twin: the minimal squared-L2 distance
  * itself (a per-row residual-energy reading). min over a fixed bank is
  * order-free, so the value is bit-identical to the oracle's
  * `min(l2sq)` — the quantization-drift baseline/score path
  * ([[graft.operators.VectorIndex.meanCellDist]]) builds on it. */
case class NearestCellDist(child: Expression, bank: CentroidBank)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType

  private lazy val elemIsFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    evalVec(input.asInstanceOf[ArrayData])

  def evalVec(v: ArrayData): Double = {
    val centroids = bank.vecs
    val n = v.numElements()
    var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val d = BankKernels.l2To(v, elemIsFloat, 0, n, centroids(c))
      if (d < bestD) bestD = d
      c += 1
    }
    bestD
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCellDist", this,
      classOf[NearestCellDist].getName)
    defineCodeGen(ctx, ev, c => s"$ref.evalVec($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCellDist =
    copy(child = newChild)
}
