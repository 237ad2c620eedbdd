package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

object MmrKernel {
  /** Greedy maximal-marginal-relevance selection over one query's
    * candidate set (parallel arrays sorted by id asc): pick
    * argmax λ·rel − (1−λ)·max_{s∈selected} cos(v, v_s), k times.
    * Stage 1's penalty term is literally (1−λ)·0.0 (kept in the
    * expression so the doubles match the SQL oracle bit-for-bit);
    * ties break to the earliest (lowest-id) candidate, matching
    * `row_number() ORDER BY score DESC, id ASC`. The pairwise cosine
    * is [[VectorKernels.cosine]] — the engine's one cosine. Returns
    * array<struct<id, score>> in selection order. */
  def select(ids: ArrayData, rels: ArrayData, vecs: ArrayData,
             k: Int, lambda: Double, vecFloat: Boolean): ArrayData = {
    val n = ids.numElements()
    val take = math.min(k, n)
    val chosen = new Array[Boolean](n)
    val maxSim = new Array[Double](n) // max cos to selected; valid after pick 1
    val out = new Array[Any](take)
    var step = 0
    while (step < take) {
      var bestI = -1
      var bestScore = 0.0
      var i = 0
      while (i < n) {
        if (!chosen(i)) {
          val pen = if (step == 0) 0.0 else maxSim(i)
          val s = lambda * rels.getDouble(i) - (1.0 - lambda) * pen
          // strict > keeps the earliest (lowest id) on equal scores
          if (bestI < 0 || s > bestScore) { bestI = i; bestScore = s }
        }
        i += 1
      }
      chosen(bestI) = true
      out(step) = InternalRow(ids.getLong(bestI), bestScore)
      val pv = vecs.getArray(bestI)
      var j = 0
      while (j < n) {
        if (!chosen(j)) {
          val c = VectorKernels.cosine(vecs.getArray(j), pv, vecFloat, vecFloat)
          if (step == 0 || c > maxSim(j)) maxSim(j) = c
        }
        j += 1
      }
      step += 1
    }
    new GenericArrayData(out)
  }
}

/** Native greedy MMR selection: `MmrSelect(ids, rels, vecs, k, λ)` →
  * array<struct<id bigint, score double>> of the k diversity-reranked
  * picks. A scalar expression over one query's (small) candidate
  * arrays — the per-query work is O(k·n·dim), all row-local, so the
  * operator above it stays narrow. */
case class MmrSelect(ids: Expression, rels: Expression, vecs: Expression,
                     k: Int, lambda: Double)
    extends TernaryExpression with ImplicitCastInputTypes {
  override def first: Expression = ids
  override def second: Expression = rels
  override def third: Expression = vecs

  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.Bridge.AbstractType] =
    Seq(GraftInputTypes.TokenArray, ArrayType(DoubleType), GraftInputTypes.MultiVecArray)

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)

  private lazy val vecFloat: Boolean =
    vecs.dataType.asInstanceOf[ArrayType].elementType
      .asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    MmrKernel.select(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      c.asInstanceOf[ArrayData], k, lambda, vecFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c) =>
      s"graft.functions.MmrKernel.select($a, $b, $c, $k, $lambda, $vecFloat)")

  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression): MmrSelect =
    copy(ids = a, rels = b, vecs = c)
}
