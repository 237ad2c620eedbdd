package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ImplicitCastInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

object SparsePairsKernel {
  /** token ids → sorted (token_id, score) pairs: score the occurrence at
    * each position, keep strictly-positive scores of tokens with
    * id > minIdExclusive (3 = BGE-M3 special-id skip; -1 = keep all),
    * merge duplicate tokens by MAX, indices ascending. Same double
    * arithmetic term-for-term as
    * [[graft.operators.SparseEmbedder.occurrenceScore]]:
    * ((t*A2 + p*B2 + C2) % M) / M * 2 - 1. */
  def eval(tids: ArrayData, minIdExclusive: Long): ArrayData = {
    val n = tids.numElements()
    // (token, score) candidates
    val toks = new Array[Long](n)
    val scores = new Array[Double](n)
    var m = 0
    var p = 0
    while (p < n) {
      val t = tids.getLong(p)
      if (t > minIdExclusive) {
        val s = ((t * K.A2 + p.toLong * K.B2 + K.C2) % K.M).toDouble / K.M.toDouble * 2.0 - 1.0
        if (s > 0.0) { toks(m) = t; scores(m) = s; m += 1 }
      }
      p += 1
    }
    // sort by token asc (score order within a token doesn't matter — we
    // take the max explicitly)
    val idx = (0 until m).sortBy(toks)(Ordering.Long).toArray
    val out = new Array[Any](m)
    var w = 0
    var i = 0
    while (i < m) {
      val t = toks(idx(i))
      var best = scores(idx(i))
      var j = i + 1
      while (j < m && toks(idx(j)) == t) {
        if (scores(idx(j)) > best) best = scores(idx(j))
        j += 1
      }
      out(w) = InternalRow(t, best)
      w += 1
      i = j
    }
    val trimmed = new Array[Any](w)
    System.arraycopy(out, 0, trimmed, 0, w)
    new GenericArrayData(trimmed)
  }
}

/** Native BGE-M3 sparse extraction over a token-id array: one JVM pass
  * instead of the per-row HOF sort+fold (whose array-concat accumulator
  * is quadratic and interpreted). Bit-identical to the HOF formulation in
  * [[graft.operators.Bgem3Embedder.sparsePairsHof]] and to the
  * relational explode→groupBy→max path (spec-asserted — all three share
  * the q28 oracle). */
case class SparsePairs(child: Expression, minIdExclusive: Long = 3L)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.Bridge.AbstractType] =
    Seq(ArrayType(LongType))

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("token_id", LongType, nullable = false),
      StructField("s", DoubleType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(input: Any): Any =
    SparsePairsKernel.eval(input.asInstanceOf[ArrayData], minIdExclusive)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SparsePairsKernel.eval($c, ${minIdExclusive}L)")

  override protected def withNewChildInternal(newChild: Expression): SparsePairs =
    copy(child = newChild)
}
