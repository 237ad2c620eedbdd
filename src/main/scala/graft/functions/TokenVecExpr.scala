package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ImplicitCastInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

object TokenVecKernel {
  /** Unit-norm projector vector of (token id, position): identical
    * arithmetic term-for-term to the HOF formulation in
    * [[graft.operators.ColbertEmbedder.tokenVectorHof]] — key
    * tk = t + pos*(B2 % M); raw_d = ((tk*A + d*B + C) % M)/M*2-1;
    * out = raw / (sqrt(Σ raw², in d order) + eps). */
  def eval(t: Long, pos: Long, dim: Int): ArrayData = {
    val b2m = K.B2 % K.M
    val tk = t + pos * b2m
    val raw = new Array[Double](dim)
    var d = 0
    while (d < dim) {
      raw(d) = ((tk * K.A + d.toLong * K.B + K.C) % K.M).toDouble / K.M.toDouble * 2.0 - 1.0
      d += 1
    }
    var ss = 0.0
    var i = 0
    while (i < dim) { ss += raw(i) * raw(i); i += 1 }
    val nv = math.sqrt(ss) + K.Eps
    var j = 0
    while (j < dim) { raw(j) = raw(j) / nv; j += 1 }
    new GenericArrayData(raw)
  }

  def jaccard(a: ArrayData, b: ArrayData, aInt: Boolean, bInt: Boolean): Double = {
    @inline def get(x: ArrayData, i: Int, isInt: Boolean): Long =
      if (isInt) x.getInt(i).toLong else x.getLong(i)
    val sa = new java.util.HashSet[Long]()
    var i = 0
    val na = a.numElements()
    while (i < na) { sa.add(get(a, i, aInt)); i += 1 }
    val sb = new java.util.HashSet[Long]()
    i = 0
    val nb = b.numElements()
    while (i < nb) { sb.add(get(b, i, bInt)); i += 1 }
    var inter = 0L
    val it = sa.iterator()
    while (it.hasNext) { if (sb.contains(it.next())) inter += 1 }
    val union = sa.size.toLong + sb.size.toLong - inter
    if (union == 0L) 0.0 else inter.toDouble / union.toDouble
  }
}

/** Native ColBERT token vector — one JVM pass instead of the interpreted
  * transform + l2normalize chain (which re-evaluates the raw-vector
  * expression for the norm and the division). */
case class TokenVec(left: Expression, right: Expression, dim: Int)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(t: Any, pos: Any): Any = {
    def asLong(v: Any): Long = v match {
      case i: Int => i.toLong
      case l: Long => l
    }
    TokenVecKernel.eval(asLong(t), asLong(pos), dim)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, p) =>
      s"graft.functions.TokenVecKernel.eval($t, (long) $p, $dim)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): TokenVec =
    copy(left = l, right = r)
}

/** Native ColBERT MaxSim (late interaction): score(Q, D) =
  * Σ_{q∈Q} max_{d∈D} q·d over two `array<array<double>>` multi-vector
  * columns — the standard scoring for ColBERT-style token vectors
  * (public late-interaction retrieval construction). Outer sum runs in
  * Q order, inner max is comparison-exact, dot folds in dimension
  * order — all mirrored in the SQL oracle. Empty D → 0.0; null inner
  * vectors are skipped on both sides; float or double elements accepted
  * (float widens exactly, like [[CosineSim]]). */
case class MaxSim(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.Bridge.AbstractType] =
    Seq(GraftInputTypes.MultiVecArray, GraftInputTypes.MultiVecArray)

  override def dataType: DataType = DoubleType

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType
      .asInstanceOf[ArrayType].elementType == FloatType

  private lazy val leftFloat = elemIsFloat(left)
  private lazy val rightFloat = elemIsFloat(right)

  override def nullSafeEval(l: Any, r: Any): Any =
    score(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  @inline private def get(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  def score(qs: ArrayData, ds: ArrayData): Double = {
    val nq = qs.numElements()
    val nd = ds.numElements()
    var score = 0.0
    var qi = 0
    while (qi < nq) {
      val q = qs.getArray(qi)
      if (q != null) {
        val dim = q.numElements()
        var best = Double.NegativeInfinity
        var any = false
        var di = 0
        while (di < nd) {
          val d = ds.getArray(di)
          if (d != null) {
            val m = math.min(dim, d.numElements())
            var dot = 0.0
            var i = 0
            while (i < m) { dot += get(q, i, leftFloat) * get(d, i, rightFloat); i += 1 }
            if (dot > best) best = dot
            any = true
          }
          di += 1
        }
        if (any) score += best
      }
      qi += 1
    }
    score
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("maxSim", this, classOf[MaxSim].getName)
    defineCodeGen(ctx, ev, (a, b) => s"$ref.score($a, $b)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): MaxSim =
    copy(left = l, right = r)
}

/** Native token-set Jaccard |A∩B| / |A∪B| over two token-id arrays
  * (duplicates collapse; empty-union → 0.0) — the rerank scorer's hot
  * loop as hash-set counting instead of array_distinct +
  * array_intersect + array_union per row. Exact integer set sizes, so
  * it is bit-identical to the HOF/SQL formulation by construction. */
case class TokenSetJaccard(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.Bridge.AbstractType] =
    Seq(GraftInputTypes.IdArray, GraftInputTypes.IdArray)

  override def dataType: DataType = DoubleType

  // SQL users' default integer arrays are read as ints, not crashed on
  private def elemIsInt(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == IntegerType
  private lazy val leftInt = elemIsInt(left)
  private lazy val rightInt = elemIsInt(right)

  override def nullSafeEval(a: Any, b: Any): Any =
    TokenVecKernel.jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftInt, rightInt)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.TokenVecKernel.jaccard($a, $b, $leftInt, $rightInt)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): TokenSetJaccard =
    copy(left = l, right = r)
}
