package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One greedy-left pass applying a BATCH of symbol merges — the native
  * form of [[graft.operators.TokenizerTrain]]'s `applyMergeBatch`
  * Catalyst fold, with the batch shipped as a PLAN REFERENCE OBJECT
  * instead of literal maps. Semantics are identical by construction
  * (same single lookup per position: if the accumulator's last symbol
  * has a rule whose expected right equals the incoming symbol, coalesce;
  * sound only for the R1–R3 batches the batched trainer accepts — the
  * spec pins list-equality with the sequential trainer to exhaustion,
  * q162 hash-gates it against the oracle).
  *
  * Why an expression: the literal-map fold changes the generated source
  * every round (new literals), so EVERY training round pays whole-stage
  * codegen compilation — measured as the dominant share of the
  * ~1.3 s/round wall on a 96k-word table once the job count was cut to
  * one (TokTrainProbe). A reference object keeps the generated source
  * IDENTICAL across rounds (only `references[i]` contents change), so
  * the codegen cache hits and the per-element work drops to one hash
  * lookup with no per-step array copies. */
case class MergeBatchFold(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.Bridge.AbstractType] =
    Seq(ArrayType(StringType))

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  /** left symbol → (expected right, merged token). */
  @transient private lazy val rules: java.util.HashMap[UTF8String, Array[UTF8String]] = {
    val m = new java.util.HashMap[UTF8String, Array[UTF8String]](merges.size * 2)
    merges.foreach { case (l, r) =>
      m.put(UTF8String.fromString(l),
        Array(UTF8String.fromString(r), UTF8String.fromString(l + r)))
    }
    m
  }

  override def nullSafeEval(input: Any): Any =
    evalRow(input.asInstanceOf[ArrayData])

  def evalRow(input: ArrayData): GenericArrayData = {
    val n = input.numElements()
    val out = new Array[AnyRef](n)
    var m = 0
    var i = 0
    while (i < n) {
      val x = input.getUTF8String(i)
      var merged = false
      if (m > 0) {
        val rule = rules.get(out(m - 1).asInstanceOf[UTF8String])
        if (rule != null && rule(0).equals(x)) {
          out(m - 1) = rule(1)
          merged = true
        }
      }
      if (!merged) { out(m) = x; m += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mergeFold", this, classOf[MergeBatchFold].getName)
    defineCodeGen(ctx, ev, c => s"$ref.evalRow($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): MergeBatchFold =
    copy(child = newChild)
}
