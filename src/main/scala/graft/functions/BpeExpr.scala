package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.catalyst.util.GenericArrayData

import graft.model.BpeModel

/** Real-vocab BPE tokenization: normalize → words (the identical
  * per-char state machine as [[TokenIdsKernel]]/[[WordPieceIds]], so
  * the word stream equals the hashing tokenizer's) → lowest-rank-first
  * merge loop per word (graft.model.Bpe scaladoc for the HF semantics
  * and the reference citation). No specials: a bare BPE model has no
  * post-processor. The model ships as a plan reference object.
  *
  * Generates code (no CodegenFallback): one static-shaped call per
  * row, the call site stays inside WholeStageCodegen. */
case class BpeIds(child: Expression, model: BpeModel)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.Bridge.AbstractType] = Seq(StringType)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    evalRow(input.asInstanceOf[UTF8String])

  def evalRow(input: UTF8String): GenericArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    WordStream.foreachWord(input.toString,
      w => model.tokenizeWord(w).foreach(out += _))
    new GenericArrayData(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpe", this, classOf[BpeIds].getName)
    defineCodeGen(ctx, ev, c => s"$ref.evalRow($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeIds =
    copy(child = newChild)
}
