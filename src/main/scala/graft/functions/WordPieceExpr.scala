package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.catalyst.util.GenericArrayData

import graft.model.WordPieceModel

/** Real-vocab tokenization: normalize → words (the identical per-char
  * state machine as [[TokenIdsKernel]], so the word stream equals the
  * hashing tokenizer's) → greedy longest-match WordPiece per word →
  * `[CLS] pieces… [SEP]` (graft.model.WordPiece scaladoc for the HF
  * semantics and the reference citation). The model ships as a plan
  * reference object — vocab-sized, like [[NearestCell]]'s bank.
  *
  * Generates code (no CodegenFallback): one static-shaped call per row,
  * the call site stays inside WholeStageCodegen. */
case class WordPieceIds(child: Expression, model: WordPieceModel)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.Bridge.AbstractType] = Seq(StringType)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    evalRow(input.asInstanceOf[UTF8String])

  def evalRow(input: UTF8String): GenericArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    out += model.clsId
    WordStream.foreachWord(input.toString,
      w => model.tokenizeWord(w).foreach(out += _))
    out += model.sepId
    new GenericArrayData(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordPiece", this, classOf[WordPieceIds].getName)
    defineCodeGen(ctx, ev, c => s"$ref.evalRow($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): WordPieceIds =
    copy(child = newChild)
}
