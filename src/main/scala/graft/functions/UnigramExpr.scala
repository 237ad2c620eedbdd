package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.catalyst.util.GenericArrayData

import graft.model.UnigramModel

/** Real-vocab Unigram (SentencePiece) tokenization: normalize → words
  * (the identical per-char state machine as [[TokenIdsKernel]]/
  * [[WordPieceIds]]/[[BpeIds]]) → exact-int64 Viterbi max-likelihood
  * segmentation per word (graft.model.Unigram scaladoc for the HF
  * semantics, tie rule, and reference citation) → `<s> … </s>` (the
  * XLM-R template). The model ships as a plan reference object.
  *
  * Generates code (no CodegenFallback): one static-shaped call per
  * row, the call site stays inside WholeStageCodegen. */
case class UnigramIds(child: Expression, model: UnigramModel)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.Bridge.AbstractType] = Seq(StringType)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    evalRow(input.asInstanceOf[UTF8String])

  def evalRow(input: UTF8String): GenericArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    out += model.bosId
    WordStream.foreachWord(input.toString,
      w => model.tokenizeWord(w).foreach(out += _))
    out += model.eosId
    new GenericArrayData(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigram", this, classOf[UnigramIds].getName)
    defineCodeGen(ctx, ev, c => s"$ref.evalRow($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramIds =
    copy(child = newChild)
}

/** Viterbi piece ids of ONE already-normalized word — no word-stream
  * normalization, no `<s>`/`</s>` template. The E-step kernel of
  * [[graft.operators.UnigramTrain]]: the trainer's expected-count pass
  * runs this over the (word, cnt) table, so the per-word segmentation
  * semantics (packed-key tie rule included) are EXACTLY
  * [[graft.model.UnigramModel.tokenizeWord]]'s — the same machinery the
  * finished model serves with. Codegen like [[UnigramIds]]. */
case class UnigramWordIds(child: Expression, model: UnigramModel)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.Bridge.AbstractType] = Seq(StringType)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    evalRow(input.asInstanceOf[UTF8String])

  def evalRow(input: UTF8String): GenericArrayData =
    new GenericArrayData(model.tokenizeWord(input.toString).toArray)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramw", this, classOf[UnigramWordIds].getName)
    defineCodeGen(ctx, ev, c => s"$ref.evalRow($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramWordIds =
    copy(child = newChild)
}
