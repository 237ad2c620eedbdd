package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native tokenize + polynomial-hash expression — the hot inner loop of
  * every text operator, as one imperative pass over the string instead of
  * the interpreted HOF chain (split → per-char ascii → fold), which
  * profiled ~100× slower per row.
  *
  * Semantics are EXACTLY
  * `transform(slice(filter(split(regexp_replace(lower(text),'[^a-z0-9 ]',' '),'\\s+'), t -> t != ''), 1, maxLen), polyHash)`
  * for any input: a char survives iff its (string) lowercase lands in
  * [a-z0-9]; everything else acts as a separator. For non-ASCII chars
  * that means `Character.toLowerCase` (e.g. Kelvin U+212A → 'k' joins
  * the token), with the single one-to-many lowercase mapping U+0130
  * ('İ' → "i" + combining dot) special-cased: it contributes 'i' and the
  * combining dot then terminates the token, exactly as lower()+regexp
  * does. Each token folds (acc*31 + char) % M over its chars. The HOF
  * formulation stays in [[Kernel.tokenIdsHof]] and a spec asserts
  * bit-equality between the two, including on non-ASCII fixtures.
  */
case class TokenIds(child: Expression, maxLen: Int) extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.length
    val out = new Array[Long](math.min(maxLen, n / 2 + 1))
    var count = 0
    var acc = 0L
    var inTok = false
    var i = 0
    while (i < n && count < maxLen) {
      val c = s.charAt(i)
      // lc: the char's contribution if its lowercase is in [a-z0-9];
      // -1 = separator; -2 = contribute 'i' THEN separate (U+0130 only:
      // its string lowercase is "i" + U+0307, and the combining dot
      // separates)
      val lc: Int =
        if (c >= 'a' && c <= 'z' || c >= '0' && c <= '9') c.toInt
        else if (c >= 'A' && c <= 'Z') c.toInt + 32
        else if (c < 128) -1
        else if (c == 'İ') -2
        else {
          val l = Character.toLowerCase(c)
          if (l >= 'a' && l <= 'z' || l >= '0' && l <= '9') l.toInt else -1
        }
      if (lc >= 0) {
        acc = (acc * 31L + lc.toLong) % K.M
        inTok = true
      } else if (lc == -2) {
        acc = (acc * 31L + 'i'.toLong) % K.M
        out(count) = acc; count += 1
        acc = 0L; inTok = false
      } else if (inTok) {
        out(count) = acc; count += 1
        acc = 0L; inTok = false
      }
      i += 1
    }
    if (inTok && count < maxLen) { out(count) = acc; count += 1 }
    val trimmed = new Array[Long](count)
    System.arraycopy(out, 0, trimmed, 0, count)
    new GenericArrayData(trimmed)
  }

  override protected def withNewChildInternal(newChild: Expression): TokenIds =
    copy(child = newChild)
}
