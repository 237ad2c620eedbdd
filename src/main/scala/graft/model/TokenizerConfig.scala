package graft.model

import graft.functions.K

/** Tokenizer configuration surface (S7) — the analogue of the
  * reference's `load_tokenizer` parsing `tokenizer_config.json` +
  * `config.json` (/root/reference/src/common.rs:57-157):
  *
  *  - `model_max_length` caps truncation: effective max_length =
  *    min(user max_length, model_max_length) (common.rs:92-97; huge
  *    sentinel values like 1e30 mean "unbounded" and leave the user cap)
  *  - `pad_token_id` (config.json, default 0) and `pad_token` ride as
  *    metadata for backends that pad to batch-longest
  *  - special tokens collected for the skip-special sparse path
  *
  * The hashing tokenizer has no vocab files, so this is the whole config
  * surface a backend needs; an ONNX deployment would pair it with its
  * own vocab. */
final case class TokenizerConfig(
    modelMaxLength: Long = K.MaxLength.toLong,
    padTokenId: Long = 0L,
    padToken: String = "[PAD]",
    specialTokenIds: Seq[Long] = Seq(0L, 1L, 2L, 3L)) {

  /** min(user, model) truncation rule (common.rs:97). */
  def effectiveMaxLength(userMaxLength: Int): Int =
    math.min(userMaxLength.toLong, modelMaxLength).toInt
}

object TokenizerConfig {
  import org.json4s._
  import org.json4s.jackson.JsonMethods

  /** Parse the tokenizer_config.json / config.json dialect. Missing
    * `model_max_length` is an error, matching the reference
    * (common.rs:92-96); absurdly large values clamp to Int range. */
  def fromJson(json: String): TokenizerConfig = {
    val cfg = JsonMethods.parse(json)
    val mml: Long = cfg \ "model_max_length" match {
      case JInt(n) => if (n > BigInt(Long.MaxValue)) Long.MaxValue else n.toLong
      case JDouble(d) => if (d > Long.MaxValue.toDouble) Long.MaxValue else d.toLong
      case JLong(n) => n
      case _ => throw new IllegalArgumentException(
        "tokenizer_config.json is missing a numeric model_max_length field")
    }
    val padId = cfg \ "pad_token_id" match {
      case JInt(n) => n.toLong
      case JLong(n) => n
      case _ => 0L
    }
    val padTok = cfg \ "pad_token" match {
      case JString(s) => s
      case _ => "[PAD]"
    }
    TokenizerConfig(modelMaxLength = mml, padTokenId = padId, padToken = padTok)
  }
}
