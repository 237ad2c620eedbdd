package graft.model

/** S7/P1 upgrade, part 3: a REAL Unigram (SentencePiece) tokenizer
  * over a `tokenizer.json` in the public HF format — the third model
  * family the reference's registry ships (intfloat/multilingual-e5-*
  * are XLM-R models with Unigram vocabularies; `load_tokenizer` hands
  * any model type to the tokenizers runtime,
  * /root/reference/src/common.rs:57-157).
  *
  * Segmentation is Viterbi max-likelihood: over all ways to split a
  * word into vocabulary pieces, take the one maximizing the summed
  * piece scores (scores are log-probs; the fixture serializes exact
  * k/1024 multiples, quantized losslessly to integers on load, so the
  * whole DP is exact int64). Tie rule, pinned for determinism and
  * mirrored in the oracle: equal path scores prefer the LONGER final
  * piece (then the higher piece id — unreachable in practice, since
  * two distinct pieces of one length cannot both match the same
  * substring). The XLM-R post-processor wraps `<s> … </s>`. */
final case class UnigramModel(
    pieces: Seq[(String, Long)], // (piece, score·1024) in id order
    unkId: Int,
    bosPiece: String = "<s>",
    eosPiece: String = "</s>") {

  require(pieces.map(_._1).distinct.size == pieces.size, "duplicate vocab pieces")
  require(unkId >= 0 && unkId < pieces.size, s"unk_id $unkId out of range")
  // packed-key field bounds (see tokenizeWord): id < 2^18, piece
  // length < 2^7, |score·1024| < 2^17 (|logprob| < 128 — real Unigram
  // scores sit far inside this). Violations fail at LOAD, not as a
  // silently wrong segmentation.
  require(pieces.size < (1 << 18),
    s"vocab of ${pieces.size} pieces overflows the 18-bit id field")
  pieces.foreach { case (p, sc) =>
    require(p.length < (1 << 7), s"piece '${p.take(20)}…' of ${p.length} chars overflows the length field")
    require(math.abs(sc) < (1L << 17), s"piece '$p' score $sc overflows the score field")
  }

  private val idOf: Map[String, Int] = pieces.map(_._1).zipWithIndex.toMap
  val bosId: Long = idOf.getOrElse(bosPiece, 1).toLong
  val eosId: Long = idOf.getOrElse(eosPiece, 2).toLong

  /** Non-special pieces as (piece, len, score, id) — the oracle's
    * inline vocab literal. */
  def oracleRows: Seq[(String, Int, Long, Int)] =
    pieces.zipWithIndex.collect {
      case ((p, sc), id) if !p.startsWith("<") => (p, p.length, sc, id)
    }

  private val maxPieceLen: Int =
    if (pieces.isEmpty) 1 else pieces.map(_._1.length).max

  /** Viterbi segmentation of one normalized word. The packed
    * comparison key `(sc + Bias)·2^25 + n·2^18 + id` realizes the
    * pinned (score, length, id) order exactly like the oracle
    * (length < 2^7 and id < 2^18 are load-time invariants; score
    * steps of 2^25 dominate both; the 2^36 bias keeps keys positive —
    * |path score| < wordLen·2^17 ≤ 2^36 under the word-length guard —
    * so the oracle's truncating `//`/`%` decode them exactly). A word
    * touching a character outside the vocab alphabet UNKs whole (the
    * gated corpus is closed over [a-z0-9], all of which are
    * pieces). */
  def tokenizeWord(word: String): Seq[Long] = {
    if (word.isEmpty) return Seq.empty
    require(word.length <= UnigramModel.MaxWordLen,
      s"word of ${word.length} chars overflows the packed Viterbi key")
    val n = word.length
    val MinSc = Long.MinValue / 4
    val best = Array.fill(n + 1)(MinSc)
    val bestKey = Array.fill(n + 1)(Long.MinValue)
    val prevAt = new Array[Int](n + 1)
    val idAt = new Array[Int](n + 1)
    best(0) = 0L
    var i = 1
    while (i <= n) {
      var l = 1
      while (l <= i && l <= maxPieceLen) {
        val start = i - l
        if (best(start) > MinSc) {
          idOf.get(word.substring(start, i)) match {
            case Some(id) =>
              val sc = best(start) + pieces(id)._2
              val key = ((sc + UnigramModel.Bias) << 25) | (l.toLong << 18) | id.toLong
              if (key > bestKey(i)) {
                bestKey(i) = key
                best(i) = sc
                prevAt(i) = start
                idAt(i) = id
              }
            case None => ()
          }
        }
        l += 1
      }
      i += 1
    }
    if (best(n) <= MinSc) return Seq(unkId.toLong)
    // backtrack
    var out = List.empty[Long]
    var p = n
    while (p > 0) {
      out = idAt(p).toLong :: out
      p = prevAt(p)
    }
    out
  }

  /** `<s> pieces… </s>` over the word stream — the XLM-R template. */
  def encode(words: Seq[String]): Array[Long] =
    (bosId +: words.flatMap(tokenizeWord) :+ eosId).toArray
}

object UnigramModel {
  /** Key bias keeping packed Viterbi keys positive: 2^36 exceeds the
    * largest possible |path score| = MaxWordLen · 2^17 (the per-piece
    * score bound), so `sc + Bias > 0` always and key < 2^62. */
  val Bias: Long = 1L << 36
  /** Longest word the packed key covers (MaxWordLen · 2^17 ≤ Bias). */
  val MaxWordLen: Int = 100000
}

object Unigram {

  /** Parse the `model` block of an HF tokenizer.json with a Unigram
    * model: `vocab` is an ordered [piece, score] list (id = index),
    * plus `unk_id`. Scores quantize at 1024 (the fixture serializes
    * exact multiples, so the round-trip is lossless). */
  def fromTokenizerJson(bytes: Array[Byte]): UnigramModel = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val root = JsonMethods.parse(
      new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
    val model = root \ "model"
    val tpe = model \ "type" match {
      case JString(s) => s
      case v => throw new IllegalArgumentException(s"model.type missing: $v")
    }
    require(tpe == "Unigram", s"unsupported tokenizer model '$tpe'")
    val unk = model \ "unk_id" match {
      case JInt(i) => i.toInt
      case _ => 0
    }
    val vocab = model \ "vocab" match {
      case JArray(items) => items.map {
        case JArray(JString(piece) :: score :: Nil) =>
          val d = score match {
            case JDouble(x) => x
            case JInt(x) => x.toDouble
            case v => throw new IllegalArgumentException(s"bad score for '$piece': $v")
          }
          piece -> math.round(d * 1024.0)
        case v => throw new IllegalArgumentException(s"bad vocab entry $v")
      }
      case v => throw new IllegalArgumentException(s"model.vocab missing: $v")
    }
    UnigramModel(vocab, unk)
  }

  /** The repo's fixture Unigram tokenizer.json: specials, the full
    * [a-z0-9] alphabet, and multi-char pieces with log-prob scores
    * favoring whole-word segmentation. */
  lazy val fixture: UnigramModel = {
    val in = getClass.getResourceAsStream("/graft/tokenizer_unigram_fixture.json")
    require(in != null, "missing resource /graft/tokenizer_unigram_fixture.json")
    try fromTokenizerJson(in.readAllBytes()) finally in.close()
  }
}
