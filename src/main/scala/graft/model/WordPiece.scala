package graft.model

/** S7/P1 upgrade: a REAL vocab tokenizer — greedy longest-match-first
  * WordPiece over a `tokenizer.json` vocab in the public HF format, the
  * file the reference feeds to `tokenizers::Tokenizer::from_bytes`
  * (/root/reference/src/common.rs:57-157 loads tokenizer.json +
  * configs; the WordPiece model inside is the standard HF one). The
  * hashing tokenizer ([[graft.functions.TokenIds]]) stays the engine
  * default; this is the drop-in for models that ship a real vocab.
  *
  * Matching semantics (HF `models::wordpiece::WordPiece::tokenize`):
  *  - a word longer than `max_input_chars_per_word` chars → `[UNK]`;
  *  - else scan left to right, at each position taking the LONGEST
  *    vocab entry that matches (entries at position > 0 must carry the
  *    `continuing_subword_prefix`, "##");
  *  - if any position has no match, the WHOLE word becomes `[UNK]`.
  *
  * [[WordPieceModel.encodeWords]] wraps the piece stream in
  * `[CLS] … [SEP]` (the BERT-style post-processing the reference's
  * tokenizer.json files configure).
  */
final case class WordPieceModel(
    vocab: Seq[(String, Long)],
    unkToken: String,
    contPrefix: String,
    maxInputChars: Int) {

  val ids: Map[String, Long] = vocab.toMap
  require(ids.size == vocab.size, "duplicate vocab entries")
  val unkId: Long = ids.getOrElse(unkToken,
    throw new IllegalArgumentException(s"unk token '$unkToken' not in vocab"))
  val clsId: Long = ids.getOrElse("[CLS]", 1L)
  val sepId: Long = ids.getOrElse("[SEP]", 2L)

  /** (core piece string → id) split by continuation flag; matching
    * always looks the CORE up, the prefix only selects the map. */
  private val startPieces: Map[String, Long] =
    vocab.collect { case (p, id) if !p.startsWith(contPrefix) => p -> id }.toMap
  private val contPieces: Map[String, Long] =
    vocab.collect { case (p, id) if p.startsWith(contPrefix) =>
      p.substring(contPrefix.length) -> id }.toMap
  private val maxPieceLen: Int =
    (startPieces.keysIterator ++ contPieces.keysIterator)
      .foldLeft(1)((m, p) => math.max(m, p.length))

  /** Greedy longest-match-first pieces of one normalized word. */
  def tokenizeWord(word: String): Seq[Long] = {
    if (word.isEmpty || word.length > maxInputChars) return Seq(unkId)
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var start = 0
    while (start < word.length) {
      val table = if (start == 0) startPieces else contPieces
      var len = math.min(maxPieceLen, word.length - start)
      var hit = -1L
      while (len >= 1 && hit < 0) {
        table.get(word.substring(start, start + len)) match {
          case Some(id) => hit = id
          case None => len -= 1
        }
      }
      if (hit < 0) return Seq(unkId) // any position failing UNKs the word
      out += hit
      start += len
    }
    out.toSeq
  }

  /** `[CLS] pieces… [SEP]` over an already-normalized word stream. */
  def encodeWords(words: Seq[String]): Array[Long] =
    (clsId +: words.flatMap(tokenizeWord) :+ sepId).toArray

  /** BERT-style pair encoding with the "only_second" truncation
    * dialect the reference's rerank tokenizers configure
    * (src/reranking/impl.rs:123-148 via tokenizers' TruncationParams):
    * `[CLS] A [SEP] B [SEP]`, segment 0 through the first [SEP],
    * segment 1 after; the SECOND sequence alone is truncated so the
    * total fits `maxLen`, then the closing [SEP] is appended. Returns
    * (input_ids, token_type_ids) parallel arrays. */
  def encodePair(wordsA: Seq[String], wordsB: Seq[String],
                 maxLen: Int): (Array[Long], Array[Long]) = {
    val a = wordsA.flatMap(tokenizeWord)
    val budgetB = maxLen - a.length - 3
    require(budgetB > 0, s"maxLen $maxLen leaves no room for the second sequence")
    val b = wordsB.flatMap(tokenizeWord).take(budgetB)
    val ids = (clsId +: a :+ sepId) ++ (b :+ sepId)
    val tts = Seq.fill(a.length + 2)(0L) ++ Seq.fill(b.length + 1)(1L)
    (ids.toArray, tts.toArray)
  }

  /** The non-special vocab as (core, coreLen, isCont, id) rows — what
    * the DuckDB oracle inlines as its vocab literal. */
  def oracleRows: Seq[(String, Int, Int, Long)] = {
    val special = Set(unkToken, "[CLS]", "[SEP]", "[PAD]")
    vocab.collect {
      case (p, id) if !special.contains(p) =>
        val cont = p.startsWith(contPrefix)
        val core = if (cont) p.substring(contPrefix.length) else p
        (core, core.length, if (cont) 1 else 0, id)
    }
  }
}

object WordPiece {

  /** Parse the `model` block of an HF tokenizer.json. Only the
    * WordPiece model type is supported; anything else errors loudly. */
  def fromTokenizerJson(bytes: Array[Byte]): WordPieceModel = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val root = JsonMethods.parse(
      new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
    val model = root \ "model"
    val tpe = model \ "type" match {
      case JString(s) => s
      case v => throw new IllegalArgumentException(s"model.type missing: $v")
    }
    require(tpe == "WordPiece", s"unsupported tokenizer model '$tpe'")
    val unk = model \ "unk_token" match {
      case JString(s) => s
      case _ => "[UNK]"
    }
    val prefix = model \ "continuing_subword_prefix" match {
      case JString(s) => s
      case _ => "##"
    }
    val maxChars = model \ "max_input_chars_per_word" match {
      case JInt(i) => i.toInt
      case _ => 100
    }
    val vocab = model \ "vocab" match {
      case JObject(fields) => fields.map {
        case (piece, JInt(id)) => piece -> id.toLong
        case (piece, v) =>
          throw new IllegalArgumentException(s"vocab entry '$piece': bad id $v")
      }
      case v => throw new IllegalArgumentException(s"model.vocab missing: $v")
    }
    WordPieceModel(vocab, unk, prefix, maxChars)
  }

  /** The repo's fixture tokenizer.json (a small WordPiece vocab over
    * the synthetic corpus's closed word set). */
  lazy val fixture: WordPieceModel = {
    val in = getClass.getResourceAsStream("/graft/tokenizer_fixture.json")
    require(in != null, "missing resource /graft/tokenizer_fixture.json")
    try fromTokenizerJson(in.readAllBytes()) finally in.close()
  }
}
