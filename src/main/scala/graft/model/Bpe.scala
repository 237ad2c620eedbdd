package graft.model

/** S7/P1 upgrade, part 2: a REAL merges-based BPE tokenizer over a
  * `tokenizer.json` in the public HF format — the tokenizer family the
  * reference's Qwen3/decoder models actually ship (its
  * `load_tokenizer` hands any model type to the tokenizers runtime,
  * /root/reference/src/common.rs:57-157; the Qwen3 path encodes with
  * it directly, qwen3.rs:1105). The WordPiece loader covers the
  * BERT-family vocabs; this covers the GPT-family: no specials are
  * added (a bare BPE model has no post-processor, so
  * `encode(text, true)` appends nothing).
  *
  * Merge semantics (the tokenizers crate's `Word::merge_all` order):
  * repeatedly find the adjacent symbol pair with the LOWEST merge
  * rank and fuse its LEFTMOST occurrence; stop when no adjacent pair
  * is in the merge table. Ranks are unique (the merge list is
  * ordered), so the only tie is the same pair occurring twice — the
  * leftmost fuses first, exactly the position-ordered queue pop. */
final case class BpeModel(
    vocab: Seq[(String, Long)],
    merges: Seq[(String, String)]) {

  val ids: Map[String, Long] = vocab.toMap
  require(ids.size == vocab.size, "duplicate vocab entries")
  require(merges.distinct.size == merges.size, "duplicate merge entries")

  /** (left, right) → rank; lower merges first. */
  val rank: Map[(String, String), Int] = merges.zipWithIndex.toMap
  merges.foreach { case (a, b) =>
    require(ids.contains(a + b),
      s"merge '$a $b' produces '${a + b}' which is not in the vocab")
  }

  /** BPE-encode one normalized word (characters are the base
    * symbols — the corpus alphabet is the ASCII [a-z0-9] the
    * normalizer emits, where byte-level and char-level coincide). */
  def tokenizeWord(word: String): Seq[Long] = {
    if (word.isEmpty) return Seq.empty
    var syms = word.map(_.toString).toVector
    var done = false
    while (!done && syms.length > 1) {
      var best = Int.MaxValue
      var bi = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < best) { best = r; bi = i } // strict < keeps the leftmost
        i += 1
      }
      if (bi < 0) done = true
      else syms = (syms.take(bi) :+ (syms(bi) + syms(bi + 1))) ++ syms.drop(bi + 2)
    }
    syms.map(sy => ids.getOrElse(sy,
      throw new IllegalArgumentException(s"symbol '$sy' not in the BPE vocab")))
  }

  /** The non-merged alphabet plus merge table as oracle rows:
    * vocab as (piece, id), merges as (left, right, rank). */
  def oracleVocabRows: Seq[(String, Long)] = vocab
  def oracleMergeRows: Seq[(String, String, Int)] =
    merges.zipWithIndex.map { case ((a, b), r) => (a, b, r) }
}

object Bpe {

  /** Parse the `model` block of an HF tokenizer.json with a BPE model:
    * `vocab` (token → id) and `merges` (ordered "left right" lines —
    * the string form the format serializes). */
  def fromTokenizerJson(bytes: Array[Byte]): BpeModel = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val root = JsonMethods.parse(
      new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
    val model = root \ "model"
    val tpe = model \ "type" match {
      case JString(s) => s
      case v => throw new IllegalArgumentException(s"model.type missing: $v")
    }
    require(tpe == "BPE", s"unsupported tokenizer model '$tpe'")
    val vocab = model \ "vocab" match {
      case JObject(fields) => fields.map {
        case (piece, JInt(id)) => piece -> id.toLong
        case (piece, v) =>
          throw new IllegalArgumentException(s"vocab entry '$piece': bad id $v")
      }
      case v => throw new IllegalArgumentException(s"model.vocab missing: $v")
    }
    // both serializations of the merge list are public HF format:
    // legacy "a b" lines, and the [["a", "b"], …] pair form newer
    // tokenizers releases write
    val merges = model \ "merges" match {
      case JArray(items) => items.map {
        case JString(line) => line.split(" ", 2) match {
          case Array(a, b) if a.nonEmpty && b.nonEmpty => (a, b)
          case _ => throw new IllegalArgumentException(s"bad merge line '$line'")
        }
        case JArray(JString(a) :: JString(b) :: Nil) if a.nonEmpty && b.nonEmpty =>
          (a, b)
        case v => throw new IllegalArgumentException(s"bad merge entry $v")
      }
      case v => throw new IllegalArgumentException(s"model.merges missing: $v")
    }
    BpeModel(vocab, merges)
  }

  /** The repo's fixture BPE tokenizer.json: the [a-z0-9] alphabet plus
    * common-English merges; every id < 64, the learned-table id
    * space. */
  lazy val fixture: BpeModel = {
    val in = getClass.getResourceAsStream("/graft/tokenizer_bpe_fixture.json")
    require(in != null, "missing resource /graft/tokenizer_bpe_fixture.json")
    try fromTokenizerJson(in.readAllBytes()) finally in.close()
  }
}
