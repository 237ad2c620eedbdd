package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.model.{WordPiece, WordPieceModel}

/** S7/P1 real-vocab tokenizer: HF WordPiece greedy longest-match
  * semantics over the fixture tokenizer.json. */
class WordPieceSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val wp = WordPiece.fixture

  test("fixture tokenizer.json parses: specials, prefix, vocab size") {
    assert(wp.unkId == 0L && wp.clsId == 1L && wp.sepId == 2L)
    assert(wp.contPrefix == "##" && wp.maxInputChars == 100)
    assert(wp.ids.size == 44)
  }

  test("greedy longest-match-first: the longer of two matching prefixes wins") {
    // "scan" and "sc" both match at 0 → "scan" (one piece, id 9)
    assert(wp.tokenizeWord("scan") == Seq(9L))
    // "custom" beats "cust"; remainder "er" continues as "##er"
    assert(wp.tokenizeWord("customer") == Seq(11L, 13L))
  }

  test("multi-piece continuation walks with the ## table") {
    assert(wp.tokenizeWord("window") == Seq(14L, 15L, 16L)) // win ##d ##ow
    assert(wp.tokenizeWord("order") == Seq(28L, 29L))       // or ##der
    assert(wp.tokenizeWord("column") == Seq(23L, 24L))      // col ##umn
  }

  test("a position with no match UNKs the WHOLE word, even after progress") {
    // "vector": "vec" matches, then "tor" has no ## entry → [UNK], not
    // [vec, UNK] — the HF all-or-nothing rule
    assert(wp.tokenizeWord("vector") == Seq(wp.unkId))
    assert(wp.tokenizeWord("zzz") == Seq(wp.unkId))
  }

  test("a word over max_input_chars_per_word is UNK without matching") {
    assert(wp.tokenizeWord("win" + "d" * 98) == Seq(wp.unkId)) // 101 chars
    // at exactly 100 chars the normal walk applies: win then 97 ##d
    assert(wp.tokenizeWord("win" + "d" * 97) == 14L +: Seq.fill(97)(15L))
  }

  test("encodeWords wraps in [CLS] … [SEP]") {
    assert(wp.encodeWords(Seq("the", "scan")).toSeq == Seq(1L, 5L, 9L, 2L))
    assert(wp.encodeWords(Seq.empty).toSeq == Seq(1L, 2L))
  }

  test("non-WordPiece tokenizer.json errors loudly") {
    val bpe = """{"model":{"type":"BPE","vocab":{}}}""".getBytes("UTF-8")
    val e = intercept[IllegalArgumentException] { WordPiece.fromTokenizerJson(bpe) }
    assert(e.getMessage.contains("BPE"))
  }

  test("duplicate vocab entries are rejected") {
    intercept[IllegalArgumentException] {
      WordPieceModel(Seq("[UNK]" -> 0L, "a" -> 4L, "a" -> 5L), "[UNK]", "##", 100)
    }
  }

  test("the Column expression matches the JVM model word-for-word") {
    import spark.implicits._
    val texts = Seq(
      "the customer scan",
      "Window ORDER!! column",
      "vector vector the",
      "  a  ",
      "punctuation-only: ...")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val bridge = org.apache.spark.sql.graftbridge.Bridge
    val got = df.select(col("id"),
        bridge.column(graft.functions.WordPieceIds(bridge.expression(col("text")), wp)).as("ids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val words = t.toLowerCase.replaceAll("[^a-z0-9 ]", " ")
        .split("\\s+").filter(_.nonEmpty).toSeq
      assert(got(i.toLong) == wp.encodeWords(words).toSeq, s"text '$t'")
    }
  }

  test("embedTokens is the same tail embed() runs — tokenizer swap is exact") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((0L, "the customer scan"), (1L, "window order column value"))
      .toDF("doc_id", "text")
    val viaText = graft.operators.TextEmbedder()
      .embed(df, "text", "emb")
      .select(col("doc_id"), col("emb")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val viaTokens = graft.operators.TextEmbedder.embedTokens(
        df.withColumn("__t", graft.functions.Kernel.tokenIds(col("text"))),
        "__t", "emb")
      .select(col("doc_id"), col("emb")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(viaText == viaTokens)
  }

  test("encodePair: only_second truncation, segments, closing [SEP] appended") {
    // query "the scan" → [5, 9]; budget for B = 12 − 2 − 3 = 7
    val (ids, tts) = wp.encodePair(Seq("the", "scan"),
      Seq("window", "order", "column", "customer", "value"), 12)
    // B pieces: win ##d ##ow or ##der col ##umn custom ##er value → 10, cut at 7
    assert(ids.toSeq == Seq(1L, 5L, 9L, 2L, 14L, 15L, 16L, 28L, 29L, 23L, 24L, 2L))
    assert(tts.toSeq == Seq(0L, 0L, 0L, 0L, 1L, 1L, 1L, 1L, 1L, 1L, 1L, 1L))
    assert(ids.length == 12 && tts.length == ids.length)
    intercept[IllegalArgumentException] { wp.encodePair(Seq("the"), Seq("a"), 4) }
  }

  test("Column pair encode ≡ the JVM mirror (truncated and untruncated)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val texts = Seq("window order column customer value", "the scan", "vector")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val bridge = org.apache.spark.sql.graftbridge.Bridge
    val qWords = Seq("the", "scan")
    val got = df
      .select(col("id"), bridge.column(graft.functions.WordPieceIds(
        bridge.expression(col("text")), wp)).as("__ids"))
      .withColumn("pe", graft.operators.Reranker.wordPiecePairEncode(qWords, col("__ids"), wp, 12))
      .select(col("id"), col("pe.input_ids"), col("pe.token_type_ids"))
      .collect().map(r => r.getLong(0) -> (r.getSeq[Long](1), r.getSeq[Long](2))).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val words = t.split(" ").toSeq
      val (ids, tts) = wp.encodePair(qWords, words, 12)
      assert(got(i.toLong) == ((ids.toSeq, tts.toSeq)), s"text '$t'")
    }
  }

  test("SQL surface: graft_wordpiece_ids registers and runs") {
    graft.sql.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_wordpiece_ids('the customer scan') AS ids").collect()
    assert(r.head.getSeq[Long](0) == Seq(1L, 5L, 11L, 13L, 9L, 2L))
  }
}
