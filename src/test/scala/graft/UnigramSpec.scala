package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model.{Unigram, UnigramModel}

/** The Unigram (SentencePiece) Viterbi tokenizer (graft.model.Unigram):
  * HF tokenizer.json parsing, max-likelihood segmentation, the pinned
  * longer-piece tie rule, and the XLM-R specials wrap. */
class UnigramSpec extends AnyFunSuite {

  private val um = Unigram.fixture
  private def id(p: String): Long = um.pieces.map(_._1).indexOf(p).toLong

  test("fixture parses: specials + full alphabet + scored pieces") {
    assert(um.unkId == 0)
    assert(um.bosId == 1L && um.eosId == 2L)
    assert(('a' to 'z').forall(c => um.pieces.exists(_._1 == c.toString)))
    // scores quantized at 1024 exactly (k/1024 fixture serialization)
    assert(um.pieces.exists(_._2 == -6144L)) // a char: -6.0
  }

  test("Viterbi picks the max-likelihood segmentation") {
    // whole word beats chars and sub-pieces: the(-1024*3) vs
    // th+e(-2048-6144) vs chars(-18432)
    assert(um.tokenizeWord("the") == Seq(id("the")))
    // prefix word + char tail
    assert(um.tokenizeWord("thee") == Seq(id("the"), id("e")))
    // sub-pieces beat chars where no whole word exists: "hees" ->
    // he(-2150) + es(-2766) beats h+e+e+s and he+e+s
    assert(um.tokenizeWord("hees") == Seq(id("he"), id("es")))
    assert(um.tokenizeWord("x") == Seq(id("x")))
    assert(um.tokenizeWord("") == Seq.empty)
  }

  test("equal path scores prefer the longer final piece (pinned tie rule)") {
    // "zq" scores exactly z+q (-12288 both ways) -> the 2-char piece
    assert(um.tokenizeWord("zq") == Seq(id("zq")))
  }

  test("encode wraps <s> ... </s> in word order") {
    assert(um.encode(Seq("the", "data")).toSeq ==
      Seq(um.bosId, id("the"), id("data"), um.eosId))
  }

  test("loader rejects non-Unigram models and malformed vocab entries") {
    val bpe = """{"model": {"type": "BPE", "vocab": {"a": 0}, "merges": []}}"""
    assertThrows[IllegalArgumentException](
      Unigram.fromTokenizerJson(bpe.getBytes("UTF-8")))
    val bad = """{"model": {"type": "Unigram", "unk_id": 0, "vocab": [["a"]]}}"""
    assertThrows[IllegalArgumentException](
      Unigram.fromTokenizerJson(bad.getBytes("UTF-8")))
    assertThrows[IllegalArgumentException](
      UnigramModel(Seq(("a", -1L), ("a", -2L)), 0))
  }

  test("a word touching an out-of-alphabet char UNKs whole") {
    assert(um.tokenizeWord("é") == Seq(um.unkId.toLong))
  }
}
