package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model.{Bpe, BpeModel}

/** The merges-based BPE tokenizer (graft.model.Bpe): HF tokenizer.json
  * parsing, lowest-rank-first merge order, leftmost tie rule, and the
  * no-specials contract of a bare BPE model. */
class BpeSpec extends AnyFunSuite {

  private val bp = Bpe.fixture
  private def id(p: String): Long = bp.ids(p)

  test("fixture parses: full [a-z0-9] alphabet plus merged units, ids < 64") {
    assert(bp.vocab.size == 62)
    assert(bp.vocab.map(_._2).max < 64)
    assert(('a' to 'z').forall(c => bp.ids.contains(c.toString)))
    assert(('0' to '9').forall(c => bp.ids.contains(c.toString)))
  }

  test("merges fuse lowest rank first, transitively") {
    // "the": (t,h) rank 0 beats (h,e) rank 1 -> [th, e]; then (th, e)
    assert(bp.tokenizeWord("the") == Seq(id("the")))
    // "ring": (i,n) -> [r, in, g]; then (in, g) -> [r, ing]
    assert(bp.tokenizeWord("ring") == Seq(id("r"), id("ing")))
    // "thee": after [th, e, e] only (th, e) has a rank -> [the, e]
    assert(bp.tokenizeWord("thee") == Seq(id("the"), id("e")))
    // no mergeable pair: plain character ids
    assert(bp.tokenizeWord("xq") == Seq(id("x"), id("q")))
    assert(bp.tokenizeWord("a") == Seq(id("a")))
    assert(bp.tokenizeWord("") == Seq.empty)
  }

  test("equal-rank occurrences fuse leftmost first") {
    val m = BpeModel(
      vocab = Seq("a" -> 0L, "aa" -> 1L, "aaa" -> 2L),
      merges = Seq(("a", "a"), ("aa", "a")))
    // "aaa": leftmost (a,a) fuses -> [aa, a]; then (aa, a) -> [aaa]
    assert(m.tokenizeWord("aaa") == Seq(2L))
    // "aaaa": [aa, a, a] -> (a,a) rank 0 again at the tail ->
    // [aa, aa]; (aa, aa) has no rank -> terminal
    assert(m.tokenizeWord("aaaa") == Seq(1L, 1L))
  }

  test("loader accepts the array-pair merges form newer tokenizers write") {
    val js = """{"model": {"type": "BPE",
      "vocab": {"a": 0, "b": 1, "ab": 2},
      "merges": [["a", "b"]]}}"""
    val m = Bpe.fromTokenizerJson(js.getBytes("UTF-8"))
    assert(m.tokenizeWord("ab") == Seq(2L))
  }

  test("loader rejects non-BPE models, bad merges, and uncovered merges") {
    val wp = """{"model": {"type": "WordPiece", "vocab": {"a": 0}, "merges": []}}"""
    assertThrows[IllegalArgumentException](
      Bpe.fromTokenizerJson(wp.getBytes("UTF-8")))
    val bad = """{"model": {"type": "BPE", "vocab": {"a": 0}, "merges": ["a"]}}"""
    assertThrows[IllegalArgumentException](
      Bpe.fromTokenizerJson(bad.getBytes("UTF-8")))
    // a merge whose product is missing from the vocab must fail at load
    assertThrows[IllegalArgumentException](
      BpeModel(Seq("a" -> 0L), Seq(("a", "a"))))
  }

  test("out-of-alphabet symbols fail loudly (the alphabet is closed)") {
    assertThrows[IllegalArgumentException](bp.tokenizeWord("é"))
  }
}
