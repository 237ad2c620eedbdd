package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.TokenizerTrain

/** BPE tokenizer training: hand-computed merges on a tiny fixture,
  * greedy-left round semantics (the back-to-back case), deterministic
  * tie-breaking, partitioning invariance, and early exhaustion. */
class TokenizerTrainSpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  private def corpus(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  test("trainBpeMerges: hand-computed two-round fixture") {
    // words: ab x3, abc x1 → round 0 pairs (a,b)=4, (b,c)=1 → merge (a,b)
    // round 1: ab=[ab], abc=[ab,c] → pairs (ab,c)=1 → merge (ab,c)
    // round 2: nothing left to merge → early stop
    val wc = TokenizerTrain.wordCounts(corpus("ab ab ab", "abc"), "text")
    val merges = TokenizerTrain.trainBpeMerges(wc, nMerges = 5)
    assert(merges == Seq((0L, "a", "b", 4L), (1L, "ab", "c", 1L)))
  }

  test("greedy-left round: back-to-back occurrences both merge") {
    // "aaaa" under merge (a,a) → (aa)(aa), NOT (aa)a a — the classic
    // non-overlapping left-to-right BPE round
    val wc = TokenizerTrain.wordCounts(corpus("aaaa aaa"), "text")
    val seg = TokenizerTrain.segmentWords(wc, Seq(("a", "a")))
      .select(col("word"), col("syms")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(seg("aaaa") == List("aa", "aa"))
    assert(seg("aaa") == List("aa", "a"))
  }

  test("tie-break: equal counts resolve (left, right) lexicographic") {
    // "xy" and "ab" each appear twice: counts tie at 2, (a,b) < (x,y)
    val wc = TokenizerTrain.wordCounts(corpus("xy ab", "ab xy"), "text")
    val merges = TokenizerTrain.trainBpeMerges(wc, nMerges = 1)
    assert(merges == Seq((0L, "a", "b", 2L)))
  }

  test("partitioning invariance: repartitioned word table learns the same merges") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val wc = TokenizerTrain.wordCounts(d, "text")
    val a = TokenizerTrain.trainBpeMerges(wc, nMerges = 6)
    val b = TokenizerTrain.trainBpeMerges(wc.repartition(7), nMerges = 6)
    assert(a == b)
    assert(a.size == 6)
  }

  test("exhaustion: single-character vocabulary learns nothing") {
    val wc = TokenizerTrain.wordCounts(corpus("a b c a"), "text")
    assert(TokenizerTrain.trainBpeMerges(wc, nMerges = 3).isEmpty)
  }

  test("bpeTokenCounts: totals conserve the corpus character mass") {
    // every round only coalesces symbols, so Σ total * len(token) over
    // the learned vocabulary equals the corpus character count
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val chars = TokenizerTrain.wordCounts(d, "text")
      .select(sum(length(col("word")) * col("cnt"))).collect()(0).getLong(0)
    val toks = TokenizerTrain.bpeTokenCounts(d, "text", nMerges = 4)
      .select(sum(length(col("token")) * col("total"))).collect()(0).getLong(0)
    assert(toks == chars)
  }
}
