package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Kernel

/** Distributed BPE tokenizer TRAINING — the capability the reference
  * only consumes: it loads finished `tokenizer.json` files
  * (`/root/reference/src/common.rs:60-113` wires tokenizer +
  * truncation + padding from pretrained artifacts) but cannot produce
  * one. A 100 TB corpus pipeline needs to train its own vocabulary, so
  * this module learns byte-pair merges the way industrial trainers do:
  *
  *  1. ONE corpus pass folds the text into a (word, cnt) table — the
  *     only corpus-sized shuffle, keyed on the word.
  *  2. Every merge round runs over that word table, never the corpus:
  *     an adjacent-symbol pair count (partial-aggregated map-side, the
  *     exchange is pair-vocabulary-sized), a 1-row TakeOrdered argmax
  *     (count desc, then (left, right) lexicographic — fully
  *     deterministic, partitioning-invariant), and a NARROW greedy-left
  *     re-segmentation of the symbol arrays.
  *
  * At 100 TB the word table is ~1e8 rows regardless of corpus size
  * (vocabulary saturates), so each round is a small job and the merge
  * list — the trained model artifact — is tiny. Segmentation with a
  * learned merge list is a narrow per-row fold chain, no shuffle.
  *
  * The greedy-left fold (merge every non-overlapping occurrence
  * left-to-right within the round) matches the classic BPE trainer; the
  * DuckDB oracle unrolls the same rounds as chained CTEs using a
  * boundary-preserving string encoding (see
  * [[graft.oracle.OracleSql.bpeMergeCtes]]).
  */
object TokenizerTrain {

  /** The one corpus-sized stage: (word, cnt), one shuffle on the word.
    * Same normalization as every other text gate ([[Kernel.tokens]] ↔
    * `OracleSql.toks`). */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(Kernel.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Initial segmentation: each word split to single-character symbols. */
  private def withSyms(wc: DataFrame): DataFrame =
    wc.select(col("word"), col("cnt"), split(col("word"), "").as("syms"))

  /** Adjacent-symbol pair counts weighted by word count over a
    * (word, cnt, syms) table. The transform lambda touches only the
    * projected `syms` column reference (cheap to re-evaluate — no
    * tokenizer-chain inlining). */
  private[graft] def pairCountsOf(syms: DataFrame): DataFrame = {
    val pairs = transform(
      slice(col("syms"), lit(1), size(col("syms")) - 1),
      (x, i) => struct(x.as("l"), element_at(col("syms"), i + lit(2)).as("r")))
    syms.filter(size(col("syms")) >= 2)
      .select(col("cnt"), explode(pairs).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Round-0 pair counts straight from a corpus (the gate surface for
    * the distributed leg): (l, r, cnt). */
  def bpePairCounts(df: DataFrame, textCol: String): DataFrame =
    pairCountsOf(withSyms(wordCounts(df, textCol)))

  /** One greedy-left merge application: fold the symbol array,
    * coalescing every non-overlapping (l, r) occurrence left-to-right.
    * A freshly merged symbol never re-merges within the round (the
    * accumulator's last element becomes `l+r` ≠ `l`), exactly the
    * classic BPE round semantics. */
  private def applyMerge(syms: Column, l: String, r: String): Column =
    aggregate(syms,
      array().cast("array<string>"),
      (acc, x) =>
        when((size(acc) > 0)
            .and(element_at(acc, -1) === lit(l)).and(x === lit(r)),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
          .otherwise(concat(acc, array(x))))

  /** Learn `nMerges` merges over a (word, cnt) table. Per round: one
    * pair-vocabulary-sized aggregation + a 1-row TakeOrdered; the
    * re-segmented symbol table is lineage-cut each round so round k
    * never replays rounds 0..k-1. Ties break (count desc, left asc,
    * right asc) — binary string order, shared with the oracle. Returns
    * (rank, left, right, cnt) in rank order; stops early if no pair is
    * left to merge. */
  def trainBpeMerges(wc: DataFrame, nMerges: Int): Seq[(Long, String, String, Long)] = {
    var syms = withSyms(wc).localCheckpoint(false)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var k = 0
    var exhausted = false
    while (k < nMerges && !exhausted) {
      val best = pairCountsOf(syms)
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val b = best(0)
        val (l, r, c) = (b.getString(0), b.getString(1), b.getLong(2))
        out += ((k.toLong, l, r, c))
        syms = syms.select(col("word"), col("cnt"),
          applyMerge(col("syms"), l, r).as("syms")).localCheckpoint(false)
      }
      k += 1
    }
    out.toSeq
  }

  /** Segment a (word, cnt) table with an ordered merge list — narrow,
    * zero shuffle: the merges are plan literals (the trained artifact
    * is vocabulary-sized, it ships in the plan like a broadcast bank). */
  def segmentWords(wc: DataFrame, merges: Seq[(String, String)]): DataFrame =
    merges.foldLeft(withSyms(wc)) { case (d, (l, r)) =>
      d.select(col("word"), col("cnt"), applyMerge(col("syms"), l, r).as("syms"))
    }

  /** Corpus-level token counts under the learned vocabulary:
    * (token, total). Train + apply composed: the end-to-end check that
    * the learned merges actually tokenize. */
  def bpeTokenCounts(df: DataFrame, textCol: String, nMerges: Int): DataFrame = {
    val wc = wordCounts(df, textCol).localCheckpoint(false)
    val merges = trainBpeMerges(wc, nMerges)
    segmentWords(wc, merges.map(m => (m._2, m._3)))
      .select(explode(col("syms")).as("token"), col("cnt"))
      .groupBy("token").agg(sum(col("cnt")).as("total"))
  }
}
