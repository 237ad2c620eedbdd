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

  /** Initial segmentation: each word split to single-character symbols.
    * The empty-string filter makes the no-boundary-symbol invariant
    * explicit (Spark ≥3.4's `split(word, "")` emits no trailing "" after
    * SPARK-40194, but Java's raw `split` does — a silent regression here
    * would count bogus (lastChar, "") pairs and diverge the trained
    * merges from the oracle), consistent with [[alphabetOf]]'s filter. */
  private def withSyms(wc: DataFrame): DataFrame =
    wc.select(col("word"), col("cnt"),
      array_remove(split(col("word"), ""), "").as("syms"))

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

  /** One greedy-left pass applying a BATCH of merges — sound only for
    * batches [[trainBpeMergesBatched]] accepts (pairwise
    * symbol-disjoint, cascade-free), where a position matches at most
    * one pair and no merged token re-enters any rule, so one combined
    * fold ≡ the sequential per-pair folds. The batch ships as two
    * literal maps (left → expected right, left → merged token). */
  private def applyMergeBatch(syms: Column, ms: Seq[(String, String)]): Column = {
    val rmap = map(ms.flatMap { case (l, r) => Seq(lit(l), lit(r)) }: _*)
    val mmap = map(ms.flatMap { case (l, r) => Seq(lit(l), lit(l + r)) }: _*)
    aggregate(syms,
      array().cast("array<string>"),
      (acc, x) =>
        when((size(acc) > 0)
            .and(element_at(rmap, element_at(acc, -1)) === x),
          concat(slice(acc, lit(1), size(acc) - 1),
            array(element_at(mmap, element_at(acc, -1)))))
          .otherwise(concat(acc, array(x))))
  }

  /** [[trainBpeMerges]] with PROVABLY-EXACT merge batching — the same
    * learned list, fewer driver-sequenced rounds. The sequential
    * trainer's wall at production merge counts (~30k) is not data: the
    * word table saturates (≈1e8 rows at 100 TB) and each round's jobs
    * are small — it is the ROUND COUNT × fixed job overhead
    * (TokTrainProbe: ~0.11 s/round of pure overhead even on a 176-word
    * table ⇒ ~55 min of driver sequencing for 30k merges). This
    * variant accepts, per round, the maximal PREFIX of the sorted
    * candidate pairs that is provably the next run of sequential
    * argmaxes, and applies it in one pass:
    *
    *  - '''R1 (disjoint)''': accepted pairs share no symbol — merging
    *    one cannot change another's count (a merge only perturbs pairs
    *    adjacent to its own symbols), so every accepted count is the
    *    exact sequential count at its step.
    *  - '''R2 (cascade-free)''': no accepted pair's MERGED token
    *    equals any accepted pair's symbol — new tokens never re-enter
    *    a batch rule, making the one-pass fold order-free and ≡ the
    *    sequential folds.
    *  - '''R3 (new-pair bound)''': merging (l, r) can create new pairs
    *    only of the form (x, lr) or (lr, y), with counts bounded by
    *    count(x, l) resp. count(r, y) — both already in the counts
    *    table. A candidate is accepted only while its count is
    *    STRICTLY above every earlier accepted pair's bound
    *    B = max(maxₓ count(x, l), max_y count(r, y)), so no new pair
    *    can overtake it (strictness also settles lex ties).
    *  - '''Prefix rule''': stop at the FIRST candidate failing any
    *    rule — a skipped candidate's count may have decreased, so
    *    everything after it is unprovable this round.
    *
    * Every batch has length ≥ 1 (the head is the argmax by
    * construction), so this is never worse than sequential; the spec
    * pins list-equality against [[trainBpeMerges]] to exhaustion on
    * BOTH regimes, the q162/q162b gates pin both against the
    * chained-CTE oracle at 128 rounds (past the gate corpus's full
    * 89-merge vocabulary). Returns ((rank, left, right, cnt),
    * roundsUsed) — roundsUsed is 1 on the driver-incremental regime
    * (word table ≤ `driverWords`: one collect job, zero per-round
    * jobs; see [[trainBpeIncremental]]).
    *
    * Distributed rounds maintain the pair-count table INCREMENTALLY
    * once a single complete collect proves it fits [[CollectPairsLimit]]
    * (the distributed analog of [[trainBpeIncremental]]'s delta
    * maintenance): each later round's one Spark job computes only the
    * accepted batch's count deltas over the words the fold changed —
    * the exchange is delta-vocabulary-sized, the collect is
    * delta-sized, and the full pair multiset is never re-exploded.
    * `verifyDeltas` (spec-only) recounts after every round and asserts
    * the maintained table equals the recount. */
  def trainBpeMergesBatched(wc: DataFrame, nMerges: Int,
                            topN: Int = 1024,
                            driverWords: Int = DriverWordsLimit,
                            verifyDeltas: Boolean = false): (Seq[(Long, String, String, Long)], Int) = {
    // REGIME SPLIT, one level above the CollectPairsLimit fast path: a
    // word table that fits the driver trains ENTIRELY there with
    // incremental pair-count maintenance (below) — the corpus-sized
    // work was already done by wordCounts' one shuffle, and per-round
    // Spark jobs only re-derive counts the merge itself determines.
    // The limit+1 collect proves the regime (≤ limit rows ⇒ complete);
    // the true 1e8-word regime falls through to the distributed rounds.
    val head = wc.select(col("word"), col("cnt"))
      .limit(driverWords + 1).collect()
    if (head.length <= driverWords) {
      val words = head.map(r =>
        (r.getString(0).map(_.toString).toArray, r.getLong(1)))
      return (trainBpeIncremental(words, nMerges), 1)
    }
    val spark = wc.sparkSession
    import spark.implicits._
    // the loop state never reads `word` (rounds consume only (cnt, syms);
    // the merge list is the output) — dropping it halves the per-round
    // lineage-cut block bytes
    var syms = withSyms(wc).select(col("cnt"), col("syms")).localCheckpoint(false)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var rounds = 0
    var exhausted = false
    // Driver-maintained pair-count table for the INCREMENTAL distributed
    // regime (r19 verdict #1 — the distributed analog of
    // [[trainBpeIncremental]]'s delta maintenance): once one complete
    // collect proves the pair table fits CollectPairsLimit, later rounds
    // never recount it. Each round's ONE Spark job computes only the
    // accepted batch's COUNT DELTAS over the words the fold changed and
    // the driver folds them into this map — exactly recount-equivalent
    // (a merge perturbs only pairs adjacent to its own occurrences;
    // `verifyDeltas` recounts and asserts per round, spec-pinned). If
    // the table ever outgrows the limit the map drops and the next
    // round re-proves the regime with the limit+1 collect, preserving
    // the driver-memory bound.
    //
    // In this regime the word table lives as a plain RDD and rounds run
    // as SINGLE-STAGE RDD jobs: the measured round wall was FIXED
    // per-round overhead, not data (TokTrainProbe r20: 0.29 s/round on
    // the DataFrame loop at 96k words AND at 176 words — Catalyst
    // analysis/optimization of a fresh plan every round plus a 2-stage
    // partial/final aggregation), and an RDD round skips all of it: no
    // SQL planning, no exchange (per-partition delta maps merge on the
    // driver — they are bounded by the touched pair vocabulary), one
    // narrow fold pass, lineage cut per round via RDD.localCheckpoint
    // (the graft-cc-stats rule: iterative loops must not grow task
    // binaries with round depth).
    var pcOpt: Option[scala.collection.mutable.HashMap[(String, String), Long]] = None
    var symsRdd: org.apache.spark.rdd.RDD[(Array[String], Long)] = null
    while (out.size < nMerges && !exhausted) {
      // The round's wall is FIXED JOB OVERHEAD, not data (TokTrainProbe:
      // ~1.3 s/round across 3 jobs at any word-table size) — so when the
      // whole pair-count table is small enough to ship, ONE job collects
      // it and the topN sort + byRight/byLeft new-pair bounds compute on
      // the driver: identical candidate prefix, a third of the jobs. The
      // limit+1 collect proves completeness (≤ limit rows ⇒ nothing was
      // cut) without ever pulling an over-limit table; past the limit —
      // the true 1e8-word regime where the pair vocabulary is huge —
      // the distributed path below computes the same bounds with
      // exchanges. The syms cut stays LAZY here so the re-segmentation
      // folds into this same job (materializing truncates its lineage
      // each round, keeping round k's closure one round deep).
      val cand: Array[org.apache.spark.sql.Row] = pcOpt match {
        case Some(pc) => candidateRows(pc, topN)
        case None =>
      val whole = pairCountsOf(syms).limit(CollectPairsLimit + 1).collect()
      if (whole.length <= CollectPairsLimit) {
        val pc = scala.collection.mutable.HashMap.empty[(String, String), Long]
        whole.foreach(r => pc.update((r.getString(0), r.getString(1)), r.getLong(2)))
        pcOpt = Some(pc)
        symsRdd = syms.select(col("syms"), col("cnt")).as[(Array[String], Long)].rdd
        candidateRows(pc, topN)
      } else {
        // EAGER cuts on the wide path: the bound joins add two plan
        // branches per round; past ~100 lazily-cut rounds the
        // accumulated closure graph overflowed task deserialization
        val counts = pairCountsOf(syms).localCheckpoint(true)
        val byRight = counts.groupBy(col("r")).agg(max(col("cnt")).as("bl"))
          .withColumnRenamed("r", "k1")
        val byLeft = counts.groupBy(col("l")).agg(max(col("cnt")).as("br"))
          .withColumnRenamed("l", "k2")
        counts
          .orderBy(col("cnt").desc, col("l").asc, col("r").asc).limit(topN)
          .join(broadcast(byRight), col("l") === col("k1"), "left")
          .join(broadcast(byLeft), col("r") === col("k2"), "left")
          .select(col("l"), col("r"), col("cnt"),
            greatest(coalesce(col("bl"), lit(0L)), coalesce(col("br"), lit(0L))).as("b"))
          .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
          .collect()
      }
      }
      if (cand.isEmpty) exhausted = true
      else {
        val used = scala.collection.mutable.Set.empty[String]
        val batch = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        var maxB = Long.MinValue
        var stop = false
        var i = 0
        while (!stop && i < cand.length && out.size + batch.size < nMerges) {
          val (l, r, c, b) =
            (cand(i).getString(0), cand(i).getString(1), cand(i).getLong(2), cand(i).getLong(3))
          val m = l + r
          // `used` holds every accepted pair's symbols AND merged token,
          // so the three membership tests cover R1 and both directions
          // of R2 (a candidate whose symbol is an accepted merged token,
          // and a candidate whose merged token is an accepted symbol).
          // l == r candidates need no special case: m = l+r is strictly
          // longer than either symbol, so it can never collide with its
          // own pair's symbols.
          val ok = (batch.isEmpty || c > maxB) &&
            !used.contains(l) && !used.contains(r) && !used.contains(m)
          if (ok) {
            batch += ((l, r, c))
            used += l; used += r; used += m
            maxB = math.max(maxB, b)
          } else stop = true
          i += 1
        }
        batch.foreach { case (l, r, c) => out += ((out.size.toLong, l, r, c)) }
        pcOpt match {
          case Some(pc) if batch.nonEmpty =>
            // ONE single-stage RDD job per round: fold every word (the
            // same greedy-left single-lookup pass as MergeBatchFold —
            // foldWord returns the INPUT REFERENCE when nothing merged),
            // accumulate the changed words' pair deltas inside the same
            // pass, and persist ONE element per partition: the folded
            // word array plus its delta map. The delta collect
            // materializes the round's checkpoint; the next round
            // flatMaps the words back out of the same blocks. Unchanged
            // words keep their previous round's array REFERENCE, so the
            // per-round heap growth is only the touched words.
            val rules = new java.util.HashMap[String, Array[String]](batch.size * 2)
            batch.foreach { case (l, r, _) => rules.put(l, Array(r, l + r)) }
            val staged = symsRdd.mapPartitions { it =>
              val acc = scala.collection.mutable.HashMap.empty[(String, String), Long]
              val out = scala.collection.mutable.ArrayBuffer.empty[(Array[String], Long)]
              it.foreach { case (a, c) =>
                val n = foldWord(a, rules)
                if (n ne a) accumulatePairDeltas(acc, a, n, c)
                out += ((n, c))
              }
              Iterator.single((out.toArray, acc.toArray))
            }.localCheckpoint()
            staged.map(_._2).collect().foreach(_.foreach { case (key, dc) =>
              val nv = pc.getOrElse(key, 0L) + dc
              require(nv >= 0L,
                s"BPE delta maintenance drove pair $key below zero ($nv)")
              if (nv == 0L) pc.remove(key) else pc.update(key, nv)
            })
            symsRdd = staged.flatMap(_._1.iterator)
            if (verifyDeltas) {
              val recount = scala.collection.mutable.HashMap.empty[(String, String), Long]
              symsRdd.mapPartitions(partitionPairCounts).collect()
                .foreach { case (k, c) =>
                  recount.update(k, recount.getOrElse(k, 0L) + c) }
              require(recount == pc,
                s"delta-maintained pair table diverged from recount at round $rounds")
            }
            // the memory bound the limit+1 collect enforced: a table
            // that outgrew the limit drops back to the recount regimes
            // (rare — the pair vocabulary saturates with the word
            // vocabulary), materializing the RDD state as an eager
            // DataFrame cut so the recount path re-proves (or refutes)
            // the regime next round
            if (pc.size > CollectPairsLimit) {
              pcOpt = None
              syms = symsRdd.toDF("syms", "cnt").localCheckpoint(true)
              symsRdd = null
            }
          case _ =>
            // recount regimes: lazy cut, the next round's collect job
            // computes this re-segmentation and truncates its lineage
            // in the same pass. The fold is the reference-object
            // expression (MergeBatchFold ≡ applyMergeBatch), so the
            // generated source is round-invariant and codegen compiles
            // ONCE for the whole training run.
            val bridge = org.apache.spark.sql.graftbridge.Bridge
            syms = syms.select(col("cnt"),
              bridge.column(graft.functions.MergeBatchFold(
                bridge.expression(col("syms")),
                batch.toSeq.map(t => (t._1, t._2)))).as("syms"))
              .localCheckpoint(false)
        }
        rounds += 1
        // cand smaller than topN AND nothing accepted → truly no pair
        if (batch.isEmpty) exhausted = true
      }
    }
    (out.toSeq, rounds)
  }

  /** The candidate prefix (l, r, cnt, bound) of a DRIVER-RESIDENT pair
    * table — identical ordering, truncation, and R3 bounds to the
    * one-job collect path, so batch boundaries cannot depend on which
    * path produced the rows. */
  private def candidateRows(
      pc: scala.collection.mutable.HashMap[(String, String), Long],
      topN: Int): Array[org.apache.spark.sql.Row] = {
    val rows = pc.iterator.map { case ((l, r), c) => (l, r, c) }.toArray
    val byRight = rows.groupBy(_._2).map { case (k, v) => k -> v.map(_._3).max }
    val byLeft = rows.groupBy(_._1).map { case (k, v) => k -> v.map(_._3).max }
    rows.sortBy { case (l, r, c) => (-c, l, r) }
      .take(topN)
      .map { case (l, r, c) =>
        org.apache.spark.sql.Row(l, r, c,
          math.max(byRight.getOrElse(l, 0L), byLeft.getOrElse(r, 0L))) }
  }

  /** [[MergeBatchFold]]'s greedy-left single-lookup pass on a plain
    * array (`rules`: left → [expected right, merged token]) — the RDD
    * regime's fold. Returns the INPUT reference when nothing merged, so
    * the delta pass detects untouched words with a pointer compare. */
  private[operators] def foldWord(a: Array[String],
      rules: java.util.HashMap[String, Array[String]]): Array[String] = {
    val n = a.length
    val out = new Array[String](n)
    var m = 0
    var i = 0
    while (i < n) {
      val x = a(i)
      var merged = false
      if (m > 0) {
        val rule = rules.get(out(m - 1))
        if (rule != null && rule(0) == x) {
          out(m - 1) = rule(1)
          merged = true
        }
      }
      if (!merged) { out(m) = x; m += 1 }
      i += 1
    }
    if (m == n) a else java.util.Arrays.copyOf(out, m)
  }

  /** Adjacent-pair occurrence counts of one word's symbol array. */
  private def wordPairCounts(a: Array[String])
      : scala.collection.mutable.HashMap[(String, String), Int] = {
    val h = scala.collection.mutable.HashMap.empty[(String, String), Int]
    var i = 0
    while (i + 1 < a.length) {
      val p = (a(i), a(i + 1))
      h.update(p, h.getOrElse(p, 0) + 1)
      i += 1
    }
    h
  }

  /** Fold one changed word's pair-count deltas into a per-partition
    * accumulator: new pairs at +cnt, old pairs at −cnt. The accumulator
    * is bounded by the partition's touched pair vocabulary, so the
    * driver merge replaces the aggregation exchange outright.
    * Equivalent to `pairCountsOf(new) − pairCountsOf(old)` by
    * construction (the fold changes nothing else), which `verifyDeltas`
    * re-proves per round. */
  private def accumulatePairDeltas(
      acc: scala.collection.mutable.HashMap[(String, String), Long],
      o: Array[String], n: Array[String], c: Long): Unit = {
    val before = wordPairCounts(o)
    val after = wordPairCounts(n)
    (before.keySet ++ after.keySet).foreach { p =>
      val d = (after.getOrElse(p, 0) - before.getOrElse(p, 0)).toLong * c
      if (d != 0L) {
        val nv = acc.getOrElse(p, 0L) + d
        if (nv == 0L) acc.remove(p) else acc.update(p, nv)
      }
    }
  }

  /** Full per-partition pair counts of a (syms, cnt) iterator — the
    * `verifyDeltas` recount's partition leg (driver merges partitions). */
  private def partitionPairCounts(it: Iterator[(Array[String], Long)])
      : Iterator[((String, String), Long)] = {
    val acc = scala.collection.mutable.HashMap.empty[(String, String), Long]
    it.foreach { case (a, c) =>
      wordPairCounts(a).foreach { case (p, k) =>
        acc.update(p, acc.getOrElse(p, 0L) + k.toLong * c)
      }
    }
    acc.iterator
  }

  /** Word tables at or below this many rows train entirely DRIVER-SIDE
    * ([[trainBpeIncremental]]) — the regime split the round cost law
    * demands: rounds never touch the corpus (their input is the
    * saturating word table), so once that table fits one machine the
    * per-round Spark job is pure overhead (TokTrainProbe r18: 0.71–0.77
    * s/round of mostly fixed job cost at 96k words ⇒ ~2.2 h for a 30k
    * vocab). At the limit the table is ~260k (word, cnt) rows — a few
    * MB — and the pair-occurrence index it builds stays well under
    * driver headroom; past it (the true 1e8-word regime) the
    * distributed batched rounds below carry on unchanged. */
  val DriverWordsLimit: Int = 1 << 18

  /** The classic in-memory BPE trainer with INCREMENTAL pair-count
    * maintenance — what industrial single-node trainers do, and the
    * r18-measured answer to the per-round recount: a merge (l, r)
    * perturbs only pairs adjacent to its own occurrences, so each
    * round updates the count table by the DELTAS of the words it
    * touched (found via a pair → words index) instead of re-exploding
    * every word. The argmax is a lazy-deletion heap ordered
    * (cnt desc, left asc, right asc) — entries are (pair, count)
    * snapshots pushed on every count change and validated against the
    * live table on pop, so the popped maximum is exactly the
    * sequential trainer's TakeOrdered argmax (symbols are [a-z0-9]
    * strings, where Java code-unit order ≡ the engines' binary order).
    * Each round then applies the same greedy-left fold as
    * [[applyMerge]] to the affected words only. Result is bit-equal to
    * [[trainBpeMerges]] by construction (same argmax, same fold, same
    * exhaustion rule: stop when no pair remains); the spec pins
    * list-equality to exhaustion and the q162 gate pins the chained-CTE
    * oracle through this path. Cost: O(affected words · word length)
    * per round + heap ops — sub-millisecond rounds at the 96k-word
    * table where the distributed round paid 0.7 s of job overhead. */
  private[operators] def trainBpeIncremental(
      words: Array[(Array[String], Long)],
      nMerges: Int): Seq[(Long, String, String, Long)] = {
    import scala.collection.mutable
    type P = (String, String)
    val syms: Array[Array[String]] = words.map(_._1)
    val cnts: Array[Long] = words.map(_._2)
    val pc = mutable.HashMap.empty[P, Long]
    val occ = mutable.HashMap.empty[P, mutable.Set[Int]]

    def wordPairs(a: Array[String]): mutable.HashMap[P, Int] = {
      val h = mutable.HashMap.empty[P, Int]
      var i = 0
      while (i + 1 < a.length) {
        val p = (a(i), a(i + 1))
        h.update(p, h.getOrElse(p, 0) + 1)
        i += 1
      }
      h
    }

    final case class Entry(cnt: Long, l: String, r: String)
    val pq = new java.util.PriorityQueue[Entry](11,
      new java.util.Comparator[Entry] {
        def compare(a: Entry, b: Entry): Int = {
          val c = java.lang.Long.compare(b.cnt, a.cnt) // count desc
          if (c != 0) c
          else {
            val lc = a.l.compareTo(b.l) // then (left, right) asc
            if (lc != 0) lc else a.r.compareTo(b.r)
          }
        }
      })

    var wi = 0
    while (wi < syms.length) {
      val c = cnts(wi)
      wordPairs(syms(wi)).foreach { case (p, k) =>
        pc.update(p, pc.getOrElse(p, 0L) + k * c)
        occ.getOrElseUpdate(p, mutable.Set.empty) += wi
      }
      wi += 1
    }
    pc.foreach { case ((l, r), c) => pq.add(Entry(c, l, r)) }

    // exactly applyMerge's greedy-left fold; null = word untouched
    def greedyMergeWord(a: Array[String], l: String, r: String,
                        m: String): Array[String] = {
      val out = new mutable.ArrayBuffer[String](a.length)
      var changed = false
      var i = 0
      while (i < a.length) {
        val x = a(i)
        if (out.nonEmpty && out(out.length - 1) == l && x == r) {
          out(out.length - 1) = m
          changed = true
        } else out += x
        i += 1
      }
      if (changed) out.toArray else null
    }

    val res = mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var exhausted = false
    while (res.size < nMerges && !exhausted) {
      var best: Entry = null
      while (best == null && !pq.isEmpty) {
        val e = pq.poll()
        if (pc.getOrElse((e.l, e.r), 0L) == e.cnt) best = e // else stale
      }
      if (best == null) exhausted = true
      else {
        val (l, r, c) = (best.l, best.r, best.cnt)
        res += ((res.size.toLong, l, r, c))
        val m = l + r
        val affected = occ.getOrElse((l, r), mutable.Set.empty).toArray
        var j = 0
        while (j < affected.length) {
          val w = affected(j)
          val nw = greedyMergeWord(syms(w), l, r, m)
          if (nw != null) {
            val c0 = cnts(w)
            val before = wordPairs(syms(w))
            val after = wordPairs(nw)
            (before.keySet ++ after.keySet).foreach { p =>
              val bk = before.getOrElse(p, 0)
              val ak = after.getOrElse(p, 0)
              if (ak != bk) {
                val nv = pc.getOrElse(p, 0L) + (ak - bk).toLong * c0
                if (nv <= 0L) pc.remove(p)
                else { pc.update(p, nv); pq.add(Entry(nv, p._1, p._2)) }
              }
              if (bk > 0 && ak == 0) occ.get(p).foreach(_ -= w)
              else if (bk == 0 && ak > 0)
                occ.getOrElseUpdate(p, mutable.Set.empty) += w
            }
            syms(w) = nw
          }
          j += 1
        }
      }
    }
    res.toSeq
  }

  /** Per-symbol unigram counts over a (word, cnt, syms) table:
    * (s, ucnt) — symbol-vocabulary sized. */
  private[graft] def symbolCountsOf(syms: DataFrame): DataFrame =
    syms.select(col("cnt"), explode(col("syms")).as("s"))
      .groupBy("s").agg(sum(col("cnt")).as("ucnt"))

  /** Fixed-point quantization scale for the WordPiece score (shared
    * verbatim with the oracle's HUGEINT arithmetic). */
  val WpScale = 1000000000000L // 10^12

  /** Pair-count tables at or below this many rows collect WHOLE per
    * round ([[trainBpeMergesBatched]]'s one-job fast path — ~6 MB of
    * (l, r, cnt) rows at the limit). The pair vocabulary saturates with
    * the word vocabulary, so even 1e8-word corpora usually sit under
    * it; the limit+1 collect detects the exception and falls back to
    * the distributed bound computation. */
  val CollectPairsLimit: Int = 1 << 17

  /** WordPiece-objective training: per round the merged pair maximizes
    * `count(pair) / (count(left) · count(right))` — the likelihood-gain
    * score of the WordPiece trainer — instead of the raw pair count BPE
    * uses. Same machinery otherwise: pair-vocabulary-sized aggregation,
    * 1-row TakeOrdered argmax, narrow greedy-left refold, lineage cut
    * per round; the extra cost is one symbol-vocabulary-sized unigram
    * count broadcast-joined onto the pair table (twice, once per side).
    *
    * The argmax is FIXED-POINT EXACT, the repo-wide determinism
    * pattern: `score_q = trunc(cnt · 10^12 / (ucnt_l · ucnt_r))`
    * computed with Decimal(38,0) integral division (`div`), which the
    * oracle reproduces with HUGEINT `//` — exact for counts up to 1e12
    * a side (10^12·10^12 = 10^24 ≪ 10^38), far past any corpus this
    * trains on. Two pairs whose true scores differ by < 10^-12 relative
    * quantize equal and fall to the (left, right) lexicographic
    * tie-break — deterministic in both engines. The continuation-prefix
    * (`##`) decoration of finished WordPiece vocabularies is a
    * rendering concern downstream of merge learning; the learned merge
    * list is the model artifact here, as in [[trainBpeMerges]].
    * Returns (rank, left, right, cnt, score_q) in rank order. */
  def trainWordPieceMerges(wc: DataFrame, nMerges: Int): Seq[(Long, String, String, Long, Long)] = {
    var syms = withSyms(wc).localCheckpoint(false)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long, Long)]
    var k = 0
    var exhausted = false
    while (k < nMerges && !exhausted) {
      val uc = symbolCountsOf(syms)
      val best = pairCountsOf(syms)
        .join(broadcast(uc.select(col("s").as("l"), col("ucnt").as("ul"))), "l")
        .join(broadcast(uc.select(col("s").as("r"), col("ucnt").as("ur"))), "r")
        .withColumn("score_q", expr(
          s"CAST((CAST(cnt AS DECIMAL(38,0)) * $WpScale) DIV " +
            "(CAST(ul AS DECIMAL(38,0)) * CAST(ur AS DECIMAL(38,0))) AS BIGINT)"))
        .orderBy(col("score_q").desc, col("l").asc, col("r").asc)
        .limit(1).select("l", "r", "cnt", "score_q").collect()
      if (best.isEmpty) exhausted = true
      else {
        val b = best(0)
        val (l, r, c, q) = (b.getString(0), b.getString(1), b.getLong(2), b.getLong(3))
        out += ((k.toLong, l, r, c, q))
        syms = syms.select(col("word"), col("cnt"),
          applyMerge(col("syms"), l, r).as("syms")).localCheckpoint(false)
      }
      k += 1
    }
    out.toSeq
  }

  /** Corpus token counts under a WordPiece-learned vocabulary:
    * train + segment + count composed ([[bpeTokenCounts]]'s twin). */
  def wordPieceTokenCounts(df: DataFrame, textCol: String, nMerges: Int): DataFrame = {
    val wc = wordCounts(df, textCol).localCheckpoint(false)
    val merges = trainWordPieceMerges(wc, nMerges)
    segmentWords(wc, merges.map(m => (m._2, m._3)))
      .select(explode(col("syms")).as("token"), col("cnt"))
      .groupBy("token").agg(sum(col("cnt")).as("total"))
  }

  /** Segment a (word, cnt) table with an ordered merge list — narrow,
    * zero shuffle: the merges are plan literals (the trained artifact
    * is vocabulary-sized, it ships in the plan like a broadcast bank). */
  def segmentWords(wc: DataFrame, merges: Seq[(String, String)]): DataFrame =
    merges.foldLeft(withSyms(wc)) { case (d, (l, r)) =>
      d.select(col("word"), col("cnt"), applyMerge(col("syms"), l, r).as("syms"))
    }

  /** The word table's distinct single characters — the base alphabet a
    * trained tokenizer's vocab starts from. Bounded by the normalizer's
    * charset ([a-z0-9] → ≤ 36 rows), so the collect is constant-size. */
  def alphabetOf(wc: DataFrame): Seq[String] =
    wc.select(explode(split(col("word"), "")).as("ch"))
      .filter(col("ch") =!= "").distinct()
      .collect().map(_.getString(0)).sorted.toSeq

  /** Serialize a learned merge list as an HF-format `tokenizer.json`
    * (model.type=BPE) — the artifact the reference CONSUMES
    * (/root/reference/src/common.rs:57-157 hands tokenizer.json to the
    * tokenizers runtime), closing the loop: train here, load with
    * [[graft.model.Bpe.fromTokenizerJson]] (or the reference itself).
    * Vocab ids are deterministic — alphabet symbols sorted ascending,
    * then merge products in rank order, the HF convention.
    *
    * The exported list encodes IDENTICALLY under rank-priority
    * `merge_all` (what [[graft.model.BpeModel.tokenizeWord]] and the
    * tokenizers crate run) and under this trainer's sequential
    * greedy-left rounds: a TRAINED list's ranks respect symbol-creation
    * order, so applying rank k can never surface a not-yet-applied
    * lower-rank pair — the spec pins the round trip. WordPiece-trained
    * merge lists export through the same function (the merge list IS
    * the artifact; only the training-time argmax differed). */
  def exportTokenizerJson(alphabet: Seq[String],
                          merges: Seq[(String, String)]): Array[Byte] = {
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val pieces = alphabet ++ merges.map { case (l, r) => l + r }
    val vocab = pieces.zipWithIndex
      .map { case (p, i) => s""""${esc(p)}": $i""" }.mkString(", ")
    val mergeLines = merges
      .map { case (l, r) => s""""${esc(l)} ${esc(r)}"""" }.mkString(", ")
    s"""{"model": {"type": "BPE", "vocab": {$vocab}, "merges": [$mergeLines]}}"""
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
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
