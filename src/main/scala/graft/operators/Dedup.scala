package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{K, Kernel}

/** Deduplication family for training-data pipelines. Detectors at distinct
  * cost/recall points, all shuffle-minimal by design:
  *
  *  - exact: hash-groupBy on normalized text (one shuffle on a 16-byte key)
  *  - minhashLsh: shingle → minhash → band → bucket join (shuffles only
  *    band signatures; candidate verification touches only bucket
  *    collisions — the classic MMDS construction)
  *  - simhash: 32-bit signature + banded hamming join (pigeonhole)
  *  - ngramJaccard: exact token-set Jaccard — the exact baseline
  *  - embedding-cosine near-dup lives in Similarity.annLshJoin
  *
  * Every reduction is MIN/MAX/COUNT over exact integers, so results are
  * independent of partitioning and match the DuckDB oracle bit-for-bit.
  */
object Dedup {

  /** Exact dedup on normalized text: md5 group key (Spark and DuckDB both
    * implement standard MD5 over UTF-8). One row per distinct text with
    * the surviving (minimum) id and the duplicate count. Normalization is
    * the one-pass native [[graft.functions.TextNorm]]; [[exactHof]] keeps
    * the HOF formulation the oracle mirrors. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bridge = org.apache.spark.sql.graftbridge.Bridge
    val norm = bridge.column(
      graft.functions.TextNorm(bridge.expression(col(textCol)), Nil))("norm")
    df.withColumn("__h", md5(norm))
      .groupBy(col("__h").as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))
  }

  /** HOF formulation of [[exact]] (interpreted regexp+split chain). */
  def exactHof(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val norm = concat_ws(" ", Kernel.tokens(col(textCol)))
    df.withColumn("__h", md5(norm))
      .groupBy(col("__h").as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))
  }

  /** Word `n`-gram shingle ids: fold of the n token ids mod M — one
    * native rolling pass ([[graft.functions.Shingles]]); [[shinglesHof]]
    * keeps the HOF formulation the oracle mirrors. Callers must filter
    * size ≥ n (both forms; the HOF misbehaves below that via descending
    * `sequence`). */
  def shingles(tids: Column, n: Int): Column = {
    val bridge = org.apache.spark.sql.graftbridge.Bridge
    bridge.column(graft.functions.Shingles(bridge.expression(tids), n))
  }

  /** HOF formulation of [[shingles]] (interpreted fold per window). */
  def shinglesHof(tids: Column, n: Int): Column = {
    val idx = sequence(lit(0), size(tids) - lit(n))
    transform(idx, p =>
      aggregate(slice(tids, p + 1, lit(n)), lit(0L), (a, t) => (a * lit(31L) + t) % lit(K.M)))
  }

  /** (id, shingle) exploded, distinct. */
  def shingleSet(df: DataFrame, idCol: String, textCol: String, n: Int = 3,
                 maxLength: Int = K.MaxLength): DataFrame =
    df.select(col(idCol), Kernel.tokenIds(col(textCol), maxLength).as("__tids"))
      .filter(size(col("__tids")) >= n)
      .select(col(idCol), explode(shingles(col("__tids"), n)).as("shingle"))
      .distinct()

  /** Universal-hash family for minhash: h_i(x) = (x*a_i + b_i) % P32. */
  def minhashPerm(i: Int): (Long, Long) =
    (((2L * i + 1L) * K.B) % K.P32, (i.toLong * K.C) % K.P32)

  /** MinHash signatures: `numHashes` mins per id over the shingle set
    * (map-side partial min → tiny shuffle). Output: (id, m0..m{n-1}). */
  def minhashSignatures(shingleDf: DataFrame, idCol: String,
                        numHashes: Int = 16): DataFrame = {
    val mins = (0 until numHashes).map { i =>
      val (a, b) = minhashPerm(i)
      min((col("shingle") * lit(a) + lit(b)) % lit(K.P32)).as(s"m$i")
    }
    shingleDf.groupBy(col(idCol)).agg(mins.head, mins.tail: _*)
  }

  /** Band key: fold of a band's minhash values into one bigint — the ONE
    * definition both the relational and narrow candidate paths (and, via
    * constants, the SQL oracle's bandKeySql) must share. */
  private[operators] def bandKeyFold(ms: Seq[Column]): Column =
    ms.foldLeft(lit(0L): Column)((a, m) => (a * lit(1000003L) + m) % lit(911382323007L))

  /** Skew guard shared by the candidate paths: drop (band, key) buckets
    * holding more than `maxBucketSize` docs — a hub bucket is
    * non-discriminative and would self-join quadratically; its true
    * near-dup pairs almost always recur in a smaller bucket of another
    * band (the standard MinHash hub-shingle mitigation). */
  private[operators] def capBuckets(banded: DataFrame, maxBucketSize: Int): DataFrame =
    if (maxBucketSize == Int.MaxValue) banded
    else {
      val ok = banded.groupBy(col("band"), col("key"))
        .agg(count(lit(1)).as("__n"))
        .filter(col("__n") <= maxBucketSize)
        .select(col("band"), col("key"))
      banded.join(ok, Seq("band", "key"))
    }

  /** LSH candidate pairs: signature split into `bands` bands of
    * `rowsPerBand` minhashes; a pair is a candidate iff some band key
    * agrees exactly. Self-join is on (band, key) — only bucket
    * collisions are compared. Default = uncapped (exact MMDS). */
  def lshCandidates(sigs: DataFrame, idCol: String,
                    bands: Int = 4, rowsPerBand: Int = 4,
                    maxBucketSize: Int = Int.MaxValue): DataFrame = {
    val bandKey: Int => Column = b =>
      bandKeyFold((b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"m$i")))
    val banded = sigs.select(
      col(idCol),
      posexplode(array((0 until bands).map(bandKey): _*)).as(Seq("band", "key")))
    val guarded = capBuckets(banded, maxBucketSize)
    val l = guarded.select(col(idCol).as("id_a"), col("band"), col("key"))
    val r = guarded.select(col(idCol).as("id_b"), col("band"), col("key"))
    l.join(r, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
  }

  /** Scale-safe default for the LSH hub-bucket cap: a band bucket holding
    * more than this many docs is treated as non-discriminative (a hub
    * signature) and skipped — its true near-dups almost always recur in a
    * smaller bucket of another band. 10k bounds the worst within-bucket
    * self-join at ~5·10⁷ comparisons per hub instead of quadratic blowup. */
  val DefaultMaxBucketSize: Int = 10000

  /** Default round budget for [[duplicateClusters]]. The min-seeded
    * doubling recurrence closes ascending chains of diameter 2^k by
    * round k, so 5 rounds close 32-hop chains. The SQL oracle (which
    * seeds at identity instead of min(own, neighbors)) must run exactly
    * ONE more round to match: impl@k ≡ oracle@(k+1) — OracleSql derives
    * its count from this constant. */
  val DefaultClusterIterations: Int = 5

  /** NARROW minhash signatures: (id, m0..m{n-1}) computed per-row by the
    * native [[graft.functions.MinhashSigs]] kernel over the in-row
    * shingle array — no explode, no exchange (duplicates in the array
    * cannot change a min, so the values equal the relational
    * explode→distinct→groupBy-min formulation of [[minhashSignatures]],
    * which stays as the oracle-mirrored cross-check). Docs with fewer
    * than `n` tokens are dropped, like [[shingleSet]]. */
  def minhashSignaturesNarrow(df: DataFrame, idCol: String, textCol: String,
                              n: Int = 3, numHashes: Int = 16,
                              maxLength: Int = K.MaxLength): DataFrame =
    withSigArray(
      df.select(col(idCol), Kernel.tokenIds(col(textCol), maxLength).as("__tids"))
        .filter(size(col("__tids")) >= n),
      n, numHashes)
      .select(col(idCol) +:
        (0 until numHashes).map(i => element_at(col("__sig"), i + 1).as(s"m$i")): _*)

  /** Adds `__sig: array<bigint>` (the minhash signature) to a frame that
    * carries `__tids`. */
  private[operators] def withSigArray(base: DataFrame, n: Int, numHashes: Int): DataFrame = {
    val bridge = org.apache.spark.sql.graftbridge.Bridge
    val perms = (0 until numHashes).map(minhashPerm)
    base.withColumn("__sig", bridge.column(graft.functions.MinhashSigs(
      bridge.expression(shingles(col("__tids"), n)),
      perms.map(_._1).toArray, perms.map(_._2).toArray)))
  }

  /** End-to-end MinHash+LSH near-dup pairs with exact-Jaccard verification:
    * (id_a, id_b, jaccard) for pairs whose shingle-set Jaccard ≥ threshold.
    *
    * 100 TB shape (this is the pipeline's hot path): signatures are
    * NARROW (native per-row kernel — the corpus itself never shuffles);
    * the only full-corpus exchange carries `bands` small rows per doc
    * for the band self-join; and the exact-Jaccard verification explodes
    * shingles ONLY for candidate docs (left-semi join on the candidate
    * id set, which is orders of magnitude smaller than the corpus).
    * The previous formulation shuffled the entire corpus's distinct
    * shingle set twice before any candidate existed.
    *
    * `maxBucketSize` (default [[DefaultMaxBucketSize]]) caps hub buckets —
    * pass `Int.MaxValue` for exact uncapped MMDS semantics. The cap is
    * mirrored in the DuckDB oracle, so the gate checks the capped form. */
  def minhashNearDups(df: DataFrame, idCol: String, textCol: String,
                      threshold: Double, n: Int = 3, numHashes: Int = 16,
                      bands: Int = 4,
                      maxBucketSize: Int = DefaultMaxBucketSize): DataFrame = {
    val rpb = numHashes / bands
    val base = df.select(col(idCol), Kernel.tokenIds(col(textCol)).as("__tids"))
      .filter(size(col("__tids")) >= n)
    val sigs = withSigArray(base, n, numHashes).select(col(idCol), col("__sig"))
    // band key: the shared fold, over sig-array elements here
    val bandKey: Int => Column = b =>
      bandKeyFold((b * rpb until (b + 1) * rpb).map(i => element_at(col("__sig"), i + 1)))
    // ONE explicit small exchange (bands rows per doc: id+band+key) on
    // the join key: the cap aggregation, the left side, and the right
    // side of the self-join all reuse this exchange (ReuseExchange),
    // so the narrow tokenize+signature pipeline below it runs exactly
    // once — and the self-join needs no further shuffle.
    val banded = sigs.select(
      col(idCol),
      posexplode(array((0 until bands).map(bandKey): _*)).as(Seq("band", "key")))
      .repartition(col("band"), col("key"))
    val guarded = capBuckets(banded, maxBucketSize)
    val l = guarded.select(col(idCol).as("id_a"), col("band"), col("key"))
    val r = guarded.select(col(idCol).as("id_b"), col("band"), col("key"))
    // LAZY localCheckpoint: the candidate set is referenced by the
    // verification join AND (twice, via the id semi-join) by the
    // candidate-shingle build — without a lineage cut the band self-join
    // would re-run once per reference. Lazy = materialized on the first
    // action, no eager job at plan-build time; candidates are pair-rare
    // by construction, so the materialized set stays tiny at any scale.
    val cands = l.join(r, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
      .localCheckpoint(false)
    // verification shingles: candidate docs only (semi join), per-row
    // distinct (array_distinct) so no corpus-wide distinct shuffle;
    // checkpointed for the same reason (3 references in jaccardOnPairs)
    val candIds = cands.select(col("id_a").as(idCol))
      .union(cands.select(col("id_b").as(idCol)))
      .distinct()
    val shCand = base.join(candIds, Seq(idCol), "left_semi")
      .select(col(idCol),
        explode(array_distinct(shingles(col("__tids"), n))).as("shingle"))
      .localCheckpoint(false)
    jaccardOnPairs(cands, shCand, idCol, threshold)
  }

  /** Exact Jaccard over (id, shingle) sets for given candidate pairs. */
  def jaccardOnPairs(candidates: DataFrame, shingleDf: DataFrame,
                     idCol: String, threshold: Double): DataFrame = {
    val setCol = shingleDf.columns.filter(_ != idCol).head
    val sizes = shingleDf.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val sa = shingleDf.select(col(idCol).as("id_a"), col(setCol))
    val sb = shingleDf.select(col(idCol).as("id_b"), col(setCol))
    val interCnt = candidates.join(sa, "id_a").join(sb, Seq("id_b", setCol))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("inter"))
    interCnt
      .join(sizes.select(col(idCol).as("id_a"), col("sz").as("sz_a")), "id_a")
      .join(sizes.select(col(idCol).as("id_b"), col("sz").as("sz_b")), "id_b")
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("sz_a") + col("sz_b") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Per-(token, bit) pseudo-random ±1 vote. */
  private def voteBit(t: Column, b: Column): Column =
    when(((t * lit(K.A2) + b * lit(K.B2) + lit(K.C2)) % lit(K.M)) % lit(2L) === lit(1L),
      lit(1L)).otherwise(lit(-1L))

  /** SimHash signature per doc: bit b set iff Σ_tokens vote > 0,
    * assembled acc*2 + bit over bits high→low. Default 60 bits — the
    * scale-safe form (60/4 banding = 131k buckets/band, and 60 keeps the
    * acc*2+bit fold inside positive signed-64 range for the SQL oracle);
    * pass bits=32 for the compact legacy signature (q14/q15 oracles).
    * Native expression on the hot path; [[simhashSigHof]] is the HOF
    * formulation the oracle mirrors (identical exact integer votes —
    * spec-asserted). */
  def simhash(df: DataFrame, idCol: String, textCol: String,
              bits: Int = 60, maxLength: Int = K.MaxLength): DataFrame =
    df.withColumn("__tids", Kernel.tokenIds(col(textCol), maxLength))
      .filter(size(col("__tids")) > 0)
      .withColumn("simhash",
        org.apache.spark.sql.graftbridge.Bridge.column(
          graft.functions.SimhashSig(
            org.apache.spark.sql.graftbridge.Bridge.expression(col("__tids")), bits)))
      .select(col(idCol), col("simhash"))

  /** HOF formulation of the SimHash signature over a token-id array
    * column: one fold over tokens accumulating all bit-votes (tokens-outer
    * so upstream expressions evaluate once), then a fold over
    * reverse(votes) assembles the signature — NOT an index loop
    * referencing the votes column inside a lambda, which Catalyst would
    * inline and re-evaluate per bit. */
  def simhashSigHof(tids: Column, bits: Int = 32): Column = {
    val votes = aggregate(
      tids,
      array_repeat(lit(0L), bits),
      (acc, t) => zip_with(acc, sequence(lit(0L), lit(bits - 1L)), (v, b) => v + voteBit(t, b)))
    aggregate(
      reverse(votes),
      lit(0L),
      (acc, v) => acc * lit(2L) + when(v > 0, lit(1L)).otherwise(lit(0L)))
  }

  /** Near-dup pairs by hamming distance ≤ maxDist over `bands` banded
    * chunks of a `bits`-wide signature (pigeonhole: dist ≤ bands-1 ⇒ at
    * least one band equal). Scale note: the bucket count is
    * bands·2^(bits/bands) and the within-bucket self-join is quadratic in
    * bucket size — 32/4 (8-bit keys, 1,024 buckets) is only safe for
    * small corpora; the default 60/4 (15-bit keys, 131k buckets; 60
    * keeps the acc*2+bit signature fold inside positive signed-64 range
    * for the SQL oracle) scales bucket occupancy down with corpus
    * size. `bits` must match the signature width of `sigs`. */
  /** End-to-end text → simhash near-dup pairs with CONSISTENT signature
    * width: computes the signatures itself, so `bits` cannot drift from
    * the sig column's actual width (feeding 32-bit sigs to a 60-bit
    * banding would collapse the high bands into one all-zero hub
    * bucket). Prefer this over composing [[simhash]]+[[simhashNearDups]]
    * by hand. */
  def simhashNearDupsText(df: DataFrame, idCol: String, textCol: String,
                          maxDist: Int = 3, bits: Int = 60,
                          bands: Int = 4,
                          maxLength: Int = K.MaxLength,
                          maxBucketSize: Int = Int.MaxValue): DataFrame =
    simhashNearDups(simhash(df, idCol, textCol, bits, maxLength),
      idCol, maxDist, bits, bands, maxBucketSize)

  /** `maxBucketSize` is the same hub-bucket cap as [[lshCandidates]]'s
    * (skip non-discriminative band buckets; true near-dups almost
    * always recur in a smaller bucket of another band). It matters
    * MORE here than for minhash when signatures concentrate: a corpus
    * with a small type vocabulary (or heavy boilerplate) collapses
    * many docs onto few signatures, and a single hub band-key's
    * self-join is quadratic in its occupancy — measured on the 50k-doc
    * scale corpus, the top bucket held 5,373 docs and the uncapped
    * candidate stream was ~1.1·10⁸ pairs, ~2/3 of it from the ten
    * largest buckets. Default unlimited = exact pigeonhole semantics
    * (q15/q15b); the capped form is gated separately (q15c). */
  def simhashNearDups(sigs: DataFrame, idCol: String,
                      maxDist: Int = 3, bits: Int = 60,
                      bands: Int = 4,
                      maxBucketSize: Int = Int.MaxValue): DataFrame = {
    val bandBits = bits / bands
    val bandCols = (0 until bands).map(b =>
      struct(lit(b).as("band"),
        (shiftrightunsigned(col("simhash"), b * bandBits) % lit(1L << bandBits)).as("key")))
    val banded0 = sigs.select(col(idCol), col("simhash"),
      explode(array(bandCols: _*)).as("bk"))
      .select(col(idCol), col("simhash"), col("bk.band").as("band"), col("bk.key").as("key"))
    val banded = capBuckets(banded0, maxBucketSize)
    val l = banded.select(col(idCol).as("id_a"), col("simhash").as("sig_a"), col("band"), col("key"))
    val r = banded.select(col(idCol).as("id_b"), col("simhash").as("sig_b"), col("band"), col("key"))
    l.join(r, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      // hamming BEFORE distinct: identical result (hamming is a function
      // of the pair), but the dedup exchange then carries only true
      // near-dup pairs instead of every band-collision candidate — at
      // 10x corpus the candidate stream grows ~quadratically with bucket
      // occupancy while the near-dup result grows ~linearly, so the
      // other order shuffles the quadratic term
      .filter(col("hamming") <= maxDist)
      .distinct()
  }

  /** Duplicate-cluster labeling: connected components of the near-dup
    * pair graph by min-label propagation WITH POINTER DOUBLING — every
    * doc in a duplicate group gets the group's smallest id as `cluster`.
    * Labels SEED at min(own id, neighbor ids) — one aggregate over the
    * edge list, no join — then each round takes the min over three
    * candidate sets: the node's own label, its neighbors' labels (1-hop
    * propagation), and its label's label (path doubling — labels are
    * always node ids, so l(l(v)) is a valid lookup). The doubling term
    * makes the closed chain length grow exponentially: from the seeded
    * 1-hop start, round k closes ascending chains of diameter 2^k
    * (2, 4, 8, …), so the default 5 rounds close 32-hop chains where
    * the same budget of plain propagation closed only 6 — spec-checked
    * on a 30-hop chain fixture.
    *
    * Runs EXACTLY `iterations` rounds (not to convergence) so the result
    * is a pure function of the input — deterministic and oracle-able;
    * raise `iterations` for pathological graphs. Each round is ONE
    * equi-join + one min-aggregate over the PAIR GRAPH (tiny relative
    * to the corpus), never over the corpus itself: the 1-hop and
    * pointer-doubling lookups share a single probe of the label table —
    * probe rows (key=s, out=d) from the edge list ask "label of my
    * neighbor", probe rows (key=cluster, out=id) from the label table
    * ask "label of my label"; both answers are min-merged with the
    * node's own label. Candidate sets per round are identical to the
    * two-join formulation at half the join stages, and each round is a
    * full cluster-wide barrier — at 1000-executor scale the round count
    * is the latency floor, which is why the seed (a free round: it
    * rides the aggregate that builds the node set anyway) is worth one
    * whole barrier. */
  def duplicateClusters(pairs: DataFrame,
                        iterations: Int = DefaultClusterIterations,
                        checkpointEvery: Int = 1): DataFrame = {
    require(checkpointEvery > 0,
      s"checkpointEvery must be positive (got $checkpointEvery); lineage must be cut " +
        "periodically or the per-round plan tree grows exponentially")
    // localCheckpoint per round: labels is referenced three times per
    // round, so without a LINEAGE cut every round multiplies the
    // logical plan — exponentially many copies of the pair-graph
    // computation (a cache alone still carries the exponential logical
    // tree and can OOM the driver during analysis). The checkpoint
    // materializes each round's tiny label table and restarts the plan
    // from it — the standard Spark shape for iterative graph algorithms.
    val edges = pairs.select(col("id_a").as("s"), col("id_b").as("d"))
      .union(pairs.select(col("id_b").as("s"), col("id_a").as("d")))
      .localCheckpoint()
    // the REAL edge size (the eager checkpoint captured actual stats):
    // the constant estimate every label cut below is stamped with
    val edgeSize = edges.queryExecution.optimizedPlan.stats.sizeInBytes
    var labels = edges.groupBy(col("s")).agg(min(col("d")).as("__mn"))
      .select(col("s").as("id"), least(col("s"), col("__mn")).as("cluster"))
    for (i <- 1 to iterations) {
      val probe = edges.select(col("s").as("key"), col("d").as("out"))
        .union(labels.select(col("cluster").as("key"), col("id").as("out")))
      val looked = probe.join(labels, probe("key") === labels("id"))
        .select(col("out").as("id"), col("cluster"))
      labels = labels.union(looked)
        .groupBy(col("id")).agg(min(col("cluster")).as("cluster"))
      // LAZY checkpoint: the logical plan is cut immediately (the round
      // tree is replaced by a LogicalRDD), but no per-round job fires —
      // all rounds execute as one job chain at the final action, and the
      // checkpoint blocks still materialize once despite the three
      // references per round. Eager checkpoints here cost a scheduled
      // job per round, which dominated wall time on small label tables.
      // `checkpointEvery` trades plan-tree growth against cut count.
      // The r19 A/B settled it: since the cuts are lazy (blocks
      // materialize inside the final action, no scheduled round jobs),
      // an uncut round saves nothing and its 3 label references
      // re-derive the round plan — every-round cuts measured 0.70–0.85×
      // of every-2 on the 12-round clustering gates, and every-4 ran
      // 1.25–1.66× (OPTIMIZATION_r19.md). All callers now use the
      // default 1; labels are identical at any cadence.
      // replaceOriginStats: the cut snapshots the round plan's
      // Statistics, and this loop's self-join SQUARES sizeInBytes every
      // round — a BigInt whose bit length doubles per cut (measured:
      // 19 → 147M bits in 24 rounds; java.math.BigInteger overflows at
      // ~31 cuts, and the giant-number arithmetic costs real per-round
      // time well before). Stamping each cut with the CONSTANT edge
      // size keeps static planning exactly as healthy early rounds had
      // it (labels ≤ the doubled edge list's endpoints, so a small
      // graph keeps its broadcast round joins and a 100 TB one keeps
      // shuffling) while the estimate no longer compounds.
      if (i % checkpointEvery == 0 || i == iterations)
        labels = org.apache.spark.sql.graftbridge.Bridge
          .replaceOriginStats(labels.localCheckpoint(false), Some(edgeSize))
    }
    labels
  }

  /** [[duplicateClusters]] run TO THE FIXPOINT with early exit — the
    * production form when the round count, not per-round volume, is
    * the latency floor (each round is a cluster-wide barrier; the
    * gated queries burn a fixed 12 so the DuckDB oracle can mirror
    * them, which overshoots graphs that converge in 6 and would
    * under-shoot a pathological one). Convergence is detected from the
    * label-sum invariant: every node's label is non-increasing round
    * over round (it is a min over candidate sets that include the
    * current label), so the label SUM strictly decreases until — and
    * only until — the fixpoint; an unchanged sum between two checks
    * means no node moved in between, i.e. both checkpoints already ARE
    * the fixpoint. The sum is taken as decimal(38,0), exact for any
    * realistic id space, so equality is never an overflow artifact.
    *
    * Each check rides an EAGER localCheckpoint (the periodic lineage
    * cut the loop needs anyway) plus one count-star-sized aggregate of
    * the label table — per check, one extra tiny job on the critical
    * path, bought against `checkEvery` whole barrier rounds skipped
    * once converged. The result is still a pure function of the input:
    * the fixpoint is unique (it does not depend on when the loop
    * detects it), and equals [[duplicateClusters]] at any sufficient
    * iteration budget — spec-gated on the chain fixture and the real
    * ANN graph. `maxIterations` (default 64: pointer doubling closes
    * 2^64-hop chains — any graph) only bounds the pathological case. */
  def duplicateClustersConverged(pairs: DataFrame,
                                 maxIterations: Int = 64,
                                 checkEvery: Int = 3): DataFrame = {
    require(maxIterations >= 1 && checkEvery >= 1,
      s"need maxIterations >= 1 and checkEvery >= 1 (got $maxIterations, $checkEvery)")
    val edges = pairs.select(col("id_a").as("s"), col("id_b").as("d"))
      .union(pairs.select(col("id_b").as("s"), col("id_a").as("d")))
      .localCheckpoint()
    // constant stats estimate for the label cuts (see duplicateClusters)
    val edgeSize = edges.queryExecution.optimizedPlan.stats.sizeInBytes
    var labels = edges.groupBy(col("s")).agg(min(col("d")).as("__mn"))
      .select(col("s").as("id"), least(col("s"), col("__mn")).as("cluster"))
    var prevSum: Option[java.math.BigDecimal] = None
    var i = 1
    var converged = false
    while (i <= maxIterations && !converged) {
      val probe = edges.select(col("s").as("key"), col("d").as("out"))
        .union(labels.select(col("cluster").as("key"), col("id").as("out")))
      val looked = probe.join(labels, probe("key") === labels("id"))
        .select(col("out").as("id"), col("cluster"))
      labels = labels.union(looked)
        .groupBy(col("id")).agg(min(col("cluster")).as("cluster"))
      if (i % checkEvery == 0 || i == maxIterations) {
        // eager: materialize once, agg reads blocks; replaceOriginStats
        // as in [[duplicateClusters]] — without it the self-join stats
        // double per cut and a deep graph overflows BigInteger
        labels = org.apache.spark.sql.graftbridge.Bridge
          .replaceOriginStats(labels.localCheckpoint(), Some(edgeSize))
        val s = Option(labels
          .agg(sum(col("cluster").cast(org.apache.spark.sql.types.DecimalType(38, 0))))
          .head().getDecimal(0))
        // compareTo, not equals: BigDecimal.equals is scale-sensitive
        // (1E+2 != 100). Both sides come from the same decimal(38,0)
        // agg today, so scales match — but numeric equality keeps the
        // invariant robust to any future cast change.
        val same = (prevSum, s) match {
          case (Some(p), Some(c)) => p.compareTo(c) == 0
          case (None, None)       => true
          case _                  => false
        }
        if (same) converged = true else prevSum = s
      }
      i += 1
    }
    labels
  }

  /** Exact repeated token spans — the substring-level dedup signal of
    * the suffix-array method (Lee et al., "Deduplicating Training Data
    * Makes Language Models Better", arXiv:2107.06499) re-expressed
    * relationally: every position of every length-`n` token window
    * whose span hash occurs in MORE THAN ONE document. A splice pass
    * would cut these [pos, pos+n) ranges; downstream of this operator
    * that is a narrow per-doc transform. Output
    * (idCol, pos, shingle, span_docs).
    *
    * Scale shape: span hashing is the narrow native [[shingles]]
    * kernel; the df aggregation is single-key partial (skew-free — a
    * boilerplate span that occurs a million times still reduces
    * map-side); flagging is an equi-join on the span hash back to the
    * position stream — no corpus self-join and no per-span group
    * materialization (a hub span never gathers its occurrence list in
    * one task). The tokenized frame carries a LAZY lineage cut, so the
    * corpus tokenizes ONCE even though the position stream is derived
    * twice (stats + flag join) — the explode re-runs narrowly from the
    * materialized token arrays, which is the right trade at 100 TB:
    * checkpointing the exploded position stream itself would store a
    * corpus-sized intermediate. */
  def repeatedSpans(df: DataFrame, idCol: String, textCol: String,
                    n: Int = 8, maxLength: Int = K.MaxLength): DataFrame =
    repeatedSpansTokens(
      df.select(col(idCol), Kernel.tokenIds(col(textCol), maxLength).as("__tids"))
        .localCheckpoint(false),
      idCol, "__tids", n)

  /** [[repeatedSpans]] over a pre-tokenized `(id, tids)` frame. */
  def repeatedSpansTokens(tokens: DataFrame, idCol: String, tidsCol: String,
                          n: Int): DataFrame = {
    val pos = tokens
      .filter(size(col(tidsCol)) >= n)
      .select(col(idCol), posexplode(shingles(col(tidsCol), n)).as(Seq("pos", "shingle")))
    val stats = pos.groupBy(col("shingle"))
      .agg(countDistinct(col(idCol)).as("span_docs"))
      .filter(col("span_docs") > 1)
    pos.join(stats, "shingle")
      .select(col(idCol), col("pos").cast("long").as("pos"),
        col("shingle"), col("span_docs"))
  }

  /** Splice repeated spans OUT of the token stream — the cut step of
    * the suffix-array method (the pass [[repeatedSpans]] flags for):
    * every token covered by a length-`n` window whose span hash occurs
    * in more than one document is dropped; the survivors keep their
    * relative order. Output (idCol, tokens_clean: array<bigint>) — every
    * input doc appears, clean docs unchanged.
    *
    * Scale shape: the corpus tokenizes ONCE — the tokenized frame
    * carries a LAZY lineage cut, and both its consumers (the flag pass
    * inside [[repeatedSpansTokens]] and the final rejoin) read the
    * materialized token arrays instead of re-running the tokenizer.
    * Flagged span STARTS gather per doc (starts are span-hits only —
    * orders of magnitude fewer than tokens; the per-doc array is
    * bounded by doc length) and rejoin the tokenized corpus by doc id —
    * one small-side equi-join, AQE-broadcast when the flag set is
    * small; the starts side carries its own lazy cut so the flag pass
    * materializes once instead of re-running per downstream reference.
    * The cut itself is the native
    * [[graft.functions.SpliceSpans]] two-pointer sweep (token i
    * survives iff no flagged start s has s ≤ i < s+n) — narrow,
    * O(tokens + starts) per row, and mirrored term-for-term (as the
    * equivalent exists-HOF) in the SQL oracle; [[spliceSpansHof]]
    * keeps the HOF formulation as the spec-asserted cross-check. */
  def spliceRepeatedSpans(df: DataFrame, idCol: String, textCol: String,
                          n: Int = 8, maxLength: Int = K.MaxLength): DataFrame = {
    val bridge = org.apache.spark.sql.graftbridge.Bridge
    val toks = df.select(col(idCol), Kernel.tokenIds(col(textCol), maxLength).as("__tids"))
      .localCheckpoint(false)
    val starts = repeatedSpansTokens(toks, idCol, "__tids", n)
      .groupBy(col(idCol))
      .agg(array_sort(collect_set(col("pos"))).as("__starts"))
      .localCheckpoint(false)
    toks.join(starts, Seq(idCol), "left")
      .select(col(idCol),
        when(col("__starts").isNull, col("__tids")).otherwise(
          bridge.column(graft.functions.SpliceSpans(
            bridge.expression(col("__tids")),
            bridge.expression(col("__starts")), n))).as("tokens_clean"))
  }

  /** [[spliceRepeatedSpans]] with the canonical ExactSubstr semantics
    * (Lee et al. 2022, "Deduplicating Training Data Makes Language
    * Models Better"): of every duplicated length-`n` window, the
    * GLOBALLY FIRST occurrence — min (doc, start) packed key — SURVIVES,
    * so the corpus keeps exactly one copy of each duplicated span
    * instead of losing all of them; and duplication counts OCCURRENCES
    * (within-doc repetition cuts too), not distinct docs. The two
    * variants bracket the design space: all-copies-cut (q67) for
    * boilerplate scrubbing, keep-first (this, q156) for training-set
    * dedup where the content itself must survive once.
    *
    * Same scale shape as [[spliceRepeatedSpans]]: one tokenize (lazy
    * cut), one shingle-hash partial-agg shuffle, flagged starts gather
    * per doc and rejoin small-side, the cut is the native two-pointer
    * [[graft.functions.SpliceSpans]]. The packed key needs
    * id·pack + pos injective: ids must stay below 2^63/pack (`pack`
    * defaults to 2^20 ≫ maxLength, leaving ~2^43 ids). */
  def spliceDupSpansKeepFirst(df: DataFrame, idCol: String, textCol: String,
                              n: Int = 8, maxLength: Int = K.MaxLength,
                              pack: Long = 1L << 20): DataFrame = {
    require(maxLength <= pack, s"pack $pack must exceed maxLength $maxLength")
    val bridge = org.apache.spark.sql.graftbridge.Bridge
    val toks = df.select(col(idCol), Kernel.tokenIds(col(textCol), maxLength).as("__tids"))
      .localCheckpoint(false)
    val keyed = toks
      .filter(size(col("__tids")) >= n)
      .select(col(idCol), posexplode(shingles(col("__tids"), n)).as(Seq("pos", "shingle")))
      .select(col(idCol), col("pos").cast("long").as("pos"), col("shingle"),
        (col(idCol).cast("long") * pack + col("pos")).as("__k"))
    val dup = keyed.groupBy(col("shingle"))
      .agg(min(col("__k")).as("__keep"), count(lit(1)).as("__c"))
      .filter(col("__c") >= 2)
    val starts = keyed.join(dup, "shingle")
      .filter(col("__k") =!= col("__keep"))
      .groupBy(col(idCol))
      .agg(array_sort(collect_set(col("pos"))).as("__starts"))
      .localCheckpoint(false)
    toks.join(starts, Seq(idCol), "left")
      .select(col(idCol),
        when(col("__starts").isNull, col("__tids")).otherwise(
          bridge.column(graft.functions.SpliceSpans(
            bridge.expression(col("__tids")),
            bridge.expression(col("__starts")), n))).as("tokens_clean"))
  }

  /** HOF formulation of the [[spliceRepeatedSpans]] cut step over
    * pre-joined (tids, sorted starts) columns — the interpreted
    * O(tokens × starts) form the SQL oracle mirrors; kept as the
    * spec-asserted cross-check for the native two-pointer kernel. */
  def spliceSpansHof(tids: Column, starts: Column, n: Int): Column =
    transform(
      filter(
        zip_with(tids,
          sequence(lit(0L), size(tids).cast("long") - 1),
          (t, i) => struct(t.as("t"), i.as("i"))),
        s => !exists(starts, st => st <= s("i") && s("i") < st + lit(n.toLong))),
      s => s("t"))

  /** Cross-document duplicated-block statistics — the ccnet-style
    * "duplicate chunk" signal at corpus scale: the token stream splits
    * into NON-overlapping width-`w` blocks (the stride-`w` subsample of
    * the length-`w` shingle walk, so the one rolling-hash kernel serves
    * both), each block hash counts distinct docs corpus-wide, and every
    * doc with ≥ 1 block reports (n_blocks, dup_blocks) where dup_blocks
    * are its blocks that also appear in at least one OTHER document.
    * Complements [[graft.operators.TextAnalysis.repetitionStats]]
    * (within-doc repetition) and [[repeatedSpans]] (overlapping spans,
    * position-level): this is the doc-level cross-corpus boilerplate
    * signal a pipeline thresholds — as an exact integer comparison
    * (dup_blocks·den > n_blocks·num), never a float fraction.
    *
    * Scale shape: the corpus tokenizes ONCE (lazy lineage cut shared
    * by the stats and rejoin legs); one partial-agg shuffle on the
    * block hash; the flagged set (blocks in > 1 doc — rare unless the
    * corpus is boilerplate-heavy) rejoins the block walk by hash key,
    * AQE-broadcast when small; the final per-doc count agg is
    * map-side partial. No stage holds more than ≤ len/w rows per doc. */
  def dupBlockStats(df: DataFrame, idCol: String, textCol: String,
                    w: Int = 8, maxLength: Int = K.MaxLength): DataFrame = {
    val toks = df.select(col(idCol), Kernel.tokenIds(col(textCol), maxLength).as("__tids"))
      .localCheckpoint(false)
    val blocks = toks
      .filter(size(col("__tids")) >= w)
      .select(col(idCol), posexplode(shingles(col("__tids"), w)).as(Seq("pos", "block")))
      .filter(col("pos") % w === 0)
    val dup = blocks.groupBy(col("block"))
      .agg(countDistinct(col(idCol)).as("__docs"))
      .filter(col("__docs") > 1)
    blocks.join(dup, Seq("block"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_blocks"),
        count(col("__docs")).as("dup_blocks"))
  }

  /** The filter step over [[dupBlockStats]]: drop docs whose
    * cross-corpus duplicated-block fraction exceeds num/den (exact
    * integer cross-multiplication). Docs too short to form a block
    * survive — they carry no boilerplate evidence. One anti join
    * against the (small) flagged-id set. */
  def dropDupBlockDocs(df: DataFrame, idCol: String, textCol: String,
                       w: Int = 8, num: Int = 1, den: Int = 2): DataFrame =
    df.join(
      dupBlockStats(df, idCol, textCol, w)
        .filter(col("dup_blocks") * den > col("n_blocks") * num)
        .select(col(idCol)),
      Seq(idCol), "left_anti")

  /** Corpus-level dedup — the step a training pipeline actually runs:
    * given near-dup pairs (id_a < id_b), drop every id_b via a left-anti
    * join, keeping the smallest id of each duplicate group that any pair
    * names. One shuffle-side anti join; the pairs side is tiny relative
    * to the corpus, so AQE broadcasts it. */
  def removeNearDups(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame =
    df.join(pairs.select(col("id_b").as(idCol)).distinct(), Seq(idCol), "left_anti")

  /** Eval-set decontamination: training docs that share word n-grams
    * with any eval doc — the standard benchmark-contamination check a
    * training pipeline runs before a data release. One equi-join on the
    * shingle id (shuffles only the shingle sets, never the corpora) →
    * shared-shingle count per (train, eval) pair ≥ minShared. */
  def contamination(train: DataFrame, eval: DataFrame, idCol: String,
                    textCol: String, n: Int = 3,
                    minShared: Long = 1L): DataFrame = {
    val ts = shingleSet(train, idCol, textCol, n)
      .select(col(idCol).as("train_id"), col("shingle"))
    val es = shingleSet(eval, idCol, textCol, n)
      .select(col(idCol).as("eval_id"), col("shingle"))
    ts.join(es, "shingle")
      .groupBy(col("train_id"), col("eval_id"))
      .agg(count(lit(1)).as("shared_shingles"))
      .filter(col("shared_shingles") >= minShared)
  }

  /** Embedding-cosine near-dup pairs: sign-LSH bucket self-join (only
    * same-bucket pairs are scored — the candidate set shrinks
    * ~2^nPlanes-fold) → exact cosine ≥ threshold. The embedding-space
    * member of the dedup family; the bucket count is the scale lever,
    * like [[Similarity.annLshMultiProbe]] — use ≥ 16 planes at scale.
    * `maxBucketSize` caps hub buckets exactly like [[minhashNearDups]]
    * (the within-bucket self-join is quadratic in occupancy); the
    * bucket-size table is ≤ 2^nPlanes rows, so the guard join
    * broadcasts. `Int.MaxValue` opts out. */
  def embeddingNearDups(vecs: DataFrame, idCol: String, vecCol: String,
                        dim: Int, nPlanes: Int, threshold: Double,
                        maxBucketSize: Int = DefaultMaxBucketSize): DataFrame = {
    val b0 = vecs.withColumn("__bucket",
      Similarity.lshBucket(col(vecCol), dim, nPlanes))
    val b =
      if (maxBucketSize == Int.MaxValue) b0
      else {
        val ok = b0.groupBy(col("__bucket")).agg(count(lit(1)).as("__n"))
          .filter(col("__n") <= maxBucketSize)
          .select(col("__bucket"))
        b0.join(broadcast(ok), "__bucket")
      }
    // per-vector norm computed ONCE before the quadratic self-join
    // (Kernel.cosinePre — bit-identical to the fused cosine)
    val bn = b.withColumn("__n2", Kernel.vecNorm(col(vecCol)))
    val l = bn.select(col(idCol).as("id_a"), col(vecCol).as("__va"),
      col("__n2").as("__na"), col("__bucket"))
    val r = bn.select(col(idCol).as("id_b"), col(vecCol).as("__vb"),
      col("__n2").as("__nb"), col("__bucket"))
    l.join(r, "__bucket")
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", Kernel.cosinePre(
        col("__va"), col("__vb"), col("__na"), col("__nb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** SemDeDup (Abbas et al., "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication", arXiv:2303.09540)
    * re-expressed relationally: cluster the embedding space with a
    * coarse quantizer, then compare ONLY within-cluster pairs by exact
    * cosine — semantic duplicates (same content, different surface
    * form) land in the same cell, so the candidate set shrinks
    * ~nCells-fold without an all-pairs join. Output near-dup pairs
    * (id_a, id_b, cosine ≥ threshold), `id_a < id_b`.
    *
    * 100 TB shape: assignment is the narrow bank-backed
    * [[graft.functions.NearestCell]] scan (centroids broadcast once per
    * executor — the plan stays O(1) in nCells); the only corpus
    * exchange is the within-cell self-join's hash partition on the cell
    * id; `maxCellSize` caps degenerate hub cells exactly like
    * [[minhashNearDups]] (the cell-size table is nCells rows —
    * broadcast). The quantizer is pluggable: first-k centroids keep the
    * operator oracle-able; [[Similarity.trainKmeans]] output slots in
    * unchanged. Feed the pairs to [[removeNearDups]] to materialize the
    * deduplicated corpus. */
  def semDedupPairs(vecs: DataFrame, idCol: String, vecCol: String,
                    cents: Array[(Long, Array[Double])], threshold: Double,
                    maxCellSize: Int = DefaultMaxBucketSize): DataFrame = {
    val bridge = org.apache.spark.sql.graftbridge.Bridge
    // LAZY lineage cut: the assigned frame is referenced three times
    // (cap agg + both self-join sides) — without it the O(nCells·dim)
    // NearestCell scan runs once per reference instead of once per row.
    val b0 = vecs.withColumn("__cell", bridge.column(graft.functions.NearestCell(
      bridge.expression(col(vecCol)),
      graft.functions.CentroidBank.of(vecs.sparkSession, cents))))
      .localCheckpoint(false)
    val b =
      if (maxCellSize == Int.MaxValue) b0
      else {
        val ok = b0.groupBy(col("__cell")).agg(count(lit(1)).as("__n"))
          .filter(col("__n") <= maxCellSize)
          .select(col("__cell"))
        b0.join(broadcast(ok), "__cell")
      }
    val bn = b.withColumn("__n2", Kernel.vecNorm(col(vecCol)))
    val l = bn.select(col(idCol).as("id_a"), col(vecCol).as("__va"),
      col("__n2").as("__na"), col("__cell"))
    val r = bn.select(col(idCol).as("id_b"), col(vecCol).as("__vb"),
      col("__n2").as("__nb"), col("__cell"))
    l.join(r, "__cell")
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", Kernel.cosinePre(
        col("__va"), col("__vb"), col("__na"), col("__nb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** Exact token-set Jaccard near-dups over all pairs — quadratic; callers
    * restrict the id range (the exact baseline for the detectors above). */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        threshold: Double): DataFrame = {
    val toks = df.select(col(idCol),
      explode(array_distinct(Kernel.tokenIds(col(textCol)))).as("tok"))
    val allPairs = toks.select(col(idCol).as("id_a"), col("tok")).as("a")
      .join(toks.select(col(idCol).as("id_b"), col("tok")).as("b"), Seq("tok"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    jaccardOnPairs(allPairs, toks, idCol, threshold)
  }
}
