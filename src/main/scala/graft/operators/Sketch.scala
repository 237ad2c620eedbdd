package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{BloomBank, BloomFlagged, K, Kernel}

/** Probabilistic sketches — the fixed-size summaries a 100 TB pipeline
  * substitutes for exact global state when the exact form no longer fits:
  *
  *  - [[cmsSketch]]/[[cmsEstimates]]: Count-Min token-frequency sketch.
  *    The exact frequency table is vocabulary-sized (unbounded, skewed);
  *    the sketch is a FIXED `depth x width` grid that partial-aggregates
  *    map-side, so the one exchange carries at most `depth * width` cells
  *    per task regardless of corpus size.
  *  - [[hllDistinct]]: HyperLogLog-style per-group distinct estimator.
  *    Exact per-group COUNT(DISTINCT) shuffles every distinct value; the
  *    sketch reduces each group to `m = 2^p` max-rank buckets.
  *  - [[bloomBank]]/[[bloomContamination]]: Bloom-filter membership for
  *    eval-set decontamination. [[Dedup.contamination]] (q41) joins the
  *    corpus against the eval shingle set; the Bloom form broadcasts a
  *    fixed `nBits` bitset and probes it in a NARROW scan — zero corpus
  *    shuffle, at the price of a quantified false-positive rate (no
  *    false negatives: a contaminated doc is always flagged).
  *
  * Everything is deterministic (the [[Dedup.minhashPerm]] universal-hash
  * family — RNG-free), integer-exact until a final documented division,
  * and mirrored 1:1 by the DuckDB oracle.
  */
object Sketch {

  /** Count-Min cell coordinates of token `t`: one (row, bucket) struct per
    * hash row i, bucket_i = ((t*a_i + b_i) mod P32) mod width with
    * (a_i, b_i) = [[Dedup.minhashPerm]](i). t < M and a_i < P32 keep the
    * product far inside int64. */
  private[graft] def cmsCells(t: Column, depth: Int, width: Int): Column =
    array((0 until depth).map { i =>
      val (a, b) = Dedup.minhashPerm(i)
      struct(lit(i.toLong).as("row"),
        (((t * a + b) % K.P32) % width).as("bucket"))
    }: _*)

  /** Count-Min sketch of token occurrence counts: (row, bucket, cnt),
    * at most `depth * width` rows. One corpus scan; the groupBy partial-
    * aggregates into the fixed grid map-side, so the exchange is
    * sketch-sized, never corpus-sized. */
  def cmsSketch(df: DataFrame, textCol: String, depth: Int, width: Int,
                maxLength: Int = K.MaxLength): DataFrame =
    df.select(explode(Kernel.tokenIds(col(textCol), maxLength)).as("t"))
      .select(explode(cmsCells(col("t"), depth, width)).as("c"))
      .select(col("c.row").as("row"), col("c.bucket").as("bucket"))
      .groupBy("row", "bucket").agg(count(lit(1)).as("cnt"))

  /** Point estimates from the sketch: est(t) = min over rows of the
    * sketch cell t hashes into — an upper bound on the true count that
    * equals it when no heavier token collides in every row. Candidates
    * are the corpus's own distinct tokens; the sketch side is tiny and
    * broadcast, so estimation adds no corpus exchange beyond the
    * candidate distinct. Output: (token_id, est). */
  def cmsEstimates(df: DataFrame, textCol: String, depth: Int, width: Int,
                   maxLength: Int = K.MaxLength): DataFrame = {
    // one tokenize feeds both the sketch pass and the candidate pass
    val tok = df.select(Kernel.tokenIds(col(textCol), maxLength).as("__tids"))
      .localCheckpoint(false)
    val occ = tok.select(explode(col("__tids")).as("t"))
    val sk = cmsSketch2(occ, depth, width)
    val cells = occ.distinct()
      .select(col("t"), explode(cmsCells(col("t"), depth, width)).as("c"))
      .select(col("t").as("token_id"), col("c.row").as("row"),
        col("c.bucket").as("bucket"))
    cells.join(broadcast(sk), Seq("row", "bucket"))
      .groupBy("token_id").agg(min(col("cnt")).as("est"))
  }

  /** [[cmsSketch]] over an already-exploded token column `t`. */
  private def cmsSketch2(occ: DataFrame, depth: Int, width: Int): DataFrame =
    occ.select(explode(cmsCells(col("t"), depth, width)).as("c"))
      .select(col("c.row").as("row"), col("c.bucket").as("bucket"))
      .groupBy("row", "bucket").agg(count(lit(1)).as("cnt"))

  /** Merges CMS sketches built over disjoint corpus slices: cell-wise
    * sum. Counts are linear, so merge(sketch(A), sketch(B)) ==
    * sketch(A ∪ B) exactly — the property that lets each partition,
    * day, or shard keep its own fixed-size sketch and combine them
    * without ever rescanning the data. */
  def cmsMerge(sketches: DataFrame*): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy("row", "bucket").agg(sum(col("cnt")).as("cnt"))

  /** Point estimates of `candidates`' `token_id` column against a
    * prebuilt (possibly merged) sketch. */
  def cmsEstimatesFrom(sketch: DataFrame, candidates: DataFrame,
                       depth: Int, width: Int): DataFrame =
    candidates
      .select(col("token_id"),
        explode(cmsCells(col("token_id"), depth, width)).as("c"))
      .select(col("token_id"), col("c.row").as("row"), col("c.bucket").as("bucket"))
      .join(broadcast(sketch), Seq("row", "bucket"))
      .groupBy("token_id").agg(min(col("cnt")).as("est"))

  /** Heavy hitters: tokens whose sketch estimate reaches `threshold`.
    * CMS guarantees est >= true count, so no true heavy hitter is ever
    * missed (one-sided error, like the Bloom filter's). */
  def cmsHeavyHitters(df: DataFrame, textCol: String, threshold: Long,
                      depth: Int, width: Int,
                      maxLength: Int = K.MaxLength): DataFrame =
    cmsEstimates(df, textCol, depth, width, maxLength)
      .filter(col("est") >= threshold)

  // ---------------------------------------------------------------- HLL

  /** Hash-stream row used for the HLL value hash (disjoint from the CMS
    * rows 0..depth-1 and the minhash signature rows by convention). */
  val HllPermRow: Int = 11

  /** HLL estimator constant alpha_m (Flajolet et al. 2007, Fig. 3). */
  def hllAlpha(p: Int): Double = {
    val m = 1 << p
    p match {
      case 4 => 0.673
      case 5 => 0.697
      case 6 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
  }

  /** Scaled-power table: entry rho (1-indexed) is 2^(40-rho). The
    * harmonic-mean denominator sums these exact int64 terms instead of
    * the floating 2^-rho, so cross-row aggregation stays order-
    * independent; one final double division produces the estimate. */
  def hllPowTable(p: Int): Array[Long] = {
    val w = 32 - p
    (1 to w + 1).map(r => 1L << (40 - r)).toArray
  }

  /** Numerator alpha_m * m^2 * 2^40 of the estimate — a plan-time Double
    * constant shared verbatim with the oracle SQL. */
  def hllNumerator(p: Int): Double = {
    val m = (1 << p).toDouble
    hllAlpha(p) * m * m * math.pow(2.0, 40.0)
  }

  /** Per-group HLL distinct estimate over the values of `valueCol`
    * (int64, hashed through the minhashPerm([[HllPermRow]]) row):
    * bucket = low p bits of the 32-bit hash, rho = leading-zero run of
    * the remaining w = 32-p bits + 1 (computed by exact integer
    * threshold counts — no log2), est = alpha_m m^2 / sum(2^-rho) with
    * empty buckets contributing 2^0. Output: (group, est DOUBLE).
    *
    * 100 TB shape: the only full-data exchange is the (group, bucket)
    * partial max — at most m rows per group per task. */
  def hllDistinct(df: DataFrame, groupCol: String, valueCol: String,
                  p: Int): DataFrame =
    hllEstimateFrom(hllSketchTable(df, groupCol, valueCol, p), groupCol, p)

  /** The HLL sketch in its mergeable table form: (group, bucket, maxrho),
    * at most m = 2^p rows per group. */
  def hllSketchTable(df: DataFrame, groupCol: String, valueCol: String,
                     p: Int): DataFrame =
    hllRows(df, groupCol, valueCol, p)
      .groupBy(col(groupCol), col("bucket"))
      .agg(max(col("rho")).as("maxrho"))

  /** The NARROW half of the HLL sketch: appends (bucket, rho) for
    * `valueCol` to every input row, keeping the other columns — shared
    * by the batch table build and the streaming windowed build, which
    * differ only in the grouping (`groupCol` vs window + `groupCol`). */
  private[graft] def hllRows(df: DataFrame, groupCol: String,
                             valueCol: String, p: Int): DataFrame = {
    val m = 1 << p
    val w = 32 - p
    val (a, b) = Dedup.minhashPerm(HllPermRow)
    val g = (col(valueCol) * a + b) % K.P32
    val bucket = g.bitwiseAND(lit((m - 1).toLong))
    val r = shiftright(g, p)
    // MSB position of the w-bit value r = |{i in 1..w : r >= 2^(i-1)}|;
    // rho = w + 1 - that (r = 0 gives rho = w + 1). The thresholds are a
    // literal array, so the comparison fold stays integer-exact.
    val thresholds = array((1 to w).map(i => lit(1L << (i - 1))): _*)
    val rv = r
    val rho = lit((w + 1).toLong) -
      size(filter(thresholds, pw => rv >= pw)).cast("long")
    df.select(df.columns.toIndexedSeq.map(col) :+ bucket.as("bucket") :+ rho.as("rho"): _*)
  }

  /** Merges HLL sketch tables from disjoint (or overlapping — max is
    * idempotent) corpus slices: per-(group, bucket) max. merge(sk(A),
    * sk(B)) == sk(A ∪ B) exactly, so per-shard sketches combine
    * without a rescan. */
  def hllMerge(groupCol: String, tables: DataFrame*): DataFrame =
    tables.reduce(_ unionByName _)
      .groupBy(col(groupCol), col("bucket"))
      .agg(max(col("maxrho")).as("maxrho"))

  /** Estimate from a (possibly merged) sketch table. */
  def hllEstimateFrom(table: DataFrame, groupCol: String, p: Int): DataFrame = {
    val m = 1 << p
    val powTab = array(hllPowTable(p).toIndexedSeq.map(lit(_)): _*)
    table
      .select(col(groupCol),
        element_at(powTab, col("maxrho").cast("int")).as("term"))
      .groupBy(col(groupCol))
      .agg(sum(col("term")).as("s"), count(lit(1)).as("nb"))
      .select(col(groupCol),
        (lit(hllNumerator(p)) /
          (col("s") + (lit(m.toLong) - col("nb")) * lit(1L << 40))
            .cast("double")).as("est"))
  }

  /** Per-source distinct-shingle count, exact and HLL-estimated side by
    * side: (group, exact, est). One corpus scan (the distinct shingle
    * frame is lineage-cut and feeds both aggregations). */
  def hllDistinctShingles(df: DataFrame, groupCol: String, textCol: String,
                          n: Int, p: Int,
                          maxLength: Int = K.MaxLength): DataFrame = {
    // Both legs read the RAW shingle stream — no global distinct is ever
    // materialized. The estimate side is duplicate-IDEMPOTENT (per-bucket
    // max-rho sees the same (bucket, rho) set with or without dedup), so
    // its only full-data exchange is the (group, bucket) partial-max; the
    // exact side plans as a two-phase count(distinct): map-side dedup per
    // partition, then an exchange of per-partition-distinct pairs. The
    // previous shape (`.distinct().localCheckpoint` shared by both legs)
    // saved one narrow re-scan but materialized the full distinct pair
    // set to the block store — at 100× that materialization, not the
    // count, dominated (measured 48 s vs ~10 s at sf10). Two narrow
    // scans scale linearly; a corpus-sized block-store write does not.
    def sh = df
      .select(col(groupCol), Kernel.tokenIds(col(textCol), maxLength).as("__tids"))
      .filter(size(col("__tids")) >= n)
      .select(col(groupCol), explode(Dedup.shingles(col("__tids"), n)).as("shingle"))
    val exact = sh.groupBy(col(groupCol))
      .agg(countDistinct(col("shingle")).as("exact"))
    val est = hllDistinct(sh, groupCol, "shingle", p)
    exact.join(est, groupCol)
  }

  // -------------------------------------------------------------- Bloom

  /** Bloom bit positions of shingle `s`: pos_i = ((s*a_i + b_i) mod P32)
    * mod nBits for i in 0..k-1 ([[Dedup.minhashPerm]] rows, same family
    * as the CMS grid but reduced mod nBits). */
  def bloomPositions(s: Column, k: Int, nBits: Int): Column =
    array((0 until k).map { i =>
      val (a, b) = Dedup.minhashPerm(i)
      ((s * a + b) % K.P32) % nBits
    }: _*)

  /** Builds a broadcastable Bloom bitset from the eval corpus's distinct
    * shingle set. The driver-side collect is bounded by
    * min(k * |eval shingles|, nBits) int64 positions — eval-suite-sized
    * (like the centroid-bank builds), never corpus-sized. */
  def bloomBank(spark: SparkSession, eval: DataFrame, idCol: String,
                textCol: String, n: Int = 3, k: Int = 2,
                nBits: Int = 1 << 14,
                maxLength: Int = K.MaxLength): BloomBank = {
    val positions = Dedup.shingleSet(eval, idCol, textCol, n, maxLength)
      .select(explode(bloomPositions(col("shingle"), k, nBits)).as("pos"))
      .distinct()
      .collect().map(_.getLong(0))
    BloomBank.of(spark, positions, nBits, k)
  }

  /** Flags train docs whose shingle set hits the Bloom filter: output
    * (id, flagged_shingles) for docs with at least one distinct shingle
    * whose k positions are all set. NARROW — the corpus never shuffles;
    * the bitset rides the broadcast bank. Supersets the exact join's
    * answer: every truly-contaminated doc is flagged (no false
    * negatives); the false-positive surplus is governed by nBits/k. */
  def bloomContamination(train: DataFrame, bank: BloomBank, idCol: String,
                         textCol: String, n: Int = 3,
                         maxLength: Int = K.MaxLength): DataFrame = {
    val bridge = org.apache.spark.sql.graftbridge.Bridge
    train
      .select(col(idCol), Kernel.tokenIds(col(textCol), maxLength).as("__tids"))
      .filter(size(col("__tids")) >= n)
      .select(col(idCol), bridge.column(BloomFlagged(
        bridge.expression(Dedup.shingles(col("__tids"), n)), bank))
        .as("flagged_shingles"))
      .filter(col("flagged_shingles") > 0L)
  }
}
