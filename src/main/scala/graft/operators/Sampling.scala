package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{K, Kernel}

/** Deterministic corpus sampling — the curation steps that shape a
  * 100 TB crawl into a training mix: uniform down-sampling, per-stratum
  * (language/source) rates, and per-domain quota caps. Everything is
  * RNG-free: keep/drop decisions hash the row id through the engine's
  * affine stream ([[TextAnalysis.splitBucket]]'s generator), so samples
  * are reproducible run-over-run, partitioning-invariant, and
  * cross-engine exact (the DuckDB oracle replays the same integers).
  *
  * Scale shape: sampling is a narrow filter (no shuffle, pushes below
  * wide parents); the quota cap is a partial top-k per key (≤ maxN rows
  * per key per map task reach the exchange — never a per-key window,
  * which would buffer a hub domain's whole group in one task) followed
  * by one semi join on the composite key. */
object Sampling {

  /** Affine hash of a row id → [0, M): the keep/drop lottery ticket.
    * Same overflow-safe pmod form as [[TextAnalysis.splitBucket]] (ids
    * reduce mod M before the multiply). */
  def sampleHash(id: Column): Column =
    pmod(pmod(id, lit(K.M)) * lit(K.A2) + lit(K.C2), lit(K.M))

  /** Rate → integer hash threshold: keep iff hash < floor(rate·M). */
  def threshold(rate: Double): Long = (rate * K.M).toLong

  /** Uniform deterministic sample: keeps ~`rate` of rows, exactly the
    * rows whose id-hash clears the threshold — stable across runs,
    * partitionings, and engines. */
  def sample(df: DataFrame, idCol: String, rate: Double): DataFrame =
    df.filter(sampleHash(col(idCol)) < lit(threshold(rate)))

  /** Stratified sample: per-stratum keep rates (e.g. language or source
    * mix rebalancing), `defaultRate` for strata not listed. The rate
    * table broadcasts; the filter stays narrow. */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
                       rates: Seq[(String, Double)],
                       defaultRate: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val t = broadcast(rates.map { case (s, r) => (s, threshold(r)) }
      .toDF(strataCol, "__thr"))
    df.join(t, Seq(strataCol), "left")
      .filter(sampleHash(col(idCol)) <
        coalesce(col("__thr"), lit(threshold(defaultRate))))
      .drop("__thr")
  }

  /** Temperature-damped source-mixture weights — the "multinomial with
    * α = 0.5" rebalancing used to keep head domains from drowning the
    * tail in a multi-source training mix: weight_s ∝ √n_s (the standard
    * temperature-sampling exponent; √ is IEEE correctly-rounded, so the
    * math is cross-engine exact, unlike a general pow). Output per
    * source: (srcCol, n_docs, weight, target_docs) with
    * weight = √n_s / Σ√n and target_docs = floor(weight · N).
    *
    * Determinism: the Σ√n fold runs over the source list SORTED by
    * source id (one struct-sort of a sources-sized array — broadcast-
    * small), so the double sum has a fixed order regardless of
    * partitioning. One partial count aggregation over the corpus; all
    * downstream arithmetic is on the tiny per-source table. Feed the
    * implied per-source rates (target_docs/n_docs) to
    * [[stratifiedSample]] to materialize the mix. */
  def mixtureWeights(df: DataFrame, srcCol: String): DataFrame = {
    val counts = df.groupBy(col(srcCol)).agg(count(lit(1)).as("n_docs"))
    counts
      .agg(array_sort(collect_list(struct(col(srcCol), col("n_docs")))).as("__a"))
      .select(col("__a"),
        aggregate(transform(col("__a"), s => sqrt(s("n_docs").cast("double"))),
          lit(0.0), (a, x) => a + x).as("__z"),
        aggregate(transform(col("__a"), s => s("n_docs")),
          lit(0L), (a, x) => a + x).as("__total"))
      .select(explode(col("__a")).as("__s"), col("__z"), col("__total"))
      .select(col("__s").getField(srcCol).as(srcCol),
        col("__s").getField("n_docs").as("n_docs"),
        (sqrt(col("__s").getField("n_docs").cast("double")) / col("__z")).as("weight"),
        floor(sqrt(col("__s").getField("n_docs").cast("double")) / col("__z")
          * col("__total").cast("double")).cast("long").as("target_docs"))
  }

  /** DSIR-style importance masses (Data Selection via Importance
    * Resampling: score raw docs by how target-like their hashed n-gram
    * features are): each doc's word-`n`-gram hashes bucket into
    * `nBuckets` features; `t_mass = Σ_f c_f·(tc_f + 1)` and
    * `s_mass = Σ_f c_f·(sc_f + 1)` where c_f is the doc's bucket
    * count, tc_f the TARGET corpus's and sc_f the raw (source)
    * corpus's total bucket count — the add-one-smoothed numerators of
    * p_target/p_source. Exact integers (the gate form — the log-ratio
    * ln(p_t/p_s) is monotone in the per-feature ratio these masses
    * aggregate, and ln is not part of any gated query, the q55/q64
    * convention); importance selection orders by the smoothed
    * likelihood ratio t_mass/s_mass ([[dsirTopK]]).
    *
    * Scale shape: each corpus tokenizes ONCE; the two stats tables are
    * ≤ nBuckets rows (broadcast side of the rejoin); the doc-feature
    * walk shuffles once on the bucket key for the stats aggs (map-side
    * partial) and once per join; the final per-doc sum agg is partial.
    * No driver action. */
  def dsirMasses(df: DataFrame, idCol: String, textCol: String,
                 target: DataFrame, nBuckets: Int = 4096, n: Int = 2,
                 maxLength: Int = K.MaxLength): DataFrame = {
    def features(d: DataFrame) = d
      .select(col(idCol), Kernel.tokenIds(col(textCol), maxLength).as("__tids"))
      .filter(size(col("__tids")) >= n)
      .select(col(idCol), explode(Dedup.shingles(col("__tids"), n)).as("__sh"))
      .select(col(idCol), (col("__sh") % nBuckets).as("bucket"))
      .groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("c"))
    val srcF = features(df).localCheckpoint(false)
    val tc = features(target).groupBy(col("bucket")).agg(sum(col("c")).as("tc"))
    val sc = srcF.groupBy(col("bucket")).agg(sum(col("c")).as("sc"))
    srcF.join(sc, Seq("bucket"))
      .join(tc, Seq("bucket"), "left")
      .groupBy(col(idCol))
      .agg(sum(col("c") * (coalesce(col("tc"), lit(0L)) + 1L)).as("t_mass"),
        sum(col("c") * (col("sc") + 1L)).as("s_mass"))
  }

  /** The selection step over [[dsirMasses]]: top-`k` docs by the
    * smoothed-likelihood ratio t_mass/s_mass (how target-like a doc's
    * feature mix is relative to the background; the per-corpus
    * normalizers (T + B)/(S + B) scale every doc identically, so they
    * cancel out of the ordering). The ratio is ordered EXACTLY via
    * [[ratioKey]] — the masses are exact integers, and a long→double
    * cast would round past 2^53, silently misordering docs at the
    * selection boundary on corpora big enough to get there. Ties →
    * lower id; a plain TakeOrderedAndProject over the masses — no
    * global sort, no driver action. */
  def dsirTopK(df: DataFrame, idCol: String, textCol: String,
               target: DataFrame, k: Int, nBuckets: Int = 4096,
               n: Int = 2, maxLength: Int = K.MaxLength): DataFrame =
    dsirMasses(df, idCol, textCol, target, nBuckets, n, maxLength)
      .orderBy(ratioKey("t_mass", "s_mass").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("t_mass"), col("s_mass"))

  /** Exact total order on the rational t/s (both positive longs) as a
    * fixed-width decimal string: 19 integer digits, then 54 fraction
    * digits computed by three rounds of exact remainder·10^18 DIV s
    * long-division (the remainder·10^18 step peaks at 37 digits —
    * inside DECIMAL(38,0), so every intermediate is value-exact).
    * Lexicographic order on the key == numeric order on t/s: two
    * distinct ratios with sub-2^63 denominators differ by at least
    * 1/(s1·s2) > 1.1e-38, far above the 1e-54 truncation granularity.
    * String-typed on purpose — no numeric SQL type holds 73 digits. */
  private[graft] def ratioKey(t: String, s: String): Column = {
    val E = "CAST(1000000000000000000 AS DECIMAL(38,0))" // 10^18
    val x1 = s"(($t % $s) * $E)"
    val c1 = s"($x1 DIV $s)"
    val x2 = s"(CAST($x1 % $s AS BIGINT) * $E)"
    val c2 = s"($x2 DIV $s)"
    val c3 = s"((CAST($x2 % $s AS BIGINT) * $E) DIV $s)"
    expr(s"format_string('%019d.%018d%018d%018d', $t DIV $s, $c1, $c2, $c3)")
  }

  /** Exact top-quantile threshold filter: keep every row whose integer
    * `scoreCol` is ≥ the exact (1−frac) order-statistic boundary —
    * "keep the best `frac` of the corpus by score", the quantile form
    * of quality/length selection. Rows TIED at the boundary score are
    * all kept (output ≥ ⌈frac·N⌉ rows); [[topFraction]] resolves the
    * boundary to exactly k.
    *
    * Exactness: the threshold comes from a score HISTOGRAM with a
    * running count — an exact two-pass order statistic, not an
    * approx-percentile sketch. Scale shape: one partial-agg shuffle
    * builds the histogram; the cumulative window runs over the
    * HISTOGRAM ONLY (score-cardinality rows — bounded for the engine's
    * quantized/length scores, the documented contract; never over the
    * corpus); the 1-row threshold broadcasts back into a narrow
    * filter. */
  def quantileThreshold(df: DataFrame, idCol: String, scoreCol: String,
                        frac: Double): DataFrame =
    df.join(broadcast(boundaryRow(df, scoreCol, frac).select(col("__sc"))),
        col(scoreCol) >= col("__sc"))
      .drop("__sc")

  /** Exactly-k top-fraction selection: [[quantileThreshold]] with the
    * boundary score's ties resolved by the id-hash lottery (lowest
    * hash, then lowest id) down to k = ⌈frac·N⌉ rows total. The
    * tie-break ranks ONLY the boundary-score rows (one histogram
    * bucket — the all-ties variant is the path when a single score
    * bucket can be corpus-sized). */
  def topFraction(df: DataFrame, idCol: String, scoreCol: String,
                  frac: Double): DataFrame = {
    val b = boundaryRow(df, scoreCol, frac)
    val above = df.join(broadcast(b.select(col("__sc"))), col(scoreCol) > col("__sc"))
      .drop("__sc")
    // The boundary bucket's (hash, id) tie-break WITHOUT funneling the
    // whole bucket through one reducer: a degenerate corpus can put
    // EVERY row on the boundary score (all-same-length docs), and a
    // global row_number window would then serialize the corpus. The
    // lottery order is recovered in two exact levels instead: a coarse
    // histogram over ~4096 hash ranges finds the range containing the
    // k-th ticket (hash ranges are order-aligned with the hash itself,
    // so whole ranges below it are kept with a narrow filter), and
    // only the ONE straddling range — ~1/4096 of the bucket — is
    // ranked by the window. Same rows selected, single-reducer load
    // divided by the range count.
    val div = math.max(1L, K.M / 4096L)
    val bnd = df.join(broadcast(b), col(scoreCol) === col("__sc"))
      .withColumn("__hv", sampleHash(col(idCol)))
      .withColumn("__hb", expr(s"__hv DIV $div"))
      .localCheckpoint(false) // referenced by histogram + both keep legs
    // __b (how many boundary rows still fit) is constant over bnd —
    // max() carries it through the histogram agg
    val hist = bnd.groupBy(col("__hb"))
      .agg(count(lit(1)).as("__c"), max(col("__b")).as("__b"))
    val cum = hist.withColumn("__cum",
      sum(col("__c")).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("__hb").asc)))
    val cut = cum
      .filter(col("__cum") >= col("__b"))
      .orderBy(col("__hb").asc)
      .limit(1)
      .select(col("__hb").as("__hbStar"),
        (col("__b") - (col("__cum") - col("__c"))).as("__need"))
    val keptWhole = bnd
      .join(broadcast(cut.select(col("__hbStar"))), col("__hb") < col("__hbStar"))
      .drop("__sc", "__b", "__hv", "__hb", "__hbStar")
    val wn = org.apache.spark.sql.expressions.Window
      .orderBy(col("__hv").asc, col(idCol).asc)
    val keptRanked = bnd
      .join(broadcast(cut), col("__hb") === col("__hbStar"))
      .withColumn("__rn", row_number().over(wn))
      .filter(col("__rn") <= col("__need"))
      .drop("__sc", "__b", "__hv", "__hb", "__hbStar", "__need", "__rn")
    above.union(keptWhole).union(keptRanked)
  }

  /** The exact boundary: 1 row (__sc = threshold score, __b = how many
    * boundary-score rows still fit under k). Histogram → cumulative
    * count from the top → first score bucket reaching k. */
  private def boundaryRow(df: DataFrame, scoreCol: String, frac: Double): DataFrame = {
    require(frac > 0.0 && frac <= 1.0, s"frac must be in (0, 1], got $frac")
    val hist = df.groupBy(col(scoreCol).as("__sc")).agg(count(lit(1)).as("__c"))
    val cum = hist.withColumn("__cum",
      sum(col("__c")).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("__sc").desc)))
    val tot = hist.agg(sum(col("__c")).as("__n"))
    val k = ceil(col("__n").cast("double") * lit(frac)).cast("long")
    cum.crossJoin(broadcast(tot))
      .filter(col("__cum") >= k)
      .select(col("__sc"), (k - (col("__cum") - col("__c"))).as("__b"))
      .orderBy(col("__sc").desc)
      .limit(1)
  }

  /** The end-to-end curation recipe as ONE plan — what a user actually
    * runs to turn a raw crawl into a training mix:
    *
    *   1. clean markup ([[TextAnalysis.cleanText]]),
    *   2. exact-dedup on the cleaned text (keep the lowest id per
    *      normalized-text hash, [[Dedup.exact]]'s rule),
    *   3. keep the longest `lengthFrac` by whitespace-token count
    *      ([[quantileThreshold]] — exact order statistic, ties kept),
    *   4. cap any one source at `maxPerSource` docs ([[capPerKey]]),
    *   5. per-language stratified keep rates ([[stratifiedSample]]).
    *
    * Scale shape: the corpus is cleaned + TextNorm'd ONCE behind a lazy
    * lineage cut (every later stage — keep-set agg, semi join, score
    * histogram, threshold filter, cap, lottery — reuses that frame);
    * the wide stages are one hash shuffle each (dedup keys, quota
    * keys), the histogram window is score-cardinality-sized, and both
    * sampling filters are narrow. */
  def curationPipeline(df: DataFrame, idCol: String, textCol: String,
                       langCol: String, srcCol: String,
                       lengthFrac: Double = 0.5, maxPerSource: Int = 20,
                       rates: Seq[(String, Double)] = Nil,
                       defaultRate: Double = 1.0): DataFrame = {
    val bridge = org.apache.spark.sql.graftbridge.Bridge
    val cleaned = df
      .withColumn("__tn", bridge.column(graft.functions.TextNorm(
        bridge.expression(TextAnalysis.cleanText(col(textCol))), Nil)))
      .select(col(idCol), col(langCol), col(srcCol),
        md5(col("__tn.norm")).as("__h"), col("__tn.ws_tokens").as("n_tokens"))
      .localCheckpoint(false)
    val keep = cleaned.groupBy(col("__h")).agg(min(col(idCol)).as(idCol))
    val deduped = cleaned
      .join(keep.select(col(idCol)), Seq(idCol), "left_semi")
      .select(col(idCol), col(langCol), col(srcCol), col("n_tokens"))
    val longEnough = quantileThreshold(deduped, idCol, "n_tokens", lengthFrac)
    val capped = capPerKey(longEnough, srcCol, idCol, maxPerSource)
    stratifiedSample(capped, idCol, langCol, rates, defaultRate)
      .select(col(idCol), col(langCol), col(srcCol), col("n_tokens"))
  }

  /** Per-key quota: at most `maxN` rows per key, chosen deterministically
    * (lowest id-hash first, ties → lower id) — the "cap any one domain"
    * step that stops a hub site from dominating the mix. Partial top-k
    * per key, then a left-semi join restores the full rows. */
  def capPerKey(df: DataFrame, keyCol: String, idCol: String,
                maxN: Int): DataFrame = {
    val picks = df
      .groupBy(col(keyCol))
      .agg(graft.functions.TopKAgg.topK(
        -sampleHash(col(idCol)).cast("double"),
        col(idCol).cast("long"), maxN).as("__top"))
      .select(col(keyCol), explode(col("__top")).as("__t"))
      .select(col(keyCol), col("__t.id").as(idCol))
    df.join(picks, Seq(keyCol, idCol), "left_semi")
  }

  /** Sequence packing — assemble curated documents into fixed
    * token-budget training windows, the step between curation and the
    * training dataloader. Both forms shard the corpus first
    * (`shard = id mod nShards`): packing is inherently a sequential
    * recurrence over an ordered stream, so the shard is the parallelism
    * unit — each shard's stream packs independently, and at 100 TB
    * `nShards` scales with the cluster (pick ≥ a few × total cores;
    * the per-shard work is a sort of a shard-sized run, never a global
    * sort). Determinism: within a shard, documents pack in id order.
    *
    * [[packByOffset]] is "concat-and-chunk": the shard's token stream is
    * concatenated in id order and cut every `budget` tokens, each
    * document labeled with the window its FIRST token falls in — a
    * document may straddle a boundary (expected straddle fraction ≈
    * mean_len/budget), which is the semantics most LLM pretraining
    * pipelines use. Pure window cumsum → whole-stage codegen, one hash
    * exchange on shard. Output (idCol, shard, pack, n_tokens). */
  def packByOffset(df: DataFrame, idCol: String, tokCol: String,
                   budget: Long, nShards: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col(idCol))
    df.select(col(idCol), pmod(col(idCol), lit(nShards)).cast("long").as("shard"),
        col(tokCol).cast("long").as("n_tokens"))
      .withColumn("__end", sum(col("n_tokens")).over(w))
      .select(col(idCol), col("shard"),
        floor((col("__end") - col("n_tokens")) / lit(budget)).as("pack"),
        col("n_tokens"))
  }

  /** Contiguous greedy packing: documents never split — walking the
    * shard in id order, a new pack starts whenever adding the next
    * document would exceed `budget` (an over-budget document still gets
    * its own pack). The recurrence is sequential, so it runs as one
    * ordered fold per shard via flatMapGroups; the shard buffer is the
    * memory bound — size `nShards` so corpus/nShards fits a task
    * (exactly the constraint any mapGroups state carries). Output
    * (idCol, shard, pack, n_tokens), same schema as [[packByOffset]]. */
  def packGreedyFirstFit(df: DataFrame, idCol: String, tokCol: String,
                         budget: Long, nShards: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"),
        pmod(col(idCol), lit(nShards)).cast("long"),
        col(tokCol).cast("long"))
      .as[(Long, Long, Long)]
      .groupByKey(_._2)
      .flatMapGroups { (shard, it) =>
        val docs = it.toArray.sortBy(_._1)
        var pack = 0L
        var used = 0L
        docs.iterator.map { case (id, _, tok) =>
          if (used > 0 && used + tok > budget) { pack += 1; used = 0L }
          used += tok
          (id, shard, pack, tok)
        }
      }
      .toDF(idCol, "shard", "pack", "n_tokens")
  }

  /** Pack-level summary of a packing assignment (either form's output):
    * docs per pack, token total, and fill ratio against the budget —
    * the fragmentation reading that tunes budget/shard choices (greedy
    * packing wastes (1 − fill) of every window; offset packing fills
    * exactly but straddles). One partial aggregation to packs-sized
    * output. */
  def packStats(packed: DataFrame, budget: Long): DataFrame =
    packed.groupBy(col("shard"), col("pack"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("pack_tokens"))
      .withColumn("fill_ratio",
        col("pack_tokens").cast("double") / lit(budget.toDouble))
}
