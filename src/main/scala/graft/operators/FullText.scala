package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{K, Kernel}

/** Full-text (lexical) retrieval — the sparse leg of a hybrid search
  * stack. The reference ships dense, SPLADE-sparse, and late-interaction
  * embeddings (/root/reference/src/lib.rs); production deployments pair
  * them with a corpus-statistics BM25 leg and fuse the rankings. Both
  * halves live here:
  *
  *  - BM25 (Robertson/Okapi, k1=1.2 b=0.75): document-side weights
  *    trained from corpus statistics (df, n_docs, avgdl) computed
  *    in-plan, and query-side top-k search over the weighted inverted
  *    representation.
  *  - Reciprocal-rank fusion (RRF, k=60): combines any two ranked
  *    result legs (dense ANN + BM25 being the canonical pair) by
  *    1/(k+rank) votes — rank-space fusion, so the legs' incomparable
  *    score scales never touch.
  *
  * Cross-engine exactness: every term is exact rational arithmetic
  * except the idf log, which is QUANTIZED to 2^-24 steps on the tiny
  * per-token stats table — ln() is the one transcendental (Spark
  * `Math.log` vs DuckDB `std::log` may differ in the last ulp), and
  * snapping to a 2^-24 grid absorbs a 1-ulp disagreement everywhere
  * except a measure-~1e-9 boundary set. Sums over query terms are
  * ordered folds (token_id asc), per the engine-wide rule.
  *
  * Scale shape (100 TB): the corpus NEVER shuffles on the query join —
  * query terms broadcast; the only corpus-wide exchanges are the
  * (doc, token) tf aggregation (two-key, partial, skew-free) and the
  * per-(query, doc) score fold whose groups are bounded by the query
  * length. Ranking is the partial top-k heap — ≤ k rows per query per
  * map task reach the final exchange. */
object FullText {

  /** BM25 saturation / length-normalization defaults. */
  val K1: Double = 1.2
  val B: Double = 0.75
  /** RRF smoothing constant (the standard 60). */
  val RrfK: Int = 60
  /** idf quantization grid: 2^24 steps per unit. */
  val IdfScale: Double = 16777216.0

  /** Quantized BM25 idf: floor(ln(1 + (N-df+0.5)/(df+0.5))·2^24 + 0.5)
    * / 2^24. `dfCol`/`nDocs` are longs; the subtraction stays integer
    * (exact), everything else is deterministic IEEE ops + one ln snapped
    * to the grid. Identical tree in the SQL oracle. */
  def idfQ(dfCol: Column, nDocs: Column): Column =
    floor(log(((nDocs - dfCol).cast("double") + lit(0.5)) /
      (dfCol.cast("double") + lit(0.5)) + lit(1.0)) * lit(IdfScale) + lit(0.5)) / lit(IdfScale)

  /** Document-side BM25 weights over a text corpus — the "BM25 sparse
    * vector" a hybrid index stores: one row per (doc, token) with
    * weight = idf · tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl)).
    * Output (idCol, token_id, tf, df, weight). */
  def bm25DocWeights(df: DataFrame, idCol: String, textCol: String,
                     k1: Double = K1, b: Double = B,
                     maxLength: Int = K.MaxLength): DataFrame =
    bm25DocWeightsTokens(
      df.select(col(idCol), Kernel.tokenIds(col(textCol), maxLength).as("__tids")),
      idCol, "__tids", k1, b)

  /** [[bm25DocWeights]] over a pre-tokenized `(id, tids)` frame. The tf
    * aggregation carries the doc length alongside (max of a constant per
    * group — no second corpus pass); df and the 1-row (n_docs, avgdl)
    * companion are derived from the aggregated tables (vocab-sized and
    * scalar — both broadcast), so the corpus is scanned exactly once. */
  def bm25DocWeightsTokens(tokens: DataFrame, idCol: String, tidsCol: String,
                           k1: Double = K1, b: Double = B): DataFrame = {
    val toks = tokens
      .select(col(idCol), col(tidsCol).as("__tids"))
      // tf + df + avgdl all reuse this narrow projection; the lazy
      // lineage cut stops the two stats branches re-tokenizing the corpus
      .localCheckpoint(false)
    val tf = toks
      .select(col(idCol), size(col("__tids")).cast("long").as("__dl"),
        explode(col("__tids")).as("token_id"))
      .groupBy(col(idCol), col("token_id"))
      .agg(count(lit(1)).as("tf"), max(col("__dl")).as("__dl"))
    val stats = tf.groupBy(col("token_id")).agg(count(lit(1)).as("df"))
    val nd = toks.groupBy().agg(
      count(lit(1)).as("__n_docs"),
      sum(size(col("__tids")).cast("long")).as("__total_len"))
    tf.join(broadcast(stats), "token_id")
      .crossJoin(broadcast(nd))
      .withColumn("__avgdl",
        col("__total_len").cast("double") / col("__n_docs").cast("double"))
      .withColumn("weight",
        idfQ(col("df"), col("__n_docs")) *
          (col("tf").cast("double") * lit(k1 + 1.0)) /
          (col("tf").cast("double") +
            lit(k1) * (lit(1.0 - b) + lit(b) * (col("__dl").cast("double") / col("__avgdl")))))
      .select(col(idCol), col("token_id"), col("tf"), col("df"), col("weight"))
  }

  /** Fixed-point grid for the per-(query, doc) score sum: weights are
    * snapped to the 2^-35 grid and summed as LONGS, which is exact and
    * fully order/association-independent — no collect-and-sort fold
    * needed for bit-determinism. Headroom: weight ≤ ~30 (idf ≤ ln n,
    * tf factor ≤ k1+1) → ≤ 2^40 per term, × ≤ [[Kernel.MaxLength]]=512
    * distinct query terms → ≤ 2^49, inside both long range and the
    * 2^53 exact-double window for the final /2^35. */
  val ScoreScale: Double = math.pow(2.0, 35)

  /** BM25 top-k search: tokenize queries, broadcast their DISTINCT term
    * sets, semi-join the document-side weights (corpus stays put), sum
    * each (query, doc)'s matched weights on the fixed-point grid
    * ([[ScoreScale]]), rank with the partial top-k heap. Ties → lower
    * doc id. Output (qIdCol, idCol, rank, score).
    *
    * Scale shape: the (query, doc) fold is a plain codegen'd
    * HashAggregate over an 8-byte long — map-side partials shrink the
    * exchange to one row per matched (query, doc), and there is no
    * ObjectHashAggregate sort-based fallback to fall off at high group
    * counts (the previous sorted-fold collect_list paid exactly that
    * at 100×: 7.5× growth for 10× data, dominated by abandoned
    * 128k-key object maps). */
  def bm25Search(queries: DataFrame, qIdCol: String, qTextCol: String,
                 corpus: DataFrame, idCol: String, textCol: String, k: Int,
                 k1: Double = K1, b: Double = B,
                 maxLength: Int = K.MaxLength): DataFrame = {
    val weights = bm25DocWeights(corpus, idCol, textCol, k1, b, maxLength)
    val qTerms = queries.select(col(qIdCol),
      explode(array_distinct(Kernel.tokenIds(col(qTextCol), maxLength))).as("token_id"))
    weights.join(broadcast(qTerms), "token_id")
      .groupBy(col(qIdCol), col(idCol))
      .agg(sum(floor(col("weight") * lit(ScoreScale) + lit(0.5)).cast("long")).as("__sfp"))
      .withColumn("score", col("__sfp").cast("double") / lit(ScoreScale))
      .groupBy(col(qIdCol))
      .agg(graft.functions.TopKAgg.topK(col("score"), col(idCol).cast("long"), k).as("__top"))
      .select(col(qIdCol), posexplode(col("__top")).as(Seq("__r", "__t")))
      .select(col(qIdCol), col("__t.id").as(idCol),
        (col("__r") + 1).as("rank"), col("__t.score").as("score"))
  }

  /** Reciprocal-rank fusion of two ranked legs. Inputs are
    * (qIdCol, idCol, rankCol) frames (any extra columns ignored); a doc
    * absent from a leg contributes 0 from that leg. score =
    * 1/(kRrf+rank_a) + 1/(kRrf+rank_b) summed in fixed leg order, so
    * the doubles are bit-deterministic; ties → lower doc id.
    * Output (qIdCol, idCol, rank, score).
    *
    * Scale shape: both legs are already ≤ k·queries rows (top-k
    * outputs), so the fusion join and final ranking are toy-sized
    * regardless of corpus scale. */
  def rrfFuse(legA: DataFrame, legB: DataFrame, qIdCol: String, idCol: String,
              k: Int, kRrf: Int = RrfK, rankCol: String = "rank"): DataFrame = {
    val a = legA.select(col(qIdCol), col(idCol), col(rankCol).as("__ra"))
    val b = legB.select(col(qIdCol), col(idCol), col(rankCol).as("__rb"))
    a.join(b, Seq(qIdCol, idCol), "full_outer")
      .withColumn("score",
        coalesce(lit(1.0) / (lit(kRrf.toDouble) + col("__ra").cast("double")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(kRrf.toDouble) + col("__rb").cast("double")), lit(0.0)))
      .groupBy(col(qIdCol))
      .agg(graft.functions.TopKAgg.topK(col("score"), col(idCol).cast("long"), k).as("__top"))
      .select(col(qIdCol), posexplode(col("__top")).as(Seq("__r", "__t")))
      .select(col(qIdCol), col("__t.id").as(idCol),
        (col("__r") + 1).as("rank"), col("__t.score").as("score"))
  }
}
