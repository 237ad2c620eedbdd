package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.K

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
}
