package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{K, Kernel}

/** Persisted incremental BM25 index — the lexical twin of
  * [[VectorIndex]] (BM25 semantics per [[FullText]]; Robertson/Okapi
  * with the same k1/b defaults, idf grid, and fixed-point score fold).
  *
  * [[FullText.bm25Search]] re-tokenizes and re-weights the WHOLE corpus
  * per call. At 100 TB that per-query-batch cost is the corpus. The
  * subtlety a persisted form must solve: document-side BM25 weights
  * depend on GLOBAL statistics (df, n_docs, avgdl) that change with
  * every ingest — persisting weights would leave the whole index stale
  * after one append. So this index persists what appends CANNOT stale:
  *
  *   - `<table>_postings` — (token_id, doc_id, tf, dl): the inverted
  *     file, bucketed AND sorted on token_id, append-only. tf and dl are
  *     per-document facts; no global statistic touches them.
  *   - `<table>_df` — (token_id, df) PARTIAL rows: each build/append
  *     adds its batch's per-token document counts; the true df is the
  *     sum — a vocab-sized (never corpus-sized) aggregation.
  *   - `<table>_meta` — (n_docs, total_len) partial rows, same contract.
  *   - `<table>_conf` — (num_buckets, max_length): construction params;
  *     mismatched appends/queries refuse loudly (DedupIndex's rule).
  *
  * [[searchTopK]] derives weights ON THE FLY from the CURRENT summed
  * statistics, so results are always exactly what a fresh
  * [[FullText.bm25Search]] over the accumulated corpus would return
  * (q141 hash-gates that equivalence through a build + append). Query
  * cost: the postings scan is pruned to the query terms — the term set
  * is batch-bounded (≤ maxLength distinct tokens per query), so small
  * batches push an `IN` predicate into the parquet scan (row-group
  * skipping on the sorted token_id column); larger batches fall back to
  * a broadcast semi join. df/meta sums are vocab-sized and one-row-sized
  * respectively; [[recapStats]] folds accumulated partials back to one
  * row per token on the maintenance cadence. */
object FullTextIndex {

  /** Above this many distinct query terms the pushed-down IN predicate
    * stops paying (plan size) and the scan filters via broadcast semi
    * join instead. */
  val PushdownTermLimit: Int = 4096

  /** Build the index over a corpus: one tokenize pass feeds postings,
    * df partials, and the meta partial. */
  def write(corpus: DataFrame, idCol: String, textCol: String,
            table: String, numBuckets: Int = 32,
            maxLength: Int = K.MaxLength): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    DedupIndex.prepareManagedTable(spark, s"${table}_postings")
    DedupIndex.prepareManagedTable(spark, s"${table}_df")
    DedupIndex.prepareManagedTable(spark, s"${table}_meta")
    DedupIndex.prepareManagedTable(spark, s"${table}_conf")
    Seq((numBuckets, maxLength)).toDF("num_buckets", "max_length")
      .coalesce(1).write.mode("overwrite").format("parquet")
      .saveAsTable(s"${table}_conf")
    appendInto(spark, corpus, idCol, textCol, table, numBuckets, maxLength)
  }

  /** Grow the index with an ingest batch (new ids by contract): one
    * tokenize pass over JUST the batch — postings rows append into the
    * bucketed table, df/meta partials stack for the query-time sum. */
  def appendBatch(spark: SparkSession, batch: DataFrame, idCol: String,
                  textCol: String, table: String): Unit = {
    val (numBuckets, maxLength) = conf(spark, table)
    appendInto(spark, batch, idCol, textCol, table, numBuckets, maxLength)
  }

  private def appendInto(spark: SparkSession, batch: DataFrame,
                         idCol: String, textCol: String, table: String,
                         numBuckets: Int, maxLength: Int): Unit = {
    // the exact tf/dl/stats derivation of FullText.bm25DocWeightsTokens
    // — one tokenize pass shared by all three tables via the lazy
    // lineage cut; n_docs/total_len count EVERY doc (a zero-token doc
    // contributes no posting but still lowers avgdl — the batch operator
    // counts it, so the index must too or the weights diverge)
    val toks = batch
      .select(col(idCol).cast("long").as("doc_id"),
        Kernel.tokenIds(col(textCol), maxLength).as("__tids"))
      .localCheckpoint(false)
    val tf = toks
      .select(col("doc_id"), size(col("__tids")).cast("long").as("__dl"),
        explode(col("__tids")).as("token_id"))
      .groupBy(col("doc_id"), col("token_id"))
      .agg(count(lit(1)).as("tf"), max(col("__dl")).as("dl"))
      .localCheckpoint(false)
    tf.select(col("token_id"), col("doc_id"), col("tf"), col("dl"))
      .write.mode("append").format("parquet")
      .bucketBy(numBuckets, "token_id").sortBy("token_id")
      .saveAsTable(s"${table}_postings")
    tf.groupBy(col("token_id")).agg(count(lit(1)).as("df"))
      .write.mode("append").format("parquet")
      .saveAsTable(s"${table}_df")
    toks
      .agg(count(lit(1)).as("n_docs"),
        sum(size(col("__tids")).cast("long")).as("total_len"))
      .coalesce(1).write.mode("append").format("parquet")
      .saveAsTable(s"${table}_meta")
  }

  /** BM25 top-k over the index with CURRENT statistics — bit-identical
    * to [[FullText.bm25Search]] over the accumulated corpus (same idf
    * grid, same weight tree, same fixed-point score fold, same top-k tie
    * rule). Output (qIdCol, doc_id, rank, score). */
  def searchTopK(spark: SparkSession, queries: DataFrame, qIdCol: String,
                 qTextCol: String, table: String, k: Int,
                 k1: Double = FullText.K1, b: Double = FullText.B): DataFrame = {
    val (_, maxLength) = conf(spark, table)
    val qTerms = queries.select(col(qIdCol),
        explode(array_distinct(Kernel.tokenIds(col(qTextCol), maxLength)))
          .as("token_id"))
      .localCheckpoint(false)
    val termIds = qTerms.select(col("token_id")).distinct()
    // batch-bounded term set → IN predicate lands in the parquet scan
    // (row-group skipping on the sorted token column); wide batches keep
    // the broadcast semi join (corpus side still never shuffles)
    val ids = termIds.collect().map(_.getLong(0)).sorted
    def prune(t: DataFrame): DataFrame =
      if (ids.length <= PushdownTermLimit) t.filter(col("token_id").isin(ids: _*))
      else t.join(broadcast(termIds), Seq("token_id"), "left_semi")
    val post = prune(spark.table(s"${table}_postings"))
    val dfNow = prune(spark.table(s"${table}_df"))
      .groupBy(col("token_id")).agg(sum(col("df")).as("df"))
    val nd = spark.table(s"${table}_meta")
      .agg(sum(col("n_docs")).as("__n_docs"), sum(col("total_len")).as("__total_len"))
    val weights = post
      .join(broadcast(dfNow), "token_id")
      .crossJoin(broadcast(nd))
      .withColumn("__avgdl",
        col("__total_len").cast("double") / col("__n_docs").cast("double"))
      .withColumn("weight",
        FullText.idfQ(col("df"), col("__n_docs")) *
          (col("tf").cast("double") * lit(k1 + 1.0)) /
          (col("tf").cast("double") +
            lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl").cast("double") / col("__avgdl")))))
    weights.join(broadcast(qTerms), "token_id")
      .groupBy(col(qIdCol), col("doc_id"))
      .agg(sum(floor(col("weight") * lit(FullText.ScoreScale) + lit(0.5))
        .cast("long")).as("__sfp"))
      .withColumn("score", col("__sfp").cast("double") / lit(FullText.ScoreScale))
      .groupBy(col(qIdCol))
      .agg(graft.functions.TopKAgg.topK(col("score"), col("doc_id"), k).as("__top"))
      .select(col(qIdCol), posexplode(col("__top")).as(Seq("__r", "__t")))
      .select(col(qIdCol), col("__t.id").as("doc_id"),
        (col("__r") + 1).as("rank"), col("__t.score").as("score"))
  }

  /** Removal requests (the lexical twin of [[VectorIndex.delete]], but
    * with IMMEDIATE statistics effect — BM25 weights depend on df/avgdl,
    * so a masked-but-counted doc would keep skewing every score): the
    * removed docs' postings rewrite out of the inverted file, and their
    * statistics leave as NEGATIVE partial rows (df per token, n_docs /
    * total_len) that the query-time sums absorb — [[recapStats]] folds
    * them away on the maintenance cadence. Contract: every id was
    * ingested exactly once (ids are permanent identities; the n_docs
    * delta is the id count because a zero-token doc leaves no posting to
    * discover it by). Cost: one postings rewrite (inverted-file-sized,
    * the unavoidable part) + batch-sized delta rows. */
  def removeDocs(spark: SparkSession, ids: DataFrame, idCol: String,
                 table: String): Unit = {
    val (numBuckets, _) = conf(spark, table)
    val drop = ids.select(col(idCol).cast("long").as("doc_id")).distinct()
      .localCheckpoint(true)
    val post = spark.table(s"${table}_postings")
    val removed = post.join(drop, Seq("doc_id"), "left_semi").localCheckpoint(true)
    val kept = post.join(drop, Seq("doc_id"), "left_anti").localCheckpoint(true)
    DedupIndex.prepareManagedTable(spark, s"${table}_postings")
    kept.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, "token_id").sortBy("token_id")
      .saveAsTable(s"${table}_postings")
    removed.groupBy(col("token_id"))
      .agg((-count(lit(1))).as("df"))
      .write.mode("append").format("parquet").saveAsTable(s"${table}_df")
    val nDel = drop.count()
    val lenRow = removed.groupBy(col("doc_id")).agg(max(col("dl")).as("dl"))
      .agg(sum(col("dl")).as("s")).collect()(0)
    val totLen = if (lenRow.isNullAt(0)) 0L else lenRow.getLong(0)
    import spark.implicits._
    Seq((-nDel, -totLen)).toDF("n_docs", "total_len")
      .coalesce(1).write.mode("append").format("parquet")
      .saveAsTable(s"${table}_meta")
  }

  /** Maintenance: fold the accumulated df/meta partial rows back to one
    * row per token / one row total. Results are unchanged (the query
    * path sums partials anyway); this bounds the partial-table growth at
    * one row-set per append. Vocab-sized I/O, never corpus-sized. */
  def recapStats(spark: SparkSession, table: String): Unit = {
    val df = spark.table(s"${table}_df")
      .groupBy(col("token_id")).agg(sum(col("df")).as("df"))
      .localCheckpoint(true)
    DedupIndex.prepareManagedTable(spark, s"${table}_df")
    df.write.mode("overwrite").format("parquet").saveAsTable(s"${table}_df")
    val meta = spark.table(s"${table}_meta")
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("total_len")).as("total_len"))
      .localCheckpoint(true)
    DedupIndex.prepareManagedTable(spark, s"${table}_meta")
    meta.coalesce(1).write.mode("overwrite").format("parquet")
      .saveAsTable(s"${table}_meta")
  }

  private def conf(spark: SparkSession, table: String): (Int, Int) = {
    require(spark.catalog.tableExists(s"${table}_conf"),
      s"FullTextIndex $table has no _conf table — not a written index")
    val r = spark.table(s"${table}_conf").collect()(0)
    (r.getAs[Int]("num_buckets"), r.getAs[Int]("max_length"))
  }
}
