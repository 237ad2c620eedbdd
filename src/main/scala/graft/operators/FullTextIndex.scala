package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.{FileSystem, Path}
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
  * after one append. So this index persists what appends CANNOT stale,
  * as one self-contained directory (copyable like [[VectorIndex]]'s):
  *
  *   - `<path>/postings` — (token_id, doc_id, tf, dl): the inverted
  *     file, clustered AND sorted on token_id (row-group stats →
  *     predicate skipping), append-only. tf and dl are per-document
  *     facts; no global statistic touches them.
  *   - `<path>/df` — (token_id, df) PARTIAL rows: each build/append
  *     adds its batch's per-token document counts; the true df is the
  *     sum — a vocab-sized (never corpus-sized) aggregation.
  *   - `<path>/meta` — (n_docs, total_len) partial rows, same contract.
  *   - `<path>/conf` — (max_length): construction params.
  *
  * [[searchTopK]] derives weights ON THE FLY from the CURRENT summed
  * statistics, so results are always exactly what a fresh
  * [[FullText.bm25Search]] over the accumulated corpus would return
  * (q141/q143 hash-gate that equivalence through batch and streamed
  * appends). Query cost: the postings scan is pruned to the query
  * terms — batch-bounded (≤ maxLength distinct tokens per query), so
  * small batches push an `IN` predicate into the parquet scan; larger
  * batches fall back to a broadcast semi join.
  *
  * '''Appends are atomic''' ([[appendInto]]): the batch's postings, df
  * and meta parts stage under `<path>/_append`, a READY marker commits,
  * and part files MOVE into the live tables by rename — so the three
  * non-transactional writes land together or not at all, and the
  * replay scrub (which derives negative deltas from live postings) can
  * never subtract statistics a crashed attempt only partially added.
  * The conf table is the build's commit marker (written last; every
  * read path requires it), so a half-built index refuses rather than
  * serves.
  *
  * '''Removal is crash-safe by staging + rename''' ([[removeDocs]]):
  * stat deltas would be unrecoverable if computed after a partial
  * failure (scrubbed postings can no longer say what left), and
  * re-computing them on a retry double-subtracts. So a removal first
  * STAGES everything it will do — the id set and the negative stat
  * deltas derived from the live postings — under `<path>/_removal`
  * with a READY marker written last, and then applies by (1) an
  * idempotent postings rewrite behind a parked-directory swap and
  * (2) MOVING the staged delta files into the stat directories.
  * Renames are physically exactly-once: a replay moves only what is
  * still in staging, so no delta can apply twice, and [[reconcile]]
  * (run at every entry point) rolls an interrupted removal forward —
  * or discards staging that never reached READY. */
object FullTextIndex {

  /** Above this many distinct query terms the pushed-down IN predicate
    * stops paying (plan size) and the scan filters via broadcast semi
    * join instead. */
  val PushdownTermLimit: Int = 4096

  /** Build the index over a corpus: one tokenize pass feeds postings,
    * df partials, and the meta partial. The conf table is written LAST —
    * it is the commit marker every read path requires, so a build that
    * crashes mid-way leaves a directory [[searchTopK]] REFUSES (no
    * conf) rather than a valid-looking index with partial postings. */
  def write(corpus: DataFrame, idCol: String, textCol: String,
            path: String, maxLength: Int = K.MaxLength): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val fs = hfs(spark, path)
    fs.delete(new Path(path), true)
    appendInto(spark, corpus, idCol, textCol, path, maxLength)
    Seq(Tuple1(maxLength)).toDF("max_length")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/conf")
  }

  /** Grow the index with an ingest batch (new ids by contract): one
    * tokenize pass over JUST the batch — postings rows append as new
    * files, df/meta partials stack for the query-time sum. */
  def appendBatch(spark: SparkSession, batch: DataFrame, idCol: String,
                  textCol: String, path: String): Unit = {
    reconcile(spark, path)
    appendInto(spark, batch, idCol, textCol, path, conf(spark, path))
  }

  /** Upsert: replace the indexed postings (and their df/avgdl
    * contributions — BM25 statistics change IMMEDIATELY, unlike
    * [[VectorIndex]]'s maskable tombstones) for `batch`'s ids with the
    * batch's text — the document re-crawl path, [[VectorIndex.upsert]]'s
    * lexical twin: [[removeDocs]] the ids, then [[appendBatch]] the new
    * versions. Replay-idempotent end to end WITHOUT extra machinery: a
    * crash between the legs leaves a consistent as-if-deleted index, and
    * re-running the whole upsert re-removes whatever version is present
    * (old, new, or none — removal derives its deltas from the live
    * postings) before appending exactly once. Cost: one postings rewrite
    * + one batch-sized tokenize/append — never a corpus re-tokenize. */
  def upsertBatch(spark: SparkSession, batch: DataFrame, idCol: String,
                  textCol: String, path: String): Unit = {
    removeDocs(spark, batch.select(col(idCol)), idCol, path)
    appendBatch(spark, batch, idCol, textCol, path)
  }

  /** One atomic append: postings + df + meta land together or not at
    * all. The three live tables cannot be written transactionally, so
    * the batch's rows are STAGED under `<path>/_append` first, a READY
    * marker commits the append, and the staged part files MOVE into the
    * live directories by rename (physically exactly-once — a replayed
    * move finds nothing left to move). Any interruption resolves at the
    * next entry point: [[reconcile]] rolls a READY append forward or
    * discards staging that never committed. Without this, a crash
    * between the postings write and the df/meta writes would leave a
    * state no scrub can heal — [[removeDocs]] derives its negative
    * stat deltas from the live postings, so it would subtract df/meta
    * contributions the crashed attempt never added, and the re-append
    * would leave the batch's statistics permanently under-counted. */
  private def appendInto(spark: SparkSession, batch: DataFrame,
                         idCol: String, textCol: String, path: String,
                         maxLength: Int): Unit = {
    val fs = hfs(spark, path)
    val ap = new Path(s"$path/_append")
    fs.delete(ap, true)
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
    // cluster + sort by token so parquet row-group stats carry the
    // pushed-down IN (the same discipline as VectorIndex's cell files)
    tf.select(col("token_id"), col("doc_id"), col("tf"), col("dl"))
      .repartition(col("token_id")).sortWithinPartitions("token_id")
      .write.parquet(s"$path/_append/postings")
    tf.groupBy(col("token_id")).agg(count(lit(1)).as("df"))
      .write.parquet(s"$path/_append/df")
    toks
      .agg(count(lit(1)).as("n_docs"),
        sum(size(col("__tids")).cast("long")).as("total_len"))
      .coalesce(1).write.parquet(s"$path/_append/meta")
    fs.create(new Path(ap, "READY"), true).close()
    applyAppend(spark, path)
  }

  /** Roll a READY append forward: move each staged table's part files
    * into its live directory. Rename-based, so a replay moves only what
    * is still staged — no file can land twice. */
  private def applyAppend(spark: SparkSession, path: String): Unit = {
    val fs = hfs(spark, path)
    moveFiles(fs, s"$path/_append/postings", s"$path/postings")
    moveFiles(fs, s"$path/_append/df", s"$path/df")
    moveFiles(fs, s"$path/_append/meta", s"$path/meta")
    fs.delete(new Path(s"$path/_append"), true)
  }

  /** BM25 top-k over the index with CURRENT statistics — bit-identical
    * to [[FullText.bm25Search]] over the accumulated corpus (same idf
    * grid, same weight tree, same fixed-point score fold, same top-k tie
    * rule). Output (qIdCol, doc_id, rank, score). */
  def searchTopK(spark: SparkSession, queries: DataFrame, qIdCol: String,
                 qTextCol: String, path: String, k: Int,
                 k1: Double = FullText.K1, b: Double = FullText.B): DataFrame = {
    val maxLength = conf(spark, path)
    reconcile(spark, path)
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
    val post = prune(spark.read.parquet(s"$path/postings"))
    val dfNow = prune(spark.read.parquet(s"$path/df"))
      .groupBy(col("token_id")).agg(sum(col("df")).as("df"))
    val nd = spark.read.parquet(s"$path/meta")
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
    * so a masked-but-counted doc would keep skewing every score).
    * Crash-safe by the stage-then-rename protocol described in the
    * module doc: any interruption either rolls forward deterministically
    * from the staged snapshot at the next entry point, or (before READY)
    * discards cleanly. Contract: every id was ingested exactly once (ids
    * are permanent identities; a zero-token doc leaves no posting, so
    * its n_docs contribution is not discoverable — staged n_docs counts
    * the removed docs FOUND in the postings). Cost: one postings rewrite
    * (inverted-file-sized, the unavoidable part) + batch-sized staging. */
  def removeDocs(spark: SparkSession, ids: DataFrame, idCol: String,
                 path: String): Unit = {
    reconcile(spark, path)
    val fs = hfs(spark, path)
    val rm = new Path(s"$path/_removal")
    fs.delete(rm, true)
    val drop = ids.select(col(idCol).cast("long").as("doc_id")).distinct()
      .localCheckpoint(true)
    val removed = spark.read.parquet(s"$path/postings")
      .join(drop, Seq("doc_id"), "left_semi").localCheckpoint(true)
    // stage EVERYTHING the apply step will do, deltas included, BEFORE
    // touching any live table — after READY the removal is decided and
    // every later step is replay-idempotent
    drop.coalesce(1).write.parquet(s"$path/_removal/ids")
    removed.groupBy(col("token_id")).agg((-count(lit(1))).as("df"))
      .coalesce(1).write.parquet(s"$path/_removal/df")
    removed.groupBy(col("doc_id")).agg(max(col("dl")).as("dl"))
      .agg((-count(lit(1))).as("n_docs"),
        (-coalesce(sum(col("dl")), lit(0L))).as("total_len"))
      .coalesce(1).write.parquet(s"$path/_removal/meta")
    fs.create(new Path(rm, "READY"), true).close()
    applyRemoval(spark, path)
  }

  /** Roll a READY removal forward. Idempotent end to end: the postings
    * rewrite re-derives the same surviving set, the swap is parked, and
    * the staged delta FILES move by rename — a file already applied is
    * gone from staging, so it can never apply twice. */
  private def applyRemoval(spark: SparkSession, path: String): Unit = {
    val fs = hfs(spark, path)
    val drop = spark.read.parquet(s"$path/_removal/ids")
    val stagedNew = new Path(s"$path/_postings_new")
    fs.delete(stagedNew, true)
    spark.read.parquet(s"$path/postings")
      .join(drop, Seq("doc_id"), "left_anti")
      .repartition(col("token_id")).sortWithinPartitions("token_id")
      .write.parquet(stagedNew.toString)
    swapDir(fs, s"$path/postings", stagedNew.toString)
    moveFiles(fs, s"$path/_removal/df", s"$path/df")
    moveFiles(fs, s"$path/_removal/meta", s"$path/meta")
    fs.delete(new Path(s"$path/_removal"), true)
  }

  /** Maintenance: fold the accumulated df/meta partial rows back to one
    * row per token / one row total. Results are unchanged (the query
    * path sums partials anyway); this bounds the partial-table growth at
    * one row-set per append. Vocab-sized I/O, never corpus-sized; the
    * rewrites swap behind parked directories like every rewrite here. */
  def recapStats(spark: SparkSession, path: String): Unit = {
    reconcile(spark, path)
    val fs = hfs(spark, path)
    def fold(sub: String, agg: DataFrame => DataFrame): Unit = {
      val staged = new Path(s"$path/_${sub}_new")
      fs.delete(staged, true)
      agg(spark.read.parquet(s"$path/$sub"))
        .coalesce(1).write.parquet(staged.toString)
      swapDir(fs, s"$path/$sub", staged.toString)
    }
    fold("df", _.groupBy(col("token_id")).agg(sum(col("df")).as("df")))
    fold("meta", _.agg(sum(col("n_docs")).as("n_docs"),
      sum(col("total_len")).as("total_len")))
  }

  /** Crash recovery, run at every entry point (O(1) exists checks when
    * idle): finish any interrupted parked-directory swap, then either
    * roll a READY removal forward or discard a staging that never
    * committed. */
  def reconcile(spark: SparkSession, path: String): Unit = {
    val fs = hfs(spark, path)
    Seq("postings", "df", "meta").foreach { sub =>
      val old = new Path(s"$path/${sub}_old")
      if (fs.exists(old)) {
        val live = new Path(s"$path/$sub")
        // live missing → crashed between park and rename-in: restore
        if (!fs.exists(live)) fs.rename(old, live)
        else fs.delete(old, true)
      }
      // a staged rewrite that never swapped is garbage — the op reruns
      val staged = new Path(s"$path/_${sub}_new")
      if (fs.exists(staged)) fs.delete(staged, true)
    }
    // an interrupted append resolves BEFORE any removal: a READY append
    // is committed (roll it in so a staged removal's postings rewrite
    // sees it); staging without READY never happened
    val ap = new Path(s"$path/_append")
    if (fs.exists(ap)) {
      if (fs.exists(new Path(ap, "READY"))) applyAppend(spark, path)
      else fs.delete(ap, true)
    }
    val rm = new Path(s"$path/_removal")
    if (fs.exists(rm)) {
      if (fs.exists(new Path(rm, "READY"))) applyRemoval(spark, path)
      else fs.delete(rm, true) // never committed
    }
  }

  /** Park-and-swap a live dir with its staged replacement: live →
    * live_old, staged → live, drop the parked copy only after the swap
    * lands. [[reconcile]] resolves every interruption point. */
  private def swapDir(fs: FileSystem, live: String, staged: String): Unit = {
    val livePath = new Path(live)
    val old = new Path(s"${live}_old")
    fs.delete(old, true)
    if (fs.exists(livePath)) fs.rename(livePath, old)
    fs.rename(new Path(staged), livePath)
    fs.delete(old, true)
  }

  /** Move every parquet part of `src` into `dst` — rename-based, so a
    * replay moves only what is still left (exactly-once application). */
  private def moveFiles(fs: FileSystem, src: String, dst: String): Unit = {
    val srcPath = new Path(src)
    if (!fs.exists(srcPath)) return
    fs.mkdirs(new Path(dst))
    fs.listStatus(srcPath)
      .filter(_.getPath.getName.endsWith(".parquet"))
      .foreach(f => fs.rename(f.getPath, new Path(dst, f.getPath.getName)))
  }

  private def conf(spark: SparkSession, path: String): Int = {
    val fs = hfs(spark, path)
    require(fs.exists(new Path(s"$path/conf")),
      s"FullTextIndex $path has no conf table — not a written index")
    spark.read.parquet(s"$path/conf").collect()(0).getAs[Int]("max_length")
  }

  private def hfs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
}
