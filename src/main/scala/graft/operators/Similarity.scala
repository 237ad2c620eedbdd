package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{K, Kernel}

/** Similarity / ranking queries (/root/reference/src/similarity.rs:14-40 and
  * the rerank top-k pattern). All top-k paths go through
  * `ORDER BY score DESC, id ASC LIMIT k`, which Spark plans as
  * TakeOrderedAndProject — per-partition heaps + a single driver merge of
  * k·numPartitions rows, no full sort and no shuffle of the corpus. */
object Similarity {

  /** Score every corpus row against one broadcast query vector and return
    * the best k: the reference's `top_k` (src/similarity.rs:31-40), with
    * `id` as the deterministic tiebreaker (Rust total_cmp keeps original
    * order for ties; doc order ≙ id order here). */
  def topK(corpus: DataFrame, vecCol: String, idCol: String,
           queryVec: Seq[Double], k: Int): DataFrame = {
    val q = lit(queryVec.toArray)
    corpus
      .withColumn("score", Kernel.cosine(col(vecCol), q))
      .select(col(idCol), col("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** k-NN join: for each row of `queries` (small side — broadcast), the top
    * k corpus rows by cosine. The corpus is never shuffled; the per-query
    * ranking is a window over the joined result partitioned by query id.
    * At 100 TB the corpus side streams partition-local through the
    * broadcast nested-loop join, so cost is one corpus scan total. */
  def knnJoin(queries: DataFrame, qIdCol: String, qVecCol: String,
              corpus: DataFrame, cIdCol: String, cVecCol: String,
              k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val joined = corpus.crossJoin(broadcast(queries))
      .withColumn("score", Kernel.cosine(col(cVecCol), col(qVecCol)))
    val w = Window.partitionBy(col(qIdCol))
      .orderBy(col("score").desc, col(cIdCol).asc)
    joined
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qIdCol), col(cIdCol), col("rank"), col("score"))
  }

  /** Deterministic sign-LSH bucket id over `nPlanes` pseudo-random
    * hyperplanes: bit p = (v · plane_p > 0). Plane p dim d weight =
    * cell-hash scaled to (-1,1) — same integer-arithmetic stream as the
    * projector, so the oracle reproduces it exactly. */
  def lshBucket(vec: Column, dim: Int, nPlanes: Int): Column = {
    // dot(v, plane_p) as a fold over dims (order fixed → deterministic)
    def planeDot(p: Int): Column =
      aggregate(
        zip_with(vec, sequence(lit(0L), lit(dim - 1L)), (x, d) =>
          x.cast("double") *
            ((Kernel.cell(lit(p.toLong + 7L), d).cast("double") / lit(K.M.toDouble)) * lit(2.0) - lit(1.0))),
        lit(0.0), (a, x) => a + x)
    (0 until nPlanes).map(p => when(planeDot(p) > lit(0.0), lit(1L << p)).otherwise(lit(0L)))
      .reduce(_ + _)
  }

  /** ANN via sign-LSH: queries only compare against corpus rows in the same
    * bucket — the scale path for similarity search (candidate set shrinks
    * ~2^nPlanes-fold; bucket join is a hash join on the bucket id instead
    * of a cross join). Recall is traded for throughput; the brute-force
    * `knnJoin` stays the exact baseline. */
  def annLshJoin(queries: DataFrame, qIdCol: String, qVecCol: String,
                 corpus: DataFrame, cIdCol: String, cVecCol: String,
                 dim: Int, nPlanes: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val qb = queries.withColumn("bucket", lshBucket(col(qVecCol), dim, nPlanes))
    val cb = corpus.withColumn("bucket", lshBucket(col(cVecCol), dim, nPlanes))
    val joined = cb.join(broadcast(qb), Seq("bucket"))
      .withColumn("score", Kernel.cosine(col(cVecCol), col(qVecCol)))
    val w = Window.partitionBy(col(qIdCol))
      .orderBy(col("score").desc, col(cIdCol).asc)
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qIdCol), col(cIdCol), col("bucket"), col("rank"), col("score"))
  }
}
