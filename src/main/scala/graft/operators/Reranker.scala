package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Kernel

/** Cross-encoder rerank analogue (/root/reference/src/reranking/impl.rs:109-196):
  * score every (query, document) pair, return rows ordered by score
  * descending with the original index carried through
  * (RerankResult { document, score, index },
  * /root/reference/src/reranking/init.rs:131-136).
  *
  * The pair scorer here is token-set Jaccard — |Q∩D| / |Q∪D| — computed
  * from exact integer set sizes, so it is deterministic and
  * oracle-checkable, and it preserves the reference's semantic-ranking
  * test property (passages sharing query terms rank first,
  * /root/reference/tests/text-embeddings.rs:297-345).
  *
  * Scale shape: the query side is a broadcast (one or few rows); the doc
  * corpus is scanned once, narrow, then TakeOrderedAndProject if a limit
  * is applied — identical topology to `Similarity.topK`.
  */
object Reranker {

  /** Rerank `docs` against a single query string. Output columns:
    * (index = original id, score double, document string) ordered
    * score desc, index asc. `returnDocuments=false` drops the text column
    * (reference's return_documents flag, impl.rs:185-193). */
  def rerank(spark: SparkSession, docs: DataFrame, idCol: String,
             textCol: String, query: String,
             returnDocuments: Boolean = true): DataFrame = {
    val qTokens = array_distinct(Kernel.tokenIds(lit(query)))
    val scored = docs
      .withColumn("__dt", array_distinct(Kernel.tokenIds(col(textCol))))
      .withColumn("__inter", size(array_intersect(col("__dt"), qTokens)))
      .withColumn("__union", size(array_union(col("__dt"), qTokens)))
      .withColumn("score",
        when(col("__union") === 0, lit(0.0))
          .otherwise(col("__inter").cast("double") / col("__union").cast("double")))
    val base = scored
      .select(col(idCol).as("index"), col("score"), col(textCol).as("document"))
      .orderBy(col("score").desc, col("index").asc)
    if (returnDocuments) base else base.drop("document")
  }
}
