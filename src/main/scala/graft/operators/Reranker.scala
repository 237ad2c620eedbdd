package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  import graft.functions.K

  /** Pair encoding (P2, /root/reference/src/reranking/impl.rs:123-148):
    * the (query, document) pair as ONE sequence with segment ids — query
    * segment 0, document segment 1 — under a shared truncation budget of
    * `maxLen` total tokens (the query keeps its tokens, the document
    * fills the remainder: the "only_second" truncation dialect). Returns
    * struct(input_ids: array<bigint>, token_type_ids: array<bigint>)
    * parallel arrays — the cross-encoder input shape a real ONNX backend
    * consumes. */
  def pairEncode(query: Column, doc: Column, maxLen: Int = K.MaxLength): Column = {
    val qt = Kernel.tokenIds(query, maxLen)
    val dt = Kernel.tokenIds(doc, maxLen)
    struct(
      slice(concat(qt, dt), 1, maxLen).as("input_ids"),
      // segment ids built per-array (0s like qt, 1s like dt) then
      // truncated identically — no index lambda, so the tokenizer chain
      // is never inlined into a per-element lambda body
      slice(concat(transform(qt, _ => lit(0L)), transform(dt, _ => lit(1L))),
        1, maxLen).as("token_type_ids"))
  }

  /** P2 over the REAL vocab: BERT-style pair encoding
    * `[CLS] A [SEP] B [SEP]` with segment ids and the "only_second"
    * truncation dialect (src/reranking/impl.rs:123-148 — only the
    * document side shrinks to fit the budget; the closing [SEP] is
    * appended after). `docEncoded` is a [[graft.functions.WordPieceIds]]
    * output column ([CLS] body [SEP]); the query side is constant per
    * plan, so its pieces ride as literals. Mirrors
    * [[graft.model.WordPieceModel.encodePair]] exactly (spec-pinned). */
  def wordPiecePairEncode(queryWords: Seq[String], docEncoded: Column,
                          model: graft.model.WordPieceModel,
                          maxLen: Int): Column = {
    val qIds = queryWords.flatMap(model.tokenizeWord)
    val budgetB = maxLen - qIds.length - 3
    require(budgetB > 0, s"maxLen $maxLen leaves no room for the second sequence")
    val body = slice(docEncoded, lit(2), size(docEncoded) - 2) // strip [CLS]/[SEP]
    val bTr = slice(body, 1, budgetB)
    val head = array((model.clsId +: qIds :+ model.sepId).map(lit): _*)
    val zeros = array(Seq.fill(qIds.length + 2)(lit(0L)): _*)
    struct(
      concat(head, bTr, array(lit(model.sepId))).as("input_ids"),
      concat(zeros, transform(bTr, _ => lit(1L)), array(lit(1L))).as("token_type_ids"))
  }

  /** Token-set Jaccard scorer as one native pass
    * ([[graft.functions.TokenSetJaccard]]) — exact integer set sizes,
    * bit-identical to the distinct/intersect/union HOF chain. */
  private def jaccardScore(aTids: Column, bTids: Column): Column = {
    val bridge = org.apache.spark.sql.graftbridge.Bridge
    bridge.column(graft.functions.TokenSetJaccard(
      bridge.expression(aTids), bridge.expression(bTids)))
  }

  /** Multi-query rerank — the natural Spark generalization of the
    * reference's one-query `rerank` (its tests rerank batches of docs per
    * query): every (query, document) pair scored in one plan. The query
    * side broadcasts (small), the doc corpus streams partition-local —
    * one corpus scan for ALL queries, no shuffle. Output:
    * (qIdCol, index = original doc id, score); order within a query is
    * recovered by `ORDER BY score DESC, index ASC`. */
  def rerankAll(queries: DataFrame, qIdCol: String, qTextCol: String,
                docs: DataFrame, idCol: String, textCol: String,
                returnDocuments: Boolean = false): DataFrame = {
    val scored = docs
      .withColumn("__dt", Kernel.tokenIds(col(textCol)))
      .crossJoin(broadcast(
        // distinct once per query row (a no-op for the kernel's own
        // dedup, but it shrinks the broadcast payload and the per-pair
        // hash-set build)
        queries.select(col(qIdCol),
          array_distinct(Kernel.tokenIds(col(qTextCol))).as("__qt"))))
      .withColumn("score", jaccardScore(col("__dt"), col("__qt")))
    val base = scored.select(
      (col(qIdCol) +: col(idCol).as("index") +: col("score") +:
        (if (returnDocuments) Seq(col(textCol).as("document")) else Nil)): _*)
    base
  }

  /** Scale path of [[rerankAll]]: keep only each query's top-k docs via
    * the partial top-k aggregate — ≤ k rows per query per map task reach
    * the exchange, so reranking a 100 TB corpus against a query batch
    * never sorts or shuffles the scored product (the full-ordering
    * variant is a global sort by construction). Output:
    * (qIdCol, index, rank, score). */
  def rerankTopK(queries: DataFrame, qIdCol: String, qTextCol: String,
                 docs: DataFrame, idCol: String, textCol: String,
                 k: Int): DataFrame =
    rerankAll(queries, qIdCol, qTextCol, docs, idCol, textCol)
      .groupBy(col(qIdCol))
      .agg(graft.functions.TopKAgg.topK(col("score"), col("index"), k).as("__top"))
      .select(col(qIdCol), posexplode(col("__top")).as(Seq("__r", "__t")))
      .select(col(qIdCol), col("__t.id").as("index"),
        (col("__r") + 1).as("rank"), col("__t.score").as("score"))

  /** Segment-id fold-in constant for the backend route: combined token
    * stream = input_ids[i] + token_type_ids[i]·(B2 % M) — the document
    * segment hashes into a distinct id space, so the cross-encoder sees
    * WHICH side each token came from (the role token_type_ids plays in a
    * real pair encoding). Same constant stream as the ColBERT position
    * offset. */
  val SegShift: Long = K.B2 % K.M

  /** Backend-routed multi-query rerank — the reference's actual
    * cross-encoder path (/root/reference/src/reranking/impl.rs:109-196):
    * [[pairEncode]] builds the two-segment encoding, the segment ids
    * fold into the token stream, a [[graft.backend.RawBackend]] forward
    * produces `logits`, and the score is `logits[:, 0]`. Same topology
    * as [[rerankAll]]: queries broadcast, corpus scanned once, narrow.
    * Pairs whose joint encoding is empty are dropped (the reference
    * cannot encode an empty pair). Output: (qIdCol, index, score);
    * recover order with ORDER BY score DESC, index ASC. */
  def rerankBackendAll(queries: DataFrame, qIdCol: String, qTextCol: String,
                       docs: DataFrame, idCol: String, textCol: String,
                       backend: graft.backend.RawBackend =
                         graft.backend.HashingCrossEncoder(),
                       maxLen: Int = K.MaxLength): DataFrame = {
    val paired = docs
      .crossJoin(broadcast(queries.select(col(qIdCol), col(qTextCol))))
      .withColumn("__pair", pairEncode(col(qTextCol), col(textCol), maxLen))
      .withColumn("__ct",
        zip_with(col("__pair.input_ids"), col("__pair.token_type_ids"),
          (t, s) => t + s * lit(SegShift)))
      .filter(size(col("__ct")) > 0)
      .select(col(qIdCol).cast("long").as(qIdCol),
        col(idCol).cast("long").as(idCol), col("__ct"))
    graft.backend.RawBackendEmbedder.scorePairs(paired, qIdCol, idCol, "__ct", backend)
  }

  /** Rerank `docs` against a single query string. Output columns:
    * (index = original id, score double, document string) ordered
    * score desc, index asc. `returnDocuments=false` drops the text column
    * (reference's return_documents flag, impl.rs:185-193). */
  def rerank(spark: SparkSession, docs: DataFrame, idCol: String,
             textCol: String, query: String,
             returnDocuments: Boolean = true): DataFrame = {
    val scored = docs
      .withColumn("score",
        jaccardScore(Kernel.tokenIds(col(textCol)), Kernel.tokenIds(lit(query))))
    val base = scored
      .select(col(idCol).as("index"), col("score"), col(textCol).as("document"))
      .orderBy(col("score").desc, col("index").asc)
    if (returnDocuments) base else base.drop("document")
  }
}
