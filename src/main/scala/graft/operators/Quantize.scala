package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Kernel

/** Embedding quantization — the memory-compression layer a 100 TB vector
  * corpus actually ships: the reference emits full-precision `Vec<f32>`
  * embeddings (/root/reference/src/common.rs:25); at scale those are
  * stored and searched in compressed form. Two standard schemes, both
  * deterministic and oracle-exact:
  *
  *  - SCALAR (int8) quantization: per-dimension min/max over the corpus,
  *    each element mapped to an 8-bit code — 4× footprint cut, search
  *    runs over DEQUANTIZED codes (never the raw vectors), queries stay
  *    full-precision (asymmetric, like PQ's ADC).
  *  - BINARY quantization: one sign bit per dimension packed into 32-bit
  *    words — 32× cut; search is Hamming distance over the packed words
  *    (XOR + popcount, the cheapest distance there is) with an exact
  *    cosine RESCORE of the top candidates to recover ranking quality.
  *
  * All paths are narrow per-row transforms + the shared partial top-k
  * aggregate ([[graft.functions.TopKAgg]]): the corpus never shuffles,
  * candidate ranking emits ≤ k rows per query per map task.
  */
object Quantize {

  /** Per-dimension corpus min/max as ONE row (`__mins`, `__maxs`:
    * array<double>) — the scalar-quantizer's training statistics,
    * computed in-plan (no driver-side action) so [[sqEncode]]/[[sqSearch]]
    * cross-join it as a broadcast. min/max are order-independent exact
    * reductions; the dim-indexed arrays assemble via a deterministic
    * struct sort. */
  def sqStats(corpus: DataFrame, vecCol: String): DataFrame =
    corpus.select(posexplode(col(vecCol)).as(Seq("__d", "__v")))
      .groupBy(col("__d"))
      .agg(min(col("__v").cast("double")).as("__mn"),
        max(col("__v").cast("double")).as("__mx"))
      .agg(array_sort(collect_list(struct(col("__d"), col("__mn"), col("__mx")))).as("__a"))
      .select(transform(col("__a"), s => s("__mn")).as("__mins"),
        transform(col("__a"), s => s("__mx")).as("__maxs"))
      // LAZY lineage cut: encode and search both cross-join this row;
      // without it each reference re-scans the corpus for the same stats
      .localCheckpoint(false)

  /** int8 codes for one vector column given the broadcast stats columns:
    * code_d = floor((v_d - min_d) / (max_d - min_d) * 255 + 0.5), 0 for a
    * constant dimension. Identical expression tree in the SQL oracle. */
  private def sqCodes(vec: Column): Column =
    zip_with(vec, sequence(lit(0), size(vec) - 1), (v, d) => {
      val mn = element_at(col("__mins"), (d + 1).cast("int"))
      val mx = element_at(col("__maxs"), (d + 1).cast("int"))
      when(mx > mn,
        floor(((v.cast("double") - mn) / (mx - mn)) * lit(255.0) + lit(0.5)).cast("long"))
        .otherwise(lit(0L))
    })

  /** Scalar-quantize a corpus: (id, codes: array<bigint> in [0,255]).
    * Narrow — one broadcast cross-join of the 1-row stats, zero corpus
    * shuffle; the encode scales like the dense embed path. */
  def sqEncode(corpus: DataFrame, idCol: String, vecCol: String,
               stats: DataFrame): DataFrame =
    corpus.crossJoin(broadcast(stats))
      .select(col(idCol), sqCodes(col(vecCol)).as("codes"))

  /** Dequantized value array for a codes column (needs `__mins`/`__maxs`
    * in scope): deq_d = min_d + code_d · (max_d - min_d)/255. */
  private def sqDequant(codes: Column): Column =
    zip_with(codes, sequence(lit(0), size(codes) - 1), (c, d) => {
      val mn = element_at(col("__mins"), (d + 1).cast("int"))
      val mx = element_at(col("__maxs"), (d + 1).cast("int"))
      mn + c.cast("double") * ((mx - mn) / lit(255.0))
    })

  /** Asymmetric search over int8 codes: full-precision queries against
    * DEQUANTIZED corpus codes — cosine top-k per query via the partial
    * top-k heap, ties → lower id. The raw corpus vectors never load;
    * state scanned per row is `dim` bytes of codes + the broadcast
    * stats row. Output (qIdCol, cIdCol, rank, score). */
  def sqSearch(queries: DataFrame, qIdCol: String, qVecCol: String,
               codes: DataFrame, cIdCol: String, stats: DataFrame,
               k: Int): DataFrame =
    codes.crossJoin(broadcast(stats))
      .withColumn("__deq", sqDequant(col("codes")))
      .withColumn("__cn", Kernel.vecNorm(col("__deq")))
      .crossJoin(broadcast(queries.select(col(qIdCol), col(qVecCol))
        .withColumn("__qn", Kernel.vecNorm(col(qVecCol)))))
      .withColumn("score", Kernel.cosinePre(
        col("__deq"), col(qVecCol), col("__cn"), col("__qn")))
      .groupBy(col(qIdCol))
      .agg(graft.functions.TopKAgg.topK(col("score"), col(cIdCol).cast("long"), k).as("__top"))
      .select(col(qIdCol), posexplode(col("__top")).as(Seq("__r", "__t")))
      .select(col(qIdCol), col("__t.id").as(cIdCol),
        (col("__r") + 1).as("rank"), col("__t.score").as("score"))

  /** Matryoshka (MRL) truncation: keep the first `d` dimensions and
    * re-L2-normalize — the representation-learning footprint cut (a
    * 64→16 slice is a 4× cut with most of the ranking quality kept when
    * the model was MRL-trained). Elements widen to double BEFORE the
    * norm fold so the arithmetic matches the SQL oracle exactly (a
    * float·float square differs from the widened double square in the
    * last ulp). Narrow, codegen'd built-ins only. */
  def matryoshka(vec: Column, d: Int): Column =
    Kernel.l2normalize(transform(slice(vec, 1, d), x => x.cast("double")))

  /** Adaptive retrieval over truncated embeddings: a cheap top-`nCandidates`
    * cosine pass in the `d`-dim truncated space, then an exact
    * full-dimension cosine rescore of only those candidates — same shape
    * as [[binarySearchRescored]] (candidates broadcast; the full-width
    * vectors never shuffle). Output (qIdCol, cIdCol, rank, score). */
  def matryoshkaSearchRescored(queries: DataFrame, qIdCol: String, qVecCol: String,
                               corpus: DataFrame, cIdCol: String, cVecCol: String,
                               d: Int, nCandidates: Int, k: Int): DataFrame = {
    val qT = queries.select(col(qIdCol), matryoshka(col(qVecCol), d).as("__qt"))
    val cT = corpus.select(col(cIdCol), matryoshka(col(cVecCol), d).as("__ct"))
    val cands = Similarity.knnJoin(qT, qIdCol, "__qt", cT, cIdCol, "__ct", nCandidates)
      .select(col(qIdCol), col(cIdCol))
      .join(broadcast(queries.select(col(qIdCol), col(qVecCol))
        .withColumn("__qn", Kernel.vecNorm(col(qVecCol)))), Seq(qIdCol))
    corpus.withColumn("__cn", Kernel.vecNorm(col(cVecCol)))
      .join(broadcast(cands), Seq(cIdCol))
      .withColumn("score", Kernel.cosinePre(
        col(cVecCol), col(qVecCol), col("__cn"), col("__qn")))
      .groupBy(col(qIdCol))
      .agg(graft.functions.TopKAgg.topK(col("score"), col(cIdCol).cast("long"), k).as("__top"))
      .select(col(qIdCol), posexplode(col("__top")).as(Seq("__r", "__t")))
      .select(col(qIdCol), col("__t.id").as(cIdCol),
        (col("__r") + 1).as("rank"), col("__t.score").as("score"))
  }

  /** Sign-bit binary signature of a `dim`-wide vector as ceil(dim/32)
    * packed 32-bit words (array<bigint>, each in [0, 2^32)): bit j of
    * word w is set iff v_{32w+j} > 0. The unrolled per-bit sum keeps the
    * whole expression in codegen'd built-ins and mirrors term-for-term
    * into the SQL oracle (32-bit words so every value stays positive —
    * no sign-bit hazards in either engine). */
  def binarySig(vec: Column, dim: Int): Column = {
    val nWords = (dim + 31) / 32
    val words = (0 until nWords).map { w =>
      (0 until 32).filter(j => w * 32 + j < dim).map { j =>
        when(element_at(vec, w * 32 + j + 1).cast("double") > lit(0.0),
          lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
    }
    array(words: _*)
  }

  /** Binary-quantize a corpus: (id, sig: array<bigint>). Narrow. */
  def binaryEncode(corpus: DataFrame, idCol: String, vecCol: String,
                   dim: Int): DataFrame =
    corpus.select(col(idCol), binarySig(col(vecCol), dim).as("sig"))

  /** Hamming distance between two packed-word signature columns:
    * Σ_w popcount(a_w XOR b_w). */
  def hamming(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
      lit(0L), (acc, x) => acc + x)

  /** Hamming top-k over binary signatures: each query's `k` nearest
    * corpus signatures by packed-word Hamming distance (ties → lower
    * id). Distance is XOR+popcount over `dim/32` words — the cheapest
    * scan there is; ranking is the partial top-k heap on the negated
    * distance. Output (qIdCol, cIdCol, rank, hamming). */
  def hammingTopK(querySigs: DataFrame, qIdCol: String,
                  corpusSigs: DataFrame, cIdCol: String, k: Int): DataFrame =
    corpusSigs.withColumnRenamed("sig", "__csig")
      .crossJoin(broadcast(querySigs.select(col(qIdCol), col("sig").as("__qsig"))))
      .withColumn("__h", hamming(col("__csig"), col("__qsig")))
      .groupBy(col(qIdCol))
      .agg(graft.functions.TopKAgg.topK(-col("__h").cast("double"),
        col(cIdCol).cast("long"), k).as("__top"))
      .select(col(qIdCol), posexplode(col("__top")).as(Seq("__r", "__t")))
      .select(col(qIdCol), col("__t.id").as(cIdCol),
        (col("__r") + 1).as("rank"), (-col("__t.score")).cast("long").as("hamming"))

  /** Binary ANN with exact rescore — the production shape: a cheap
    * Hamming pass over packed signatures selects `nCandidates` per
    * query, then ONLY those rows' raw vectors load for an exact cosine
    * top-k. The candidate set (queries × nCandidates rows) broadcasts,
    * so the rescore join streams the corpus partition-local — the raw
    * vectors shuffle nowhere. Output (qIdCol, cIdCol, rank, score). */
  def binarySearchRescored(queries: DataFrame, qIdCol: String, qVecCol: String,
                           corpus: DataFrame, cIdCol: String, cVecCol: String,
                           dim: Int, nCandidates: Int, k: Int): DataFrame = {
    val qSigs = queries.select(col(qIdCol), binarySig(col(qVecCol), dim).as("sig"))
    val cSigs = binaryEncode(corpus, cIdCol, cVecCol, dim)
    val cands = hammingTopK(qSigs, qIdCol, cSigs, cIdCol, nCandidates)
      .select(col(qIdCol), col(cIdCol))
      .join(broadcast(queries.select(col(qIdCol), col(qVecCol))
        .withColumn("__qn", Kernel.vecNorm(col(qVecCol)))), Seq(qIdCol))
    corpus.withColumn("__cn", Kernel.vecNorm(col(cVecCol)))
      .join(broadcast(cands), Seq(cIdCol))
      .withColumn("score", Kernel.cosinePre(
        col(cVecCol), col(qVecCol), col("__cn"), col("__qn")))
      .groupBy(col(qIdCol))
      .agg(graft.functions.TopKAgg.topK(col("score"), col(cIdCol).cast("long"), k).as("__top"))
      .select(col(qIdCol), posexplode(col("__top")).as(Seq("__r", "__t")))
      .select(col(qIdCol), col("__t.id").as(cIdCol),
        (col("__r") + 1).as("rank"), col("__t.score").as("score"))
  }
}
