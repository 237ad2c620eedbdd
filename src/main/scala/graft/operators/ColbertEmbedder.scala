package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{K, Kernel}

/** ColBERT-style multi-vector output: one unit-norm vector per kept token.
  * Reference semantics (/root/reference/src/bgem3_embedding/impl.rs:272-295):
  * keep per-token vectors for mask=1 positions offset by one (the model
  * drops the CLS slot: colbert_shape[1] == seq_len-1), so a doc truncated
  * to max_length=5 yields exactly 4 token vectors
  * (/root/reference/tests/bgem3.rs:221-236).
  *
  * Here: token at position p (p ≥ 1, 0-based — position 0 is the dropped
  * CLS analogue) maps to the L2-normalized projector vector of (token id,
  * position) so repeated tokens get distinct vectors, like contextual
  * embeddings. Narrow per-row computation — no shuffle.
  */
object ColbertEmbedder {

  /** Unit-norm `dim`-vector for one (token id, position). Integer cell
    * stream offset by position so the same token at two positions differs.
    * Native kernel ([[graft.functions.TokenVec]]); [[tokenVectorHof]]
    * keeps the HOF formulation the oracle mirrors (bit-identical,
    * spec-asserted). */
  def tokenVector(tid: Column, pos: Column, dim: Int): Column = {
    val bridge = org.apache.spark.sql.graftbridge.Bridge
    bridge.column(graft.functions.TokenVec(
      bridge.expression(tid), bridge.expression(pos.cast("long")), dim))
  }

  /** HOF formulation of [[tokenVector]]. */
  def tokenVectorHof(tid: Column, pos: Column, dim: Int): Column = {
    val raw = transform(
      sequence(lit(0L), lit(dim - 1L)),
      d => (Kernel.cell(tid + pos * lit(K.B2 % K.M), d).cast("double") /
        lit(K.M.toDouble)) * lit(2.0) - lit(1.0))
    Kernel.l2normalize(raw)
  }

  /** Exploded form: (idCol, pos, vec: array<double>) — one row per kept
    * token, pos 1-based over the truncated token sequence (CLS analogue at
    * pos 0 dropped). */
  def colbertExploded(df: DataFrame, idCol: String, textCol: String,
                      dim: Int, maxLength: Int = K.MaxLength): DataFrame =
    df.select(col(idCol), posexplode(Kernel.tokenIds(col(textCol), maxLength)).as(Seq("pos", "token_id")))
      .filter(col("pos") >= 1)
      .withColumn("vec", tokenVector(col("token_id"), col("pos"), dim))
      .select(col(idCol), col("pos"), col("vec"))

  /** Reference-shaped: one row per doc, colbert: array<array<double>> in
    * position order. */
  def colbert(df: DataFrame, idCol: String, textCol: String,
              dim: Int, maxLength: Int = K.MaxLength): DataFrame =
    colbertExploded(df, idCol, textCol, dim, maxLength)
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("pos"), col("vec")))).as("pv"))
      .select(col(idCol), transform(col("pv"), p => p("vec")).as("colbert"))
}
