package graft.backend

import graft.functions.K

/** The I4 skeleton: a deterministic, pure-JVM, transformer-SHAPED
  * backend that exercises the pipeline contracts the reference's candle
  * Qwen3 path uniquely stresses — contracts the position-independent
  * [[HashingBackend]] cannot even violate in principle:
  *
  *  - **Left padding to batch-longest**
  *    (/root/reference/src/models/qwen3.rs:1073-1077): every micro-batch
  *    is padded on the LEFT, so the last tensor position is always the
  *    real last token.
  *  - **Additive causal + padding mask** (qwen3.rs:122-147
  *    `build_attention_mask_4d`): a causal term (key after query) and an
  *    inverted-pad term, both ADDED to the raw attention score. The
  *    reference adds −1e4 and lets softmax underflow; here the rational
  *    weight map `max(0, s + mask)` sends masked scores to EXACTLY zero
  *    (implemented as the algebraically-identical position skip, since
  *    an unmasked score is always ≥ 1) — same semantics, bit-reproducible.
  *  - **Mask-derived position ids**: positions are the cumulative sum of
  *    the attention mask minus one (the standard left-pad position rule),
  *    so a token's position is its rank among REAL tokens — this is what
  *    makes the forward batch-size invariant
  *    (/root/reference/tests/text-embeddings.rs:494-523) even though the
  *    computation is genuinely position-dependent. Setting
  *    `maskDerivedPositions=false` (raw tensor index, the classic bug)
  *    makes pad length leak into results — the spec's negative control.
  *  - **RoPE-style position mixing** (qwen3.rs:539-710): query/key token
  *    embeddings are rotated pairwise by a position-dependent angle. The
  *    reference rotates by `θ = pos·inv_freq` via sin/cos; here the
  *    rotation is the exact RATIONAL one through the Pythagorean
  *    parametrization (cos,sin) ∝ (u²−1, 2u), u = pos + pair + 2 (at
  *    u=2: the 3-4-5 triangle) — position-dependent mixing with integer
  *    arithmetic only.
  *  - **Last-token pooling** (qwen3.rs:158-174, 1129-1130): the pooled
  *    vector is the hidden state at tensor index seqLen−1 — correct ONLY
  *    because padding is left; the interplay is the contract.
  *  - **L2 normalize** (qwen3.rs:149-156, eps 1e-12) — the same
  *    expression shape as [[graft.functions.Kernel.l2normalize]].
  *
  * All attention arithmetic is INTEGER (token embeddings, rotations, and
  * scores live in Z_M3; sums are exact longs), so per-row results are
  * independent of every evaluation order and bit-identical to the DuckDB
  * oracle (`OracleSql.q68_transformer_embed`), which computes the same
  * forward with no padding at all — the pad-invariance proof runs
  * through the correctness gate itself.
  */
final case class TransformerBackend(
    dim: Int = 8,
    padId: Long = 0L,
    maskPadding: Boolean = true,
    maskDerivedPositions: Boolean = true,
    // Some(flat [vocab·dim] integer table) → LEARNED token embeddings:
    // in-vocab ids look their row up (the reference's embed_tokens
    // lookup, qwen3.rs:892-925, bank from
    // [[EmbTableBank.loadedQuantized]]), mapped into [0, M3) to keep
    // the attention overflow bounds; out-of-table ids fall back to the
    // hash stream. None → hash embeddings throughout.
    embTable: Option[IndexedSeq[Long]] = None,
    vocabSize: Int = 64) extends EmbeddingBackend {
  // embedBatch pads the whole micro-batch to its longest sequence
  override def padsBatchLongest: Boolean = true
  require(dim % 2 == 0, s"dim must be even for pairwise rotation, got $dim")
  embTable.foreach(t => require(t.length == vocabSize * dim,
    s"embedding table of ${t.length} != $vocabSize x $dim"))

  import K.{M3, A3, B3, C3}

  def embedBatch(batch: Seq[Array[Long]]): Seq[Array[Double]] = {
    if (batch.isEmpty) return Seq.empty
    // batch-longest LEFT padding: the whole micro-batch shares one
    // tensor width, like the reference's encode_batch + PaddingDirection::Left
    val seqLen = math.max(1, batch.iterator.map(_.length).max)
    batch.map { tids =>
      // empty encoding → zero vector (the SQL path filters size > 0)
      if (tids.isEmpty) new Array[Double](dim)
      else {
        val padLen = seqLen - tids.length
        val ids = new Array[Long](seqLen)
        val mask = new Array[Int](seqLen)
        var i = 0
        while (i < padLen) { ids(i) = padId; i += 1 }
        while (i < seqLen) { ids(i) = tids(i - padLen); mask(i) = 1; i += 1 }
        // position ids: cumsum(mask) − 1, clamped at 0 — pads collapse
        // to position 0 (they are masked out as keys anyway), real token
        // r gets position r regardless of pad length
        val pos = new Array[Int](seqLen)
        var c = 0
        i = 0
        while (i < seqLen) {
          if (maskDerivedPositions) {
            if (mask(i) == 1) c += 1
            pos(i) = math.max(0, c - 1)
          } else pos(i) = i // the tensor-index bug: pad length leaks
          i += 1
        }
        // last-token pooling: with left padding, seqLen−1 is always the
        // real last token (qwen3.rs:1129-1130)
        l2normalized(hiddenAt(ids, mask, pos, seqLen - 1))
      }
    }
  }

  /** Token-embedding cell: dim `d` of token `t` in [0, M3) — the
    * learned table row when present and in-vocab (|k| ≤ 2000 < M3, so
    * one `+M3 %M3` lands it in range), the hash stream otherwise.
    * Identical expression to the oracle (t ≥ 0 on every gated path). */
  @inline private def emb(t: Long, d: Int): Long = embTable match {
    case Some(w) if t >= 0 && t < vocabSize =>
      (w((t * dim).toInt + d) % M3 + M3) % M3
    case _ => ((t % M3) * A3 + d.toLong * B3 + C3) % M3
  }

  /** RoPE-style rotated query/key vector of token `t` at position `p`,
    * written into `out`: pair h = (2h, 2h+1) rotates by the exact
    * rational angle with (cos, sin) ∝ (u²−1, 2u), u = p + h + 2, then
    * reduces into [0, M3). */
  private def rotInto(t: Long, p: Int, out: Array[Long]): Unit = {
    var h = 0
    while (h * 2 < dim) {
      val x0 = emb(t, 2 * h)
      val x1 = emb(t, 2 * h + 1)
      val u = (p + h + 2).toLong
      val c = u * u - 1L
      val s = 2L * u
      out(2 * h) = (((x0 * c - x1 * s) % M3) + M3) % M3
      out(2 * h + 1) = (((x0 * s + x1 * c) % M3) + M3) % M3
      h += 1
    }
  }

  /** The hidden state at query index `qi` of the padded tensor: one
    * attention layer over ALL tensor positions with the additive
    * causal+padding mask applied to each raw score — exposed (not just
    * the pooled row) so specs can pin causality at interior positions. */
  def hiddenAt(ids: Array[Long], mask: Array[Int], pos: Array[Int], qi: Int): Array[Double] = {
    // a padded query position has every key masked (tw stays 0), so the
    // scale below would divide by zero — reject it up front rather than
    // returning NaN/Infinity
    require(mask(qi) == 1, s"query index $qi is a padded position")
    val seqLen = ids.length
    val qq = new Array[Long](dim)
    val kk = new Array[Long](dim)
    rotInto(ids(qi), pos(qi), qq)
    val y = new Array[Long](dim)
    var tw = 0L
    var j = 0
    while (j < seqLen) {
      // the additive causal + padding mask (qwen3.rs:122-147): a masked
      // score s gets MaskVal added and the rational "softmax" max(0, ·)
      // clamps it to EXACTLY zero — algebraically identical to skipping
      // the position outright, so the rotation and dot product of a
      // masked key are dead work we hoist past (an unmasked score is
      // always ≥ 1, so no other branch can reach the clamp)
      val masked = j > qi || (maskPadding && mask(j) == 0)
      if (!masked) {
        rotInto(ids(j), pos(j), kk)
        var s = 0L
        var d = 0
        while (d < dim) { s += qq(d) * kk(d); d += 1 }
        val w = (s % M3) + 1L
        var d2 = 0
        while (d2 < dim) { y(d2) += w * emb(ids(j), d2); d2 += 1 }
        tw += w
      }
      j += 1
    }
    // scale the integer-weighted value average into (−1, 1) — the same
    // op order as the oracle: (y / W / M3) * 2 − 1
    val out = new Array[Double](dim)
    var d = 0
    while (d < dim) {
      out(d) = (y(d).toDouble / tw.toDouble / M3.toDouble) * 2.0 - 1.0
      d += 1
    }
    out
  }

  /** v / (‖v‖ + 1e-12), the [[graft.functions.Kernel.l2normalize]] /
    * HashingBackend expression shape. */
  private def l2normalized(v: Array[Double]): Array[Double] = {
    var ss = 0.0
    var j = 0
    while (j < v.length) { ss += v(j) * v(j); j += 1 }
    val norm = math.sqrt(ss) + K.Eps
    var k = 0
    while (k < v.length) { v(k) = v(k) / norm; k += 1 }
    v
  }
}
