package graft.backend

import graft.functions.K

/** The learned-projection half of the reference's Qwen3 attention block
  * (/root/reference/src/models/qwen3.rs:715-843), on top of the
  * [[TransformerBackend]] pipeline contracts (left padding,
  * causal+padding mask, mask-derived positions, last-token pooling):
  *
  *  - **Learned q/k/v/o projections** (qwen3.rs:744-763, 797-813): the
  *    hidden vector projects through four real `Linear` weights read
  *    from a sharded safetensors checkpoint ([[AttnBank]]), row-major
  *    `[out, in]` like candle's `Linear`.
  *  - **Grouped-query attention + repeat_kv** (qwen3.rs:727-737,
  *    818-820): `nHeads` query heads share `nKvHeads` key/value heads;
  *    query head n reads kv head n / (nHeads/nKvHeads). With the gated
  *    shape (2 heads, 1 kv head) both query heads attend over the SAME
  *    projected k/v — they differ only through their q_proj rows.
  *  - **Per-head rotation then per-head scores** (qwen3.rs:815-830):
  *    RoPE applies to q and k only (v is NOT rotated), with the same
  *    angle stream at the same head-local pair across heads — the exact
  *    rational rotation of [[TransformerBackend]], pair index taken
  *    within the head.
  *  - **Per-head value mix, concat, then o_proj** (qwen3.rs:835-842):
  *    each head's weighted value average is scaled and quantized to a
  *    fixed-point long, the heads concatenate to `[nHeads·headDim]`,
  *    and the learned `o_proj` maps that back to the hidden width.
  *
  * All cross-element arithmetic is exact int64 (projections and scores
  * in Z_M3, the o_proj matmul over quantized fixed-point longs), so
  * results are independent of batch composition and bit-identical to
  * the pad-free DuckDB oracle (`OracleSql.q86_gqa_attention`). */
final case class GqaAttentionBackend(
    bank: IndexedSeq[Long],
    nHeads: Int = AttnBank.NHeads,
    headDim: Int = AttnBank.HeadDim,
    nKvHeads: Int = AttnBank.NKvHeads,
    hidden: Int = AttnBank.Hidden,
    padId: Long = 0L,
    // Some((q_norm gains, k_norm gains)) → the reference's per-head
    // RMSNorm on the reshaped q/k projections BEFORE rotation
    // (qwen3.rs:765-767, 797-807): one [headDim] gain vector each,
    // shared across heads, from [[QkNormBank.loaded]]. None → q86's
    // norm-free contract.
    qkNorm: Option[(IndexedSeq[Long], IndexedSeq[Long])] = None,
    // Some(flat q/k/v/o bias bank, [[AttnBiasBank.loadedQuantized]])
    // → the attention_bias = true branch (qwen3.rs:743-763): each
    // projection adds its learned bias cell before the mod-reduce;
    // o_proj adds its bias (scaled to the z fixed-point) before the
    // output division. None → linear_no_bias.
    biases: Option[IndexedSeq[Long]] = None) extends EmbeddingBackend {
  // embedBatch pads the whole micro-batch to its longest sequence
  override def padsBatchLongest: Boolean = true
  require(nHeads % nKvHeads == 0, s"nHeads $nHeads not a multiple of nKvHeads $nKvHeads")
  val qOut: Int = nHeads * headDim
  val kvOut: Int = nKvHeads * headDim
  require(headDim % 2 == 0, s"headDim must be even for pairwise rotation, got $headDim")
  require(bank.length == (qOut + 2 * kvOut + qOut) * hidden,
    s"attention bank of ${bank.length} != [(q=$qOut)+(k=$kvOut)+(v=$kvOut)+(o=$qOut)] x $hidden")

  /** o_proj output width — the backend's embedding dim. */
  def dim: Int = hidden

  import K.{M3, A3, B3, C3}
  import GqaAttentionBackend.QuantScale

  private val offK = qOut * hidden
  private val offV = offK + kvOut * hidden
  private val offO = offV + kvOut * hidden
  private val kvGroups = nHeads / nKvHeads

  def embedBatch(batch: Seq[Array[Long]]): Seq[Array[Double]] = {
    if (batch.isEmpty) return Seq.empty
    // batch-longest LEFT padding (qwen3.rs:1073-1077), as in
    // [[TransformerBackend.embedBatch]]
    val seqLen = math.max(1, batch.iterator.map(_.length).max)
    batch.map { tids =>
      if (tids.isEmpty) new Array[Double](dim)
      else {
        val padLen = seqLen - tids.length
        val ids = new Array[Long](seqLen)
        val mask = new Array[Int](seqLen)
        var i = 0
        while (i < padLen) { ids(i) = padId; i += 1 }
        while (i < seqLen) { ids(i) = tids(i - padLen); mask(i) = 1; i += 1 }
        val pos = new Array[Int](seqLen)
        var c = 0
        i = 0
        while (i < seqLen) { // cumsum(mask) − 1: the left-pad position rule
          if (mask(i) == 1) c += 1
          pos(i) = math.max(0, c - 1)
          i += 1
        }
        l2normalized(attnAt(ids, mask, pos, seqLen - 1))
      }
    }
  }

  /** Hidden-cell e of token t — the same M3 stream as
    * [[TransformerBackend]]'s hash embedding. */
  @inline private def emb(t: Long, e: Int): Long =
    ((t % M3) * A3 + e.toLong * B3 + C3) % M3

  // bias base per projection block (q/k/v bias layout of AttnBiasBank)
  @inline private def biasBase(off: Int): Int =
    if (off == 0) 0 else if (off == offK) qOut else qOut + kvOut

  /** Projected cell d (of `out` rows starting at bank offset `off`) for
    * token t: the learned row dotted with the hidden cells (+ the
    * learned bias on the attention_bias branch), reduced into
    * [0, M3). */
  @inline private def proj(t: Long, off: Int, d: Int): Long = {
    var s = 0L
    var e = 0
    val base = off + d * hidden
    while (e < hidden) { s += bank(base + e) * emb(t, e); e += 1 }
    biases.foreach(b => s += b(biasBase(off) + d))
    (s % M3 + M3) % M3
  }

  /** Rotated projected vector of token t at position p, written into
    * `out` (length `width`, a whole projection): pair hh WITHIN each
    * head rotates by the exact rational angle with (cos, sin) ∝
    * (u²−1, 2u), u = p + hh + 2 — the same angle at the same head-local
    * pair across heads, as the reference broadcasts one (cos, sin) to
    * every head (qwen3.rs:815-816). */
  private def rotProjInto(t: Long, p: Int, off: Int, width: Int, out: Array[Long]): Unit = {
    // q_norm/k_norm: project the whole block, RMS-normalize each head
    // slice with the learned gains (quantized back to fixed-point
    // longs), and rotate the NORMALIZED values — the reference's
    // reshape → norm → rope order (qwen3.rs:797-816)
    val src: Int => Long = qkNorm match {
      case Some((gq, gk)) =>
        val gains = if (off == 0) gq else gk
        val pp = Array.tabulate(width)(d => proj(t, off, d))
        val qn = new Array[Long](width)
        var hn = 0
        while (hn * headDim < width) {
          var sq = 0L
          var d = 0
          while (d < headDim) { val v = pp(hn * headDim + d); sq += v * v; d += 1 }
          val rms = math.sqrt(sq.toDouble / headDim.toDouble + GqaAttentionBackend.RmsEps)
          d = 0
          while (d < headDim) {
            val i = hn * headDim + d
            qn(i) = math.floor(
              ((pp(i).toDouble / rms) * (gains(d).toDouble / 2048.0)) * QuantScale + 0.5).toLong
            d += 1
          }
          hn += 1
        }
        qn
      case None => proj(t, off, _)
    }
    var i = 0
    while (i < width) { // step by pairs: each reads its two cells once
      val hh = (i % headDim) / 2 // head-local pair index
      val x0 = src(i)
      val x1 = src(i + 1)
      val u = (p + hh + 2).toLong
      val c = u * u - 1L
      val s = 2L * u
      out(i) = (((x0 * c - x1 * s) % M3) + M3) % M3
      out(i + 1) = (((x0 * s + x1 * c) % M3) + M3) % M3
      i += 2
    }
  }

  /** The o_proj output at query index `qi` of the padded tensor —
    * exposed so specs can pin causality at interior positions. */
  def attnAt(ids: Array[Long], mask: Array[Int], pos: Array[Int], qi: Int): Array[Double] = {
    require(mask(qi) == 1, s"query index $qi is a padded position")
    val seqLen = ids.length
    val qq = new Array[Long](qOut)
    val kk = new Array[Long](kvOut)
    rotProjInto(ids(qi), pos(qi), 0, qOut, qq)
    val y = new Array[Long](qOut) // per-head weighted value sums, concat layout
    val tw = new Array[Long](nHeads)
    var j = 0
    while (j < seqLen) {
      // additive causal + padding mask → exact-zero weight → skip
      val masked = j > qi || mask(j) == 0
      if (!masked) {
        rotProjInto(ids(j), pos(j), offK, kvOut, kk)
        var n = 0
        while (n < nHeads) {
          val kvHead = n / kvGroups // repeat_kv: query head n reads this kv head
          var s = 0L
          var d = 0
          while (d < headDim) {
            s += qq(n * headDim + d) * kk(kvHead * headDim + d)
            d += 1
          }
          val w = (s % M3) + 1L
          var d2 = 0
          while (d2 < headDim) {
            // v is the UN-rotated projection (RoPE applies to q/k only)
            y(n * headDim + d2) += w * proj(ids(j), offV, kvHead * headDim + d2)
            d2 += 1
          }
          tw(n) += w
          n += 1
        }
      }
      j += 1
    }
    // per-head scale into (−1, 1), quantize to fixed-point longs, then
    // the learned o_proj matmul — exact int64 throughout
    val z = new Array[Long](qOut)
    var i = 0
    while (i < qOut) {
      val m = (y(i).toDouble / tw(i / headDim).toDouble / M3.toDouble) * 2.0 - 1.0
      z(i) = math.floor(m * QuantScale + 0.5).toLong
      i += 1
    }
    val out = new Array[Double](dim)
    var dd = 0
    while (dd < dim) {
      var s = 0L
      var e = 0
      val base = offO + dd * qOut
      while (e < qOut) { s += bank(base + e) * z(e); e += 1 }
      // o_proj bias, scaled to the z fixed-point so it adds in the
      // same units as the matmul terms
      biases.foreach(b => s += b(qOut + 2 * kvOut + dd) * 1000000L)
      out(dd) = s.toDouble / QuantScale
      dd += 1
    }
    out
  }

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

object GqaAttentionBackend {
  /** Fixed-point scale of the per-head mix before o_proj (and of the
    * quantized q/k norms). */
  val QuantScale = 1000000.0
  /** The reference's rms_norm_eps (qwen3.rs:35, config default 1e-6). */
  val RmsEps = 1e-6

  /** The gated instance: projections from the [[AttnBank]] two-shard
    * checkpoint. */
  def fromBank(): GqaAttentionBackend = GqaAttentionBackend(AttnBank.loadedQuantized)

  /** The q89 instance: q86 plus the learned per-head q_norm/k_norm
    * gains from the [[QkNormBank]] checkpoint. */
  def withQkNorm(): GqaAttentionBackend =
    GqaAttentionBackend(AttnBank.loadedQuantized, qkNorm = Some(QkNormBank.loaded))

  /** The q94 instance: the attention_bias = true branch — q86 plus
    * the learned q/k/v/o biases from the [[AttnBiasBank]] checkpoint. */
  def withBiases(): GqaAttentionBackend =
    GqaAttentionBackend(AttnBank.loadedQuantized, biases = Some(AttnBiasBank.loadedQuantized))
}
