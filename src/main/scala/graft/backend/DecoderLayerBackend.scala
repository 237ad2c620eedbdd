package graft.backend

import graft.functions.K

/** The COMPLETE learned decoder layer — the reference's
  * `Qwen3DecoderLayer::forward` composition (/root/reference/src/models/
  * qwen3.rs:871-893) with every weight read from the [[LayerBank]]
  * three-shard checkpoint:
  *
  * {{{
  *   residual = x
  *   h  = input_layernorm(x)            // learned RMSNorm gains
  *   h  = self_attn(h, rope, mask)      // the q86 GQA block
  *   x  = residual + h                  // residual add 1
  *   residual = x
  *   h2 = post_attention_layernorm(x)   // learned RMSNorm gains
  *   h2 = mlp(h2)                       // the q87 gated-MLP block
  *   x  = residual + h2                 // residual add 2
  *   ...
  *   out = model.norm(x)                // final norm (qwen3.rs:926-930)
  * }}}
  *
  * then last-token pooling and l2 normalize — the reference's
  * single-layer model shape end-to-end. RMSNorm follows qwen3.rs:38-47
  * (`x · weight / sqrt(mean(x²) + eps)`, eps 1e-6).
  *
  * The residual stream is fixed-point int64 at scale [[DecoderLayerBackend.QS]]:
  * each stage's double arithmetic (the norm scale, the per-head mix,
  * the o_proj/down_proj rescale) is a per-element rational expression
  * with one fixed parenthesization mirrored verbatim in the DuckDB
  * oracle (`OracleSql.q88_decoder_layer`), quantized back to longs
  * before anything crosses elements — so the whole layer is exact,
  * batch-composition invariant, and bit-identical to the pad-free
  * oracle. Attention internals (projection reduce into Z_M3, head-local
  * rational rotation, repeat_kv, quantized per-head mix) are exactly
  * the q86 [[GqaAttentionBackend]] semantics over the NORMALIZED
  * states; the MLP is the q87 [[GatedMlpBackend]] semantics. Layers
  * stack by feeding [[layerOut]] states back in (spec-pinned). */
final case class DecoderLayerBackend(
    w: LayerBank.Weights,
    padId: Long = 0L) extends EmbeddingBackend {
  import K.{M3, A3, B3, C3}
  import DecoderLayerBackend.{QS, QSd, RmsEps}
  import AttnBank.{Hidden => H, NHeads, HeadDim => D, QOut, KvOut}
  import MlpBank.Inter

  require(w.attn.length == AttnBank.Total && w.mlp.length == MlpBank.Total)
  require(w.g1.length == H && w.g2.length == H && w.gFinal.length == H)

  def dim: Int = H

  private val kvGroups = NHeads / AttnBank.NKvHeads
  private val offK = QOut * H
  private val offV = offK + KvOut * H
  private val offO = offV + KvOut * H
  private val offUp = Inter * H
  private val offDown = 2 * Inter * H

  /** The embedding state: hash cell scaled into [0, QS) by exact
    * integer division — the layer-0 residual stream. */
  def s0(t: Long): Array[Long] =
    Array.tabulate(H)(e => (((t % M3) * A3 + e.toLong * B3 + C3) % M3) * QS / M3)

  /** Learned RMSNorm, quantized back to the fixed-point stream:
    * out = round(((s/QS) / sqrt(mean((s/QS)²) + eps)) · gain · QS). */
  private def rmsNormQ(s: Array[Long], g: IndexedSeq[Long]): Array[Long] = {
    var sq = 0L
    var e = 0
    while (e < H) { sq += s(e) * s(e); e += 1 }
    val rms = math.sqrt((sq.toDouble / QSd / QSd) / H.toDouble + RmsEps)
    Array.tabulate(H)(i =>
      math.floor(((s(i).toDouble / QSd) / rms) * (g(i).toDouble / 2048.0) * QSd + 0.5).toLong)
  }

  /** The final model norm — doubles, feeds l2 directly. */
  def finalNormD(s: Array[Long]): Array[Double] = {
    var sq = 0L
    var e = 0
    while (e < H) { sq += s(e) * s(e); e += 1 }
    val rms = math.sqrt((sq.toDouble / QSd / QSd) / H.toDouble + RmsEps)
    Array.tabulate(H)(i =>
      ((s(i).toDouble / QSd) / rms) * (w.gFinal(i).toDouble / 2048.0))
  }

  /** Projected cell d of the attention weight block at `off`, from a
    * normalized state vector, reduced into [0, M3) — the q86 proj over
    * x1 instead of raw hash cells. */
  @inline private def projA(x: Array[Long], off: Int, d: Int): Long = {
    var s = 0L
    var e = 0
    val base = off + d * H
    while (e < H) { s += w.attn(base + e) * x(e); e += 1 }
    (s % M3 + M3) % M3
  }

  /** q86's head-local rational rotation over projected cells. */
  private def rotProjInto(x: Array[Long], p: Int, off: Int, width: Int, out: Array[Long]): Unit = {
    var i = 0
    while (i < width) { // step by pairs: each projects its two cells once
      val hh = (i % D) / 2
      val x0 = projA(x, off, i)
      val x1 = projA(x, off, i + 1)
      val u = (p + hh + 2).toLong
      val c = u * u - 1L
      val s = 2L * u
      out(i) = (((x0 * c - x1 * s) % M3) + M3) % M3
      out(i + 1) = (((x0 * s + x1 * c) % M3) + M3) % M3
      i += 2
    }
  }

  /** One decoder layer at query index `qi`: input states (fixed-point
    * residual stream, one per tensor position) → the post-layer state
    * at `qi` (fixed-point longs). Exposed so specs can stack layers. */
  def layerOut(states: IndexedSeq[Array[Long]], mask: Array[Int], pos: Array[Int], qi: Int): Array[Long] = {
    require(mask(qi) == 1, s"query index $qi is a padded position")
    val seqLen = states.length
    // pre-norm states, computed lazily per position (only unmasked
    // causal keys and the query need theirs)
    val x1 = new Array[Array[Long]](seqLen)
    @inline def x1At(j: Int): Array[Long] = {
      if (x1(j) == null) x1(j) = rmsNormQ(states(j), w.g1)
      x1(j)
    }
    // ---- self-attention (q86 semantics over x1) ----
    val qq = new Array[Long](QOut)
    val kk = new Array[Long](KvOut)
    rotProjInto(x1At(qi), pos(qi), 0, QOut, qq)
    val y = new Array[Long](QOut)
    val tw = new Array[Long](NHeads)
    var j = 0
    while (j < seqLen) {
      val masked = j > qi || mask(j) == 0
      if (!masked) {
        val xj = x1At(j)
        rotProjInto(xj, pos(j), offK, KvOut, kk)
        var n = 0
        while (n < NHeads) {
          val kvHead = n / kvGroups
          var s = 0L
          var d = 0
          while (d < D) { s += qq(n * D + d) * kk(kvHead * D + d); d += 1 }
          val wgt = (s % M3) + 1L
          var d2 = 0
          while (d2 < D) {
            y(n * D + d2) += wgt * projA(xj, offV, kvHead * D + d2)
            d2 += 1
          }
          tw(n) += wgt
          n += 1
        }
      }
      j += 1
    }
    val z = new Array[Long](QOut)
    var i = 0
    while (i < QOut) {
      val m = (y(i).toDouble / tw(i / D).toDouble / M3.toDouble) * 2.0 - 1.0
      z(i) = math.floor(m * QSd + 0.5).toLong
      i += 1
    }
    // o_proj back to the residual-stream scale: weights are k/1024
    // fixed-point numerators, so the matmul result divides by 1024
    val r1 = new Array[Long](H)
    var dd = 0
    while (dd < H) {
      var s = 0L
      var e = 0
      val base = offO + dd * QOut
      while (e < QOut) { s += w.attn(base + e) * z(e); e += 1 }
      r1(dd) = states(qi)(dd) + math.floor(s.toDouble / 1024.0 + 0.5).toLong
      dd += 1
    }
    // ---- gated MLP (q87 semantics over the post-attention norm) ----
    val x2 = rmsNormQ(r1, w.g2)
    @inline def projM(off: Int, i: Int): Long = {
      var s = 0L
      var e = 0
      val base = off + i * H
      while (e < H) { s += w.mlp(base + e) * x2(e); e += 1 }
      (s % M3 + M3) % M3
    }
    // gated activation lanes, computed once and reused across dims
    val al = new Array[Long](Inter)
    var ii = 0
    while (ii < Inter) {
      val act = math.max(0L, projM(0, ii) - GatedMlpBackend.Center)
      if (act != 0L) al(ii) = act * projM(offUp, ii)
      ii += 1
    }
    val r2 = new Array[Long](H)
    var d = 0
    while (d < H) {
      var s = 0L
      var i2 = 0
      val base = offDown + d * Inter
      while (i2 < Inter) { s += w.mlp(base + i2) * al(i2); i2 += 1 }
      // down_proj rescale: k/1024 weights over two Z_M3 factors
      r2(d) = r1(d) + math.floor((s.toDouble / 1024.0 / M3.toDouble / M3.toDouble) * QSd + 0.5).toLong
      d += 1
    }
    r2
  }

  def embedBatch(batch: Seq[Array[Long]]): Seq[Array[Double]] = {
    if (batch.isEmpty) return Seq.empty
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
        while (i < seqLen) {
          if (mask(i) == 1) c += 1
          pos(i) = math.max(0, c - 1)
          i += 1
        }
        val states: IndexedSeq[Array[Long]] = (0 until seqLen).map(j => s0(ids(j)))
        // last-token pooling through the final norm (left padding makes
        // seqLen−1 the real last token), then l2 normalize
        l2normalized(finalNormD(layerOut(states, mask, pos, seqLen - 1)))
      }
    }
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

object DecoderLayerBackend {
  /** Fixed-point scale of the residual stream. */
  val QS: Long = 1000000L
  val QSd: Double = 1000000.0
  /** The reference's rms_norm_eps (qwen3.rs:35, config default 1e-6). */
  val RmsEps: Double = 1e-6

  /** The gated instance: the full layer from the [[LayerBank]]
    * three-shard checkpoint. */
  def fromBank(): DecoderLayerBackend = DecoderLayerBackend(LayerBank.loaded)
}
