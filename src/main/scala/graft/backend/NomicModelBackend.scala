package graft.backend

import graft.functions.K

/** The COMPLETE learned NomicBert-MoE model — the reference's
  * `NomicV2MoeTextEmbedding::embed` forward
  * (/root/reference/src/models/nomic_v2_moe.rs:764-800) with every
  * parameter loaded from the [[NomicBank]] two-shard checkpoint:
  *
  *   ids → word_embeddings + token_type_embeddings row 0 (zeros are
  *         passed for type ids, :789) → emb_ln LayerNorm (:617-618)
  *   per block (POST-norm, prenorm=false — :506-508,532-546):
  *     attn_out = attn(x)          // combined Wqkv + bias, partial
  *                                 // non-interleaved RoPE, BIDIRECTIONAL
  *     h  = norm1(attn_out + x)    // LayerNorm weight+bias
  *     out = norm2(mlp(h) + h)     // layer 0 fc1/fc2, layer 1 MoE
  *   masked mean pool (:645-651) → l2 normalize (:653-658)
  *
  * Structural contrasts with the Qwen3 stack ([[DecoderLayerBackend]]),
  * each pinned by spec:
  *   - POST-norm (norm after the residual add) vs pre-norm;
  *   - BIDIRECTIONAL attention (`build_bidirectional_mask`, :634-642 —
  *     every real position attends to every real position) vs causal;
  *   - combined `Wqkv` projection (one [3H, H] matrix, :227-231) vs
  *     separate q/k/v, all WITH biases (`qkv_proj_bias` default true);
  *   - NON-interleaved rotary on the first `rotary_dim` dims of each
  *     head, tail passed through (`apply_rotary_emb`, :146-156) vs
  *     the interleaved full-width rotation;
  *   - standard MHA (no GQA repeat_kv);
  *   - no final model norm (the blocks end with norm2, :581);
  *   - masked MEAN pooling vs last-token.
  *
  * Arithmetic is the repo's exact fixed-point contract: states are
  * QS=1e6-scaled longs, projections reduce into [0, M3), attention
  * mixes with rational weights (q·k mod M3)+1, LayerNorm/pool run in
  * deterministic IEEE doubles with floor-round requantization — every
  * step mirrored term-for-term by the q104 DuckDB oracle. Per-doc
  * forward (no cross-doc state), so batch composition and partitioning
  * are trivially irrelevant — the reference's right-pad + mask scheme
  * (:781-787) makes pad rows invisible the same way. */
final case class NomicModelBackend(dim: Int = NomicBank.Hidden) extends EmbeddingBackend {
  import NomicBank._
  import K.M3

  private val QSd = 1.0e6
  private val M3d = M3.toDouble
  private val Center: Long = GatedMlpBackend.Center
  private val H = Hidden
  private val half = RotaryDim / 2

  @transient private lazy val w: Weights = NomicBank.loaded

  /** Word + type-0 embedding rows, quantized to the QS stream:
    * round((kWord + kType)/1024 · QS). Ids must be in-vocab (the
    * WordPiece fixture id space IS the table's row space). */
  def s0(t: Long): Array[Long] = {
    require(t >= 0 && t < VocabSize, s"token id $t outside the learned table")
    Array.tabulate(H)(d => math.floor(
      (w.word(t.toInt * H + d) + w.typeRow(d)).toDouble / 1024.0 * QSd + 0.5).toLong)
  }

  /** Exact-mirrorable LayerNorm: mean/variance in IEEE doubles over the
    * QS-fixed state, eps 1e-5, learned gain (1 + k/2048) and bias
    * (k/1024), floor-round back to QS longs. */
  def layerNormQ(s: Array[Long], gw: IndexedSeq[Long], gb: IndexedSeq[Long]): Array[Long] = {
    var sum = 0L
    var e = 0
    while (e < H) { sum += s(e); e += 1 }
    val mu = sum.toDouble / QSd / H.toDouble
    var vr = 0.0
    e = 0
    while (e < H) { val dv = s(e).toDouble / QSd - mu; vr += dv * dv; e += 1 }
    val sd = math.sqrt(vr / H.toDouble + LnEps)
    Array.tabulate(H)(i => math.floor(
      ((s(i).toDouble / QSd - mu) / sd * (gw(i).toDouble / 2048.0)
        + gb(i).toDouble / 1024.0) * QSd + 0.5).toLong)
  }

  /** Row r of the combined Wqkv projection (+ its bias cell), reduced
    * into [0, M3) — rows [0,H) are q, [H,2H) k, [2H,3H) v (the
    * reshape-(3,h,d) split, nomic_v2_moe.rs:257-261). */
  @inline private def projQkv(l: LayerW, x: Array[Long], r: Int): Long = {
    var s = 0L
    var e = 0
    val base = r * H
    while (e < H) { s += l.wqkv(base + e) * x(e); e += 1 }
    s += l.wqkvB(r)
    (s % M3 + M3) % M3
  }

  /** q or k head vector with NON-interleaved partial rotary: head-local
    * dims [0, RotaryDim) rotate as halves (x1 = first half, x2 = second
    * half — apply_rotary_full's narrow/cat, :158-168), the tail passes
    * through. Rational rotation u = pos + freqIdx + 2, c = u²−1,
    * s = 2u over Z_M3 (the established surrogate). */
  private def rotArr(l: LayerW, x: Array[Long], off: Int, pos: Int): Array[Long] =
    Array.tabulate(NHeads * HeadDim) { i =>
      val hi = i % HeadDim
      if (hi >= RotaryDim) projQkv(l, x, off + i)
      else {
        val fi = hi % half
        val base = off + i - hi
        val a = projQkv(l, x, base + fi)
        val b = projQkv(l, x, base + fi + half)
        val u = (pos + fi + 2).toLong
        val c = u * u - 1L
        val s = 2L * u
        if (hi < half) ((a * c - b * s) % M3 + M3) % M3
        else ((b * c + a * s) % M3 + M3) % M3
      }
    }

  /** Standard MLP (layer 0): centered-ReLU lanes over fc1 (+bias, in
    * the mod domain), fc2 (+bias) back to the residual scale. */
  private def mlpStd(m: MlpStd, h: Array[Long]): Array[Long] = {
    val act = Array.tabulate(Inter) { i =>
      var s = 0L
      var e = 0
      val base = i * H
      while (e < H) { s += m.fc1(base + e) * h(e); e += 1 }
      s += m.fc1b(i)
      math.max(0L, ((s % M3 + M3) % M3) - Center)
    }
    Array.tabulate(H) { d =>
      var s = 0L
      var i = 0
      val base = d * Inter
      while (i < Inter) { s += m.fc2(base + i) * act(i); i += 1 }
      math.floor((s.toDouble / 1024.0 / M3d
        + m.fc2b(d).toDouble / 1024.0) * QSd + 0.5).toLong
    }
  }

  /** Megablocks MoE (layer 1): learned router top-2 via packed keys
    * (score desc, index asc — the q70/q93 rule), un-renormalized
    * rational gates (s+1)/Σ(s+1), two-matrix experts (up = centered
    * ReLU of w1 rows, down through un-transposed w2 columns), learned
    * shared bias. */
  private def mlpMoe(m: MlpMoe, h: Array[Long]): Array[Long] = {
    val scores = Array.tabulate(NExperts) { e =>
      var s = 0L
      var e2 = 0
      val base = e * H
      while (e2 < H) { s += m.router(base + e2) * h(e2); e2 += 1 }
      (s % M3 + M3) % M3
    }
    var k1 = -1L
    var k2 = -1L
    var denom = 0L
    var e = 0
    while (e < NExperts) {
      val key = scores(e) * NExperts + (NExperts - 1 - e)
      if (key > k1) { k2 = k1; k1 = key } else if (key > k2) { k2 = key }
      denom += scores(e) + 1L
      e += 1
    }
    def up(ex: Int): Array[Long] = Array.tabulate(Inter) { i =>
      var s = 0L
      var e2 = 0
      val base = (ex * Inter + i) * H
      while (e2 < H) { s += m.w1(base + e2) * h(e2); e2 += 1 }
      math.max(0L, ((s % M3 + M3) % M3) - Center)
    }
    val e1 = NExperts - 1 - (k1 % NExperts).toInt
    val e2i = NExperts - 1 - (k2 % NExperts).toInt
    val g1 = k1 / NExperts + 1L
    val g2 = k2 / NExperts + 1L
    val u1 = up(e1)
    val u2 = up(e2i)
    Array.tabulate(H) { d =>
      var s1 = 0L
      var s2 = 0L
      var i = 0
      while (i < Inter) {
        s1 += u1(i) * m.w2((e1 * Inter + i) * H + d)
        s2 += u2(i) * m.w2((e2i * Inter + i) * H + d)
        i += 1
      }
      math.floor(((g1 * s1 + g2 * s2).toDouble / denom.toDouble / 1024.0 / M3d
        + m.eb(d).toDouble / 1024.0) * QSd + 0.5).toLong
    }
  }

  /** One post-norm block advanced at every position. Bidirectional:
    * each query mixes over ALL positions (per-doc forward = all-real
    * mask). */
  private def layerAll(l: LayerW, states: IndexedSeq[Array[Long]]): IndexedSeq[Array[Long]] = {
    val n = states.length
    val qOut = NHeads * HeadDim
    val qs = Array.tabulate(n)(j => rotArr(l, states(j), 0, j))
    val ks = Array.tabulate(n)(j => rotArr(l, states(j), H, j))
    val vs = Array.tabulate(n)(j => Array.tabulate(qOut)(i => projQkv(l, states(j), 2 * H + i)))
    (0 until n).map { qi =>
      val q = qs(qi)
      val y = new Array[Long](qOut)
      val tw = new Array[Long](NHeads)
      var j = 0
      while (j < n) { // bidirectional: every position, no causal cut
        val kj = ks(j)
        val vj = vs(j)
        var hn = 0
        while (hn < NHeads) {
          var s = 0L
          var d = 0
          val base = hn * HeadDim
          while (d < HeadDim) { s += q(base + d) * kj(base + d); d += 1 }
          val wgt = (s % M3) + 1L
          var d2 = 0
          while (d2 < HeadDim) { y(base + d2) += wgt * vj(base + d2); d2 += 1 }
          tw(hn) += wgt
          hn += 1
        }
        j += 1
      }
      val z = Array.tabulate(qOut) { i =>
        val m = (y(i).toDouble / tw(i / HeadDim).toDouble / M3d) * 2.0 - 1.0
        math.floor(m * QSd + 0.5).toLong
      }
      val r1 = Array.tabulate(H) { dd =>
        var s = 0L
        var e = 0
        val base = dd * qOut
        while (e < qOut) { s += l.outW(base + e) * z(e); e += 1 }
        s += l.outB(dd) * 1000000L // o_proj bias in the z fixed-point
        states(qi)(dd) + math.floor(s.toDouble / 1024.0 + 0.5).toLong
      }
      val h1 = layerNormQ(r1, l.n1w, l.n1b)
      val mo = l.std.map(mlpStd(_, h1)).getOrElse(mlpMoe(l.moe.get, h1))
      val r2 = Array.tabulate(H)(d => h1(d) + mo(d))
      layerNormQ(r2, l.n2w, l.n2b)
    }
  }

  /** Post-stack states of every position (exposed for specs). */
  def forwardStates(tids: Array[Long]): IndexedSeq[Array[Long]] = {
    val x0 = tids.toIndexedSeq.map(t => layerNormQ(s0(t), w.embLnW, w.embLnB))
    w.layers.foldLeft(x0)((st, l) => layerAll(l, st))
  }

  /** Mean pool over all (real) positions + l2 — the reference's
    * `mean_pool` + `l2_normalize` epilogue. */
  def embedDoc(tids: Array[Long]): Array[Double] = {
    val st = forwardStates(tids)
    val n = st.length
    val pooled = Array.tabulate(H) { d =>
      var s = 0L
      var j = 0
      while (j < n) { s += st(j)(d); j += 1 }
      s.toDouble / n.toDouble / QSd
    }
    var ss = 0.0
    var k = 0
    while (k < H) { ss += pooled(k) * pooled(k); k += 1 }
    val nv = math.sqrt(ss)
    Array.tabulate(H)(d => pooled(d) / (nv + 1e-12))
  }

  def embedBatch(batch: Seq[Array[Long]]): Seq[Array[Double]] =
    batch.map(embedDoc)
}
