package graft.backend

import graft.functions.K

/** The end-to-end `embed_image` composition contract
  * (/root/reference/src/models/qwen3.rs:1397-1452): after the vision
  * tower's merged (+deepstack) features are spliced over the image-pad
  * span and the 3-D MRoPE position ids are computed, ONE transformer
  * forward runs over the fused sequence and the last hidden state is
  * pooled and normalized.
  *
  * This is [[TransformerBackend]]'s integer attention with two
  * composition-specific contracts layered in:
  *
  *  - **Fused inputs, not token ids**: every position carries a
  *    quantized fused VALUE (text cell or vision feature) mapped into
  *    [0, M3) — the splice happened upstream, so text and image
  *    positions flow through the SAME embedding/attention path, exactly
  *    like the reference's `input_embeds` after `slice_assign`
  *    (qwen3.rs:1415-1418).
  *  - **MRoPE sectioned rotation** (qwen3.rs:539-710 applies separate
  *    rotary sections for the t/h/w id planes): head-dim pair h takes
  *    its rotation position from plane h mod 3 — (t, h, w) round-robin
  *    — so all three id planes genuinely steer the forward; the
  *    per-pair angle is the same exact rational Pythagorean rotation
  *    as [[TransformerBackend.rotInto]], u = pid + pair + 2.
  *
  * No padding exists here (one fused sequence per doc, computed
  * whole), so causal masking at the last query index admits every
  * position and the pooled row is index n−1 — the same
  * last-token-pooling interplay q68 proves under batching. All
  * attention arithmetic stays in Z_M3 (exact longs); doubles appear
  * only in the final scale + l2 normalize, mirroring the DuckDB oracle
  * term for term. */
object VlForward {
  import K.{M3, A3, B3, C3}

  /** Embedding cell: dim `d` of fused id `t` — identical expression to
    * TransformerBackend.emb (t already lives in [0, M3)). */
  @inline private def emb(t: Long, d: Int): Long =
    ((t % M3) * A3 + d.toLong * B3 + C3) % M3

  /** Rotated query/key vector at sequence index `j`: pair h rotates by
    * the rational angle at u = pid(h mod 3) + h + 2. */
  private def rotInto(t: Long, pt: Long, ph: Long, pw: Long, dim: Int,
                      out: Array[Long]): Unit = {
    var h = 0
    while (h * 2 < dim) {
      val x0 = emb(t, 2 * h)
      val x1 = emb(t, 2 * h + 1)
      val pid = (h % 3) match {
        case 0 => pt
        case 1 => ph
        case _ => pw
      }
      val u = pid + h + 2
      val c = u * u - 1L
      val s = 2L * u
      out(2 * h) = (((x0 * c - x1 * s) % M3) + M3) % M3
      out(2 * h + 1) = (((x0 * s + x1 * c) % M3) + M3) % M3
      h += 1
    }
  }

  /** The LEARNED fused-sequence forward — q91: the same composition as
    * [[embed]] but the attention runs through real q/k/v/o projections
    * from the [[VlAttnBank]] checkpoint (the reference embeds images
    * with the same weighted text model, qwen3.rs:1397-1452), with the
    * MRoPE plane-sectioned rotation applied to the PROJECTED q/k
    * (plane = pair mod 3, u = pid + pair + 2 — the q78 scheme) and the
    * q86 tail: quantized mix, o_proj matmul in exact int64, l2. */
  def embedLearned(fids: Array[Long], pt: Array[Long], ph: Array[Long],
                   pw: Array[Long], bank: IndexedSeq[Long]): Array[Double] = {
    import VlAttnBank.{Hidden => H, HeadDim => HD, OffK, OffV, OffO}
    require(bank.length == VlAttnBank.Total, s"vl attention bank of ${bank.length}")
    val n = fids.length
    require(n > 0 && pt.length == n && ph.length == n && pw.length == n,
      s"position planes must parallel the $n fused values")
    val qi = n - 1
    @inline def proj(t: Long, off: Int, d: Int): Long = {
      var s = 0L
      var e = 0
      val base = off + d * H
      while (e < H) { s += bank(base + e) * emb(t, e); e += 1 }
      (s % M3 + M3) % M3
    }
    // rotated projection: pair gp takes its id from plane gp mod 3
    def rotProjInto(j: Int, off: Int, out: Array[Long]): Unit = {
      var i = 0
      while (i < HD) {
        val gp = i / 2
        val x0 = proj(fids(j), off, i)
        val x1 = proj(fids(j), off, i + 1)
        val pid = (gp % 3) match {
          case 0 => pt(j)
          case 1 => ph(j)
          case _ => pw(j)
        }
        val u = pid + gp + 2
        val c = u * u - 1L
        val s = 2L * u
        out(i) = (((x0 * c - x1 * s) % M3) + M3) % M3
        out(i + 1) = (((x0 * s + x1 * c) % M3) + M3) % M3
        i += 2
      }
    }
    val qq = new Array[Long](HD)
    rotProjInto(qi, 0, qq)
    val kk = new Array[Long](HD)
    val y = new Array[Long](HD)
    var tw = 0L
    var j = 0
    while (j <= qi) { // causal at the last index = every position
      rotProjInto(j, OffK, kk)
      var s = 0L
      var d = 0
      while (d < HD) { s += qq(d) * kk(d); d += 1 }
      val w = (s % M3) + 1L
      var d2 = 0
      while (d2 < HD) { y(d2) += w * proj(fids(j), OffV, d2); d2 += 1 }
      tw += w
      j += 1
    }
    // quantized mix, then the learned o_proj matmul in exact int64
    val z = new Array[Long](HD)
    var i = 0
    while (i < HD) {
      val m = (y(i).toDouble / tw.toDouble / M3.toDouble) * 2.0 - 1.0
      z(i) = math.floor(m * 1000000.0 + 0.5).toLong
      i += 1
    }
    val out = new Array[Double](H)
    var dd = 0
    var ss = 0.0
    while (dd < H) {
      var s = 0L
      var e = 0
      val base = OffO + dd * HD
      while (e < HD) { s += bank(base + e) * z(e); e += 1 }
      out(dd) = s.toDouble / 1000000.0
      ss += out(dd) * out(dd)
      dd += 1
    }
    val norm = math.sqrt(ss) + K.Eps
    var k2 = 0
    while (k2 < H) { out(k2) = out(k2) / norm; k2 += 1 }
    out
  }

  /** Last-token-pooled, l2-normalized embedding of one fused sequence.
    * `fids` are the quantized fused values in [0, M3); `pt`/`ph`/`pw`
    * the MRoPE id planes, all position-parallel. */
  def embed(fids: Array[Long], pt: Array[Long], ph: Array[Long],
            pw: Array[Long], dim: Int = 8): Array[Double] = {
    val n = fids.length
    require(n > 0 && pt.length == n && ph.length == n && pw.length == n,
      s"position planes must parallel the $n fused values")
    val qi = n - 1
    val qq = new Array[Long](dim)
    rotInto(fids(qi), pt(qi), ph(qi), pw(qi), dim, qq)
    val kk = new Array[Long](dim)
    val y = new Array[Long](dim)
    var tw = 0L
    var j = 0
    while (j <= qi) { // causal at the last index = every position
      rotInto(fids(j), pt(j), ph(j), pw(j), dim, kk)
      var s = 0L
      var d = 0
      while (d < dim) { s += qq(d) * kk(d); d += 1 }
      val w = (s % M3) + 1L
      var d2 = 0
      while (d2 < dim) { y(d2) += w * emb(fids(j), d2); d2 += 1 }
      tw += w
      j += 1
    }
    val out = new Array[Double](dim)
    var d = 0
    var ss = 0.0
    while (d < dim) {
      out(d) = (y(d).toDouble / tw.toDouble / M3.toDouble) * 2.0 - 1.0
      ss += out(d) * out(d)
      d += 1
    }
    val norm = math.sqrt(ss) + K.Eps
    var k2 = 0
    while (k2 < dim) { out(k2) = out(k2) / norm; k2 += 1 }
    out
  }
}
