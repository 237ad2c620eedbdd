package graft.backend

import graft.functions.K

/** The learned gated-MLP forward — the reference's Qwen3 MLP block
  * (/root/reference/src/models/qwen3.rs:510-536):
  *
  *   `down_proj( act(gate_proj(x)) * up_proj(x) )`
  *
  * with real `Linear` weights from the [[MlpBank]] single-file
  * checkpoint. The reference's SiLU activation is replaced by the
  * CENTERED rational ReLU `max(0, g − (M3−1)/2)` — the same
  * role (a gate that zeroes roughly half its inputs and scales the
  * rest) in exact integer arithmetic, the established substitution
  * pattern of this engine's skeletons (softmax → rational weights in
  * [[TransformerBackend]]). Gate and up projections reduce into
  * [0, M3) before the elementwise product so the down_proj matmul
  * stays far inside int64.
  *
  * The MLP is per-token (no cross-token term), pooled with the
  * masked-mean tail (the NomicBert convention — its decoder layers
  * carry this same gated-MLP shape on the non-expert path,
  * nomic_v2_moe.rs:369-390). Per-token outputs are exact longs, so the
  * cross-token mean is an order-free integer sum, bit-identical to the
  * DuckDB oracle (`OracleSql.q87_gated_mlp`). */
final case class GatedMlpBackend(
    bank: IndexedSeq[Long],
    hidden: Int = MlpBank.Hidden,
    inter: Int = MlpBank.Inter) extends EmbeddingBackend {
  require(bank.length == 2 * inter * hidden + hidden * inter,
    s"mlp bank of ${bank.length} != [gate+up+down] for $hidden x $inter")

  def dim: Int = hidden

  import K.{M3, A3, B3, C3}
  import GatedMlpBackend.Center

  private val offUp = inter * hidden
  private val offDown = 2 * inter * hidden

  @inline private def emb(t: Long, e: Int): Long =
    ((t % M3) * A3 + e.toLong * B3 + C3) % M3

  /** Projected cell i of the [inter × hidden] block at `off`, reduced
    * into [0, M3). */
  @inline private def proj(t: Long, off: Int, i: Int): Long = {
    var s = 0L
    var e = 0
    val base = off + i * hidden
    while (e < hidden) { s += bank(base + e) * emb(t, e); e += 1 }
    (s % M3 + M3) % M3
  }

  /** The gated activation lanes of token t: act(gate(x)) · up(x),
    * exact longs — computed once per token and reused across output
    * dims. */
  private def actLanes(t: Long): Array[Long] = {
    val a = new Array[Long](inter)
    var i = 0
    while (i < inter) {
      val act = math.max(0L, proj(t, 0, i) - Center) // centered rational ReLU
      if (act != 0L) a(i) = act * proj(t, offUp, i)
      i += 1
    }
    a
  }

  /** The per-token MLP output at dim d — an exact long. */
  def mlpOut(t: Long, d: Int): Long = {
    val a = actLanes(t)
    var s = 0L
    var i = 0
    val base = offDown + d * inter
    while (i < inter) { s += bank(base + i) * a(i); i += 1 }
    s
  }

  def embedBatch(batch: Seq[Array[Long]]): Seq[Array[Double]] = batch.map { tids =>
    val n = tids.length
    val out = new Array[Double](dim)
    if (n == 0) out
    else {
      val sums = new Array[Long](dim)
      var i = 0
      while (i < n) {
        val a = actLanes(tids(i))
        var d = 0
        while (d < dim) {
          var s = 0L
          var ii = 0
          val base = offDown + d * inter
          while (ii < inter) { s += bank(base + ii) * a(ii); ii += 1 }
          sums(d) += s
          d += 1
        }
        i += 1
      }
      var d = 0
      while (d < dim) { out(d) = sums(d).toDouble / n.toDouble; d += 1 }
      // l2 normalize (the Kernel/HashingBackend expression shape)
      var ss = 0.0
      var j = 0
      while (j < dim) { ss += out(j) * out(j); j += 1 }
      val norm = math.sqrt(ss) + K.Eps
      var k = 0
      while (k < dim) { out(k) = out(k) / norm; k += 1 }
      out
    }
  }
}

object GatedMlpBackend {
  /** Activation center: (M3−1)/2 — the midpoint of the reduced gate
    * range, so the gate zeroes roughly half its inputs. */
  val Center: Long = (K.M3 - 1) / 2

  /** The gated instance: weights from the [[MlpBank]] single-file
    * checkpoint. */
  def fromBank(): GatedMlpBackend = GatedMlpBackend(MlpBank.loadedQuantized)
}
