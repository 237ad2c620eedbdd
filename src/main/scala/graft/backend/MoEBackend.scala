package graft.backend

import graft.functions.K

/** The I5/A10 skeleton: a deterministic mixture-of-experts backend
  * exercising the reference's NomicBert-MoE ROUTING contract
  * (/root/reference/src/models/nomic_v2_moe.rs):
  *
  *  - **Router + top-k selection** (nomic_v2_moe.rs:325-367): per token,
  *    the router scores every expert, experts sort by weight descending
  *    and the top `topK` are selected. The reference's stable sort keeps
  *    the LOWER expert index on ties — mirrored here via an
  *    integer-packed priority key.
  *  - **Un-renormalized gate weights** (nomic_v2_moe.rs:341-358): the
  *    selected experts keep their FULL-distribution weights (the softmax
  *    over ALL experts — no renormalization over the top-k), so the
  *    combined output is deliberately a strict convex under-combination.
  *    The softmax's role is played by the exact rational normalization
  *    wᵉ = (sᵉ+1)/Σₑ(sᵉ+1) — order-preserving and bit-reproducible.
  *  - **Expert dispatch + weighted accumulation** (nomic_v2_moe.rs:
  *    405-470): each token's output is Σ_{e ∈ top-k} wᵉ · expertₑ(token),
  *    plus the SHARED output bias added once (megablocks convention,
  *    nomic_v2_moe.rs:391,472-476).
  *  - **Masked mean pooling over tokens** then l2 normalize — the
  *    NomicBert text-embedding tail.
  *
  * Expert outputs and router scores are integer cells of the M3 hash
  * stream (disjoint index ranges: values d<64, router 64.., experts
  * 128.., bias 1024..); each token's mixed output is quantized to
  * floor(v·1e6 + 0.5) before the cross-token sum, so pooling is an exact
  * long sum — commutative, partitioning-invariant, and bit-identical to
  * the relational DuckDB oracle (`OracleSql.q70_moe_embed`). Routing is
  * per-token, so what the gate proves is the ROUTING arithmetic: top-k
  * selection order, tie rule, gate weighting, and shared bias. */
final case class MoEBackend(
    dim: Int = 8,
    nExperts: Int = 8,
    topK: Int = 2,
    // Some(flat expert-major [nExperts·dim·hiddenDim] integer bank) →
    // LEARNED experts: expertₑ(token)[d] = Σ_h Wₑ[d][h]·hid(t,h) over
    // the token's hidden cells, the real per-expert matmul of
    // nomic_v2_moe.rs:405-470 (bank from [[ExpertBank.loadedQuantized]]);
    // None → the hash-cell contract experts
    expertBank: Option[IndexedSeq[Long]] = None,
    hiddenDim: Int = 8,
    // Some(flat [nExperts·hiddenDim] integer bank) → LEARNED router:
    // expert e's logit is its real row dotted with the token's hidden
    // cells (the megablocks `mlp.router.layer.weight` Linear,
    // nomic_v2_moe.rs:315,330-336; bank from
    // [[RouterBank.loadedQuantized]]), reduced into [0, M3) so the
    // gate/top-k arithmetic keeps its bounds. None → hash-cell logits.
    routerBank: Option[IndexedSeq[Long]] = None,
    // Some(full megablocks layer) → the COMPLETE learned NomicMoELayer
    // (nomic_v2_moe.rs:370-476): learned router, TWO-matrix experts
    // (up = act(x·w1ᵀ), down = up·w2 un-transposed) with the centered
    // rational ReLU as the gelu_erf analogue, and the learned shared
    // output bias. Overrides expertBank/routerBank.
    expertMlp: Option[ExpertMlpBank.Weights] = None,
    inter: Int = ExpertMlpBank.Inter) extends EmbeddingBackend {
  require(topK >= 1 && topK <= nExperts, s"topK $topK out of range for $nExperts experts")
  expertBank.foreach(w => require(w.length == nExperts * dim * hiddenDim,
    s"expert bank of ${w.length} != $nExperts x $dim x $hiddenDim"))
  routerBank.foreach(w => require(w.length == nExperts * hiddenDim,
    s"router bank of ${w.length} != $nExperts x $hiddenDim"))
  expertMlp.foreach { em =>
    require(expertBank.isEmpty && routerBank.isEmpty,
      "expertMlp carries its own router and experts")
    require(em.router.length == nExperts * hiddenDim &&
      em.w1.length == nExperts * inter * hiddenDim &&
      em.w2.length == nExperts * inter * hiddenDim && em.bias.length == dim,
      "megablocks layer shapes")
  }

  import K.{M3, A3, B3, C3}
  import MoEBackend._

  /** Hash cell i of token t — the same stream as
    * [[TransformerBackend]]'s token embedding (disjoint cell indices). */
  @inline private def cell(t: Long, i: Int): Long =
    ((t % M3) * A3 + i.toLong * B3 + C3) % M3

  /** Router scores of token t, computed ONCE per token — denominator
    * and top-k selection both derive from this array. Learned rows dot
    * the same hidden cells the experts consume. */
  private def routerScores(t: Long): Array[Long] = {
    val rb = expertMlp.map(_.router).orElse(routerBank)
    val s = new Array[Long](nExperts)
    var e = 0
    while (e < nExperts) {
      s(e) = rb match {
        case None => cell(t, OffRouter + e)
        case Some(w) =>
          var acc = 0L
          var h = 0
          val base = e * hiddenDim
          while (h < hiddenDim) { acc += w(base + h) * cell(t, h); h += 1 }
          (acc % M3 + M3) % M3
      }
      e += 1
    }
    s
  }

  /** Expert e's FULL output vector for token t — the two-matrix
    * megablocks forward when [[expertMlp]] is set: up lane i is the
    * centered-ReLU of w1 row (e·inter+i) dotted with the hidden cells
    * (`selected @ w1ᵀ` + activation), output d is the up lanes dotted
    * with w2 column d (un-transposed w2). */
  private def expertVec(t: Long, e: Int): Array[Long] = expertMlp match {
    case None => Array.tabulate(dim)(d => expertOut(t, e, d))
    case Some(em) =>
      val up = new Array[Long](inter)
      var i = 0
      while (i < inter) {
        var acc = 0L
        var h = 0
        val base = (e * inter + i) * hiddenDim
        while (h < hiddenDim) { acc += em.w1(base + h) * cell(t, h); h += 1 }
        up(i) = math.max(0L, (acc % M3 + M3) % M3 - GatedMlpBackend.Center)
        i += 1
      }
      Array.tabulate(dim) { d =>
        var acc = 0L
        var i2 = 0
        while (i2 < inter) { acc += up(i2) * em.w2((e * inter + i2) * hiddenDim + d); i2 += 1 }
        acc
      }
  }

  /** Shared output bias at dim d — learned when the megablocks layer
    * is present. */
  @inline private def biasAt(d: Int): Long = expertMlp match {
    case None => cell(1L, OffBias + d)
    case Some(em) => em.bias(d)
  }

  /** Top-k expert INDICES from the score array, by the reference's
    * rule: score descending, ties → lower index (the stable sort of
    * nomic_v2_moe.rs:352-355). The packed key s·E + (E−1−e) makes both
    * orderings one integer max per rank. Writes into `selE`. */
  private def selectTopK(scores: Array[Long], selE: Array[Int]): Unit = {
    val taken = new Array[Boolean](nExperts)
    var r = 0
    while (r < topK) {
      var bestKey = -1L
      var e = 0
      while (e < nExperts) {
        if (!taken(e)) {
          val key = scores(e) * nExperts + (nExperts - 1 - e)
          if (key > bestKey) bestKey = key
        }
        e += 1
      }
      val eSel = (nExperts - 1 - (bestKey % nExperts)).toInt
      taken(eSel) = true
      selE(r) = eSel
      r += 1
    }
  }

  /** Expert e's output at dim d for token t: hash cell (contract
    * experts) or the learned [dim × hidden] row dotted with the token's
    * hidden cells (weighted experts). */
  @inline private def expertOut(t: Long, e: Int, d: Int): Long = expertBank match {
    case None => cell(t, OffExperts + e * dim + d)
    case Some(w) =>
      var s = 0L
      var h = 0
      val base = (e * dim + d) * hiddenDim
      while (h < hiddenDim) { s += w(base + h) * cell(t, h); h += 1 }
      s
  }

  /** Spec surface: the token's top-k as (expertIndex, rawScore). */
  private[graft] def routeTopK(t: Long): Array[(Int, Long)] = {
    val scores = routerScores(t)
    val selE = new Array[Int](topK)
    selectTopK(scores, selE)
    selE.map(e => (e, scores(e)))
  }

  def embedBatch(batch: Seq[Array[Long]]): Seq[Array[Double]] = batch.map { tids =>
    val n = tids.length
    val out = new Array[Double](dim)
    if (n == 0) out
    else {
      val sums = new Array[Long](dim)
      val selE = new Array[Int](topK)
      var i = 0
      while (i < n) {
        val t = tids(i)
        // score every expert ONCE; denominator and routing share it
        val scores = routerScores(t)
        var denom = 0L
        var e = 0
        while (e < nExperts) { denom += scores(e) + 1L; e += 1 }
        selectTopK(scores, selE)
        // each selected expert's output vector, computed once per token
        val ev = new Array[Array[Long]](topK)
        var r0 = 0
        while (r0 < topK) { ev(r0) = expertVec(t, selE(r0)); r0 += 1 }
        var d = 0
        while (d < dim) {
          var num = 0L
          var r = 0
          while (r < topK) {
            num += (scores(selE(r)) + 1L) * ev(r)(d)
            r += 1
          }
          val bias = biasAt(d)
          // exact rational mix + shared bias, quantized for the exact
          // cross-token sum: floor(((num + bias·D) / D) · 1e6 + 0.5)
          sums(d) += math.floor(
            ((num + bias * denom).toDouble / denom.toDouble) * QuantScale + 0.5).toLong
          d += 1
        }
        i += 1
      }
      // mean over tokens, scaled into (−1, 1): values lie in [0, 2·M3]
      var d = 0
      while (d < dim) {
        out(d) = (sums(d).toDouble / n.toDouble / QuantScale /
          (2.0 * M3.toDouble)) * 2.0 - 1.0
        d += 1
      }
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

object MoEBackend {
  /** Disjoint cell-index ranges of the shared M3 hash stream. */
  val OffRouter = 64
  val OffExperts = 128
  val OffBias = 1024
  val QuantScale = 1000000.0

  /** Reference routing recompute for specs: full sort of (score desc,
    * index asc) — must agree with the packed-key argmax chain. */
  private[graft] def routeAllSorted(t: Long, nExperts: Int): Seq[(Int, Long)] = {
    val M3 = K.M3
    (0 until nExperts)
      .map(e => (e, ((t % M3) * K.A3 + (OffRouter + e).toLong * K.B3 + K.C3) % M3))
      .sortBy { case (e, s) => (-s, e) }
  }
}
