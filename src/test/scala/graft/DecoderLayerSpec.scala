package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.backend.{AttnBank, DecoderLayerBackend, LayerBank, MlpBank}

/** The composed learned decoder layer: checkpoint round-trip (the
  * layer's attention/MLP tensors ARE the q86/q87 banks), the residual
  * composition (/root/reference/src/models/qwen3.rs:871-893), pipeline
  * invariance end-to-end, and layer STACKING — feeding layerOut states
  * back in stays deterministic and pad-invariant, the multi-layer loop
  * of qwen3.rs:897-931. */
class DecoderLayerSpec extends AnyFunSuite {

  private val be = DecoderLayerBackend.fromBank()

  test("LayerBank: the layer checkpoint carries exactly the q86/q87 banks plus gains") {
    val (w, gFinal) = LayerBank.loaded
    assert(w.attn == AttnBank.loadedQuantized)
    assert(w.mlp == MlpBank.loadedQuantized)
    assert(w.g1.indices.forall(e => w.g1(e) == 2048L + LayerBank.gainK(e)))
    assert(w.g2.indices.forall(e => w.g2(e) == 2048L + LayerBank.gainK(8 + e)))
    assert(gFinal.indices.forall(e => gFinal(e) == 2048L + LayerBank.gainK(16 + e)))
    // layer 1 is a DISTINCT continuation of the same streams
    val (layers, _) = LayerBank.loadedStack
    assert(layers.length == LayerBank.NLayers)
    assert(layers(1).attn.indices.forall(i =>
      layers(1).attn(i) == AttnBank.weightK(AttnBank.Total + i)))
    assert(layers(1).attn != layers(0).attn)
    assert(layers(1).g1.indices.forall(e =>
      layers(1).g1(e) == 2048L + LayerBank.gainK(LayerBank.gainBase(1) + e)))
  }

  test("batch composition cannot change the composed layer's results") {
    val shortSeq = Array(5L, 17L, 23L)
    val longSeq = Array(101L, 7L, 3L, 45L, 88L, 9L)
    assert(be.embedBatch(Seq(shortSeq)).head.toSeq ==
      be.embedBatch(Seq(shortSeq, longSeq)).head.toSeq)
    assert(be.embedBatch(Seq(longSeq)).head.toSeq ==
      be.embedBatch(Seq(longSeq)).head.toSeq)
  }

  test("both residual branches are live: attention and MLP each move the stream") {
    val ids = Array(42L, 7L, 99L, 13L)
    val mask = Array.fill(4)(1)
    val pos = ids.indices.toArray
    val states = ids.toIndexedSeq.map(be.s0)
    val out = be.layerOut(be.layers.head, states, mask, pos, 3)
    assert(out.toSeq != states(3).toSeq, "layer must move the residual stream")
    // ...and attention makes it depend on OTHER tokens' states
    val statesB = states.updated(0, be.s0(999L))
    val outB = be.layerOut(be.layers.head, statesB, mask, pos, 3)
    assert(out.toSeq != outB.toSeq, "attention must mix other positions into the stream")
  }

  test("the stacked backend (distinct per-layer weights) is pad-invariant too") {
    val st = DecoderLayerBackend.stacked()
    val shortSeq = Array(5L, 17L, 23L)
    val longSeq = Array(101L, 7L, 3L, 45L, 88L, 9L)
    assert(st.embedBatch(Seq(shortSeq)).head.toSeq ==
      st.embedBatch(Seq(shortSeq, longSeq)).head.toSeq)
    // and layer 2 actually changes the result vs the single layer
    assert(st.embedBatch(Seq(shortSeq)).head.toSeq !=
      be.embedBatch(Seq(shortSeq)).head.toSeq)
  }

  test("stacking: two layers compose and stay pad-invariant") {
    val seq = Array(5L, 17L, 23L)
    def stackedLast(tids: Array[Long], padLen: Int): Seq[Double] = {
      val n = padLen + tids.length
      val ids = Array.fill(padLen)(0L) ++ tids
      val mask = Array.fill(padLen)(0) ++ Array.fill(tids.length)(1)
      val pos = new Array[Int](n)
      var c = 0
      for (i <- 0 until n) { if (mask(i) == 1) c += 1; pos(i) = math.max(0, c - 1) }
      val s1 = (0 until n).map(j => be.s0(ids(j)))
      // layer 1 at every REAL position feeds layer 2 (pad positions are
      // masked at every consumer, any placeholder state works)
      val s2 = (0 until n).map(j =>
        if (mask(j) == 1) be.layerOut(be.layers.head, s1, mask, pos, j) else s1(j))
      be.finalNormD(be.layerOut(be.layers.head, s2, mask, pos, n - 1)).toSeq
    }
    val alone = stackedLast(seq, 0)
    val padded = stackedLast(seq, 4)
    assert(alone == padded, "a stacked forward must not leak pad length")
    assert(alone.forall(d => !d.isNaN && !d.isInfinite))
  }

  test("full model: the checkpoint's embed table IS the q84 bank, and it steers s0") {
    val (emb, layers, gFinal) = LayerBank.loadedFull
    // the model.embed_tokens tensor carries the EmbTableBank values —
    // the full checkpoint and the q84 single-file bank are one table
    assert(emb == graft.backend.EmbTableBank.loadedQuantized)
    val fm = DecoderLayerBackend.fullModel()
    assert(fm.layers == layers && fm.gFinal == gFinal)
    // in-vocab ids read the learned row: s0 is the quantized table row,
    // not the hash stream
    val t = 7L
    assert(fm.s0(t).toSeq == (0 until 8).map(d =>
      math.floor(emb((t * 8).toInt + d).toDouble / 1024.0 * 1000000.0 + 0.5).toLong))
    assert(fm.s0(t).toSeq != DecoderLayerBackend.stacked().s0(t).toSeq)
    // out-of-table ids fall back to the hash stream — the whole forward
    // over such a sequence equals the plain stacked backend
    val oov = Array(1000L, 2345L, 777L)
    assert(fm.embedBatch(Seq(oov)).head.toSeq ==
      DecoderLayerBackend.stacked().embedBatch(Seq(oov)).head.toSeq)
  }

  test("full model: batch composition cannot change results (learned s0 included)") {
    val fm = DecoderLayerBackend.fullModel()
    val a = Array(1L, 7L, 23L, 4L)   // in-vocab: learned rows seed the stream
    val b = Array(3L, 43L, 11L, 9L, 2L, 30L)
    assert(fm.embedBatch(Seq(a)).head.toSeq == fm.embedBatch(Seq(a, b)).head.toSeq)
    assert(fm.embedBatch(Seq(b)).head.toSeq == fm.embedBatch(Seq(a, b))(1).toSeq)
    // the learned table actually changes the forward vs hash embeddings
    assert(fm.embedBatch(Seq(a)).head.toSeq !=
      DecoderLayerBackend.stacked().embedBatch(Seq(a)).head.toSeq)
  }

  test("allStates: the pad-free all-position pass agrees with the pooled forward") {
    val fm = DecoderLayerBackend.fullModel()
    val tids = Array(1L, 7L, 23L, 4L, 30L)
    val states = fm.allStates(tids)
    assert(states.length == tids.length)
    // the last position's post-stack state through final norm + l2 IS
    // the pooled embedding (same arithmetic, layerAllOut ≡ layerOut)
    val h = fm.finalNormD(states.last)
    val norm = math.sqrt(h.map(x => x * x).sum) + graft.functions.K.Eps
    assert(h.map(_ / norm).toSeq == fm.embedBatch(Seq(tids)).head.toSeq)
    assert(fm.allStates(Array.empty[Long]).isEmpty)
  }

  test("tiedSparseWeights: tied head needs the table, emits positive max-merged weights") {
    val fm = DecoderLayerBackend.fullModel()
    val tids = Array(3L, 43L, 11L, 9L)
    val sw = fm.tiedSparseWeights(tids)
    assert(sw.nonEmpty && sw.forall(_._2 > 0L))
    assert(sw.map(_._1).distinct.length == sw.length)
    // deterministic
    assert(fm.tiedSparseWeights(tids) == sw)
    // the plain stacked backend has no tied head
    assertThrows[IllegalStateException](
      DecoderLayerBackend.stacked().tiedSparseWeights(tids))
  }

  test("colbertTokens: one l2 vector per token after the first") {
    val fm = DecoderLayerBackend.fullModel()
    val w = graft.backend.ColbertHeadBank.loadedQuantized
    val out = graft.backend.ColbertHeadBank.OutDim
    val tids = Array(1L, 7L, 23L, 4L)
    // distinct from MergerBank's (B3, C3) stream at every shared index
    assert(w.indices.map(i => graft.backend.MergerBank.weightK(i)) != w)
    val vecs = fm.colbertTokens(tids, w, out)
    assert(vecs.length == tids.length - 1)
    vecs.foreach { v =>
      assert(v.length == out)
      assert(math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-9)
    }
    assert(fm.colbertTokens(Array(5L), w, out).isEmpty)
  }

  test("the final norm eps guards the zero state") {
    val zero = be.finalNormD(Array.fill(8)(0L))
    assert(zero.toSeq == Seq.fill(8)(0.0))
  }

  test("padded query positions are rejected") {
    val states = IndexedSeq(be.s0(0L), be.s0(5L))
    assertThrows[IllegalArgumentException](
      be.layerOut(be.layers.head, states, Array(0, 1), Array(0, 0), 0))
  }
}
