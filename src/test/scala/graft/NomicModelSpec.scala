package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.backend.{NomicBank, NomicModelBackend}

/** The full learned NomicBert-MoE model: checkpoint round-trip, the
  * structural contrasts with the Qwen3 stack (bidirectionality,
  * post-norm, partial non-interleaved rotary, combined Wqkv), MoE-vs-std
  * layer distinction, and batch invariance — the properties of
  * `NomicV2MoeTextEmbedding::embed`
  * (/root/reference/src/models/nomic_v2_moe.rs:764-800). */
class NomicModelSpec extends AnyFunSuite {

  private val be = NomicModelBackend()
  import NomicBank._

  test("NomicBank: safetensors round-trip reproduces the generating streams") {
    val w = NomicBank.loaded
    assert(w.word.length == VocabSize * Hidden)
    assert(w.word.indices.forall(i => w.word(i) == weightK(OffWord + i)))
    assert(w.typeRow.indices.forall(i => w.typeRow(i) == weightK(OffType + i)))
    assert(w.embLnW.indices.forall(i => w.embLnW(i) == 2048L + gainK(GEmbLn + i)))
    assert(w.embLnB.indices.forall(i => w.embLnB(i) == weightK(OffEmbLnB + i)))
    assert(w.layers.length == NLayers)
    val l0 = w.layers(0)
    val b0 = layerBase(0)
    assert(l0.wqkv.indices.forall(i => l0.wqkv(i) == weightK(b0 + RWqkv + i)))
    assert(l0.wqkvB.indices.forall(i => l0.wqkvB(i) == weightK(b0 + RWqkvB + i)))
    assert(l0.outW.indices.forall(i => l0.outW(i) == weightK(b0 + ROut + i)))
    assert(l0.n1w.indices.forall(i => l0.n1w(i) == 2048L + gainK(gN1(0) + i)))
    assert(l0.std.isDefined && l0.moe.isEmpty, "layer 0 must be the standard MLP")
    val l1 = w.layers(1)
    val b1 = layerBase(1)
    assert(l1.std.isEmpty && l1.moe.isDefined, "layer 1 must be the MoE block (idx % 2 == 1)")
    val moe = l1.moe.get
    assert(moe.router.indices.forall(i => moe.router(i) == weightK(b1 + RRouter + i)))
    assert(moe.w1.indices.forall(i => moe.w1(i) == weightK(b1 + RW1 + i)))
    assert(moe.w2.indices.forall(i => moe.w2(i) == weightK(b1 + RW2 + i)))
    assert(moe.eb.indices.forall(i => moe.eb(i) == weightK(b1 + REb + i)))
    // the two layers share NO tensor values (disjoint stream ranges)
    assert(l0.wqkv != l1.wqkv)
    assert(l0.outW != l1.outW)
  }

  test("streams are distinct from the Qwen3-family banks") {
    val w = NomicBank.loaded
    // base offset 20000 on the (B3, A3) pair: no overlap with EmbTable/
    // Attn/Mlp values at shared indices
    assert(w.word != graft.backend.EmbTableBank.loadedQuantized)
    assert((0 until 64).count(i =>
      weightK(i) == graft.backend.AttnBank.weightK(i)) < 16)
  }

  test("batch composition cannot change results (per-doc bidirectional forward)") {
    val a = Array(5L, 17L, 23L)
    val b = Array(41L, 7L, 3L, 45L, 60L, 9L)
    assert(be.embedBatch(Seq(a)).head.toSeq == be.embedBatch(Seq(a, b)).head.toSeq)
    assert(be.embedBatch(Seq(b)).head.toSeq == be.embedBatch(Seq(a, b)).last.toSeq)
  }

  test("attention is BIDIRECTIONAL: early positions see later tokens") {
    // change ONLY the last token; a causal model would keep position 0's
    // state fixed — here every position's state must move
    val a = Array(5L, 17L, 23L, 41L)
    val b = Array(5L, 17L, 23L, 42L)
    val sa = be.forwardStates(a)
    val sb = be.forwardStates(b)
    assert(sa.head.toSeq != sb.head.toSeq,
      "position 0 must depend on the last token (build_bidirectional_mask)")
  }

  test("the rotary tail passes through: rotation touches only the first RotaryDim dims") {
    // same token at two positions: projections differ only through the
    // rotated dims; verify via the layer's kv internals indirectly —
    // position matters (rotary live) but a rotation-free model property
    // (pure pass-through) would make these equal
    val a = Array(5L, 17L)
    val b = Array(17L, 5L)
    assert(be.embedDoc(a).toSeq != be.embedDoc(b).toSeq,
      "token order must matter (positions enter through the rotation)")
  }

  test("post-norm: the final block state is LayerNorm-shaped (bounded by the gains)") {
    // a LayerNorm output has mean ~bias and unit-ish scale: the state
    // values stay within a few QS units — a pre-norm residual stream
    // would drift unboundedly with depth
    val st = be.forwardStates(Array(5L, 17L, 23L, 41L, 60L))
    st.foreach(s => s.foreach(v =>
      assert(math.abs(v) < 5L * 1000000L, s"post-norm state out of band: $v")))
  }

  test("MoE layer is live: routing differences move the output") {
    // two docs whose layer-0 outputs differ must route/mix differently
    // through layer 1; sanity: outputs differ and are finite unit vectors
    val e1 = be.embedDoc(Array(5L, 17L, 23L))
    val e2 = be.embedDoc(Array(41L, 7L, 3L))
    assert(e1.toSeq != e2.toSeq)
    Seq(e1, e2).foreach { e =>
      val n = math.sqrt(e.map(v => v * v).sum)
      assert(math.abs(n - 1.0) < 1e-9, "mean-pool + l2 must emit unit vectors")
      e.foreach(v => assert(!v.isNaN && !v.isInfinity))
    }
  }

  test("determinism: repeated forwards are bit-identical") {
    val ids = Array(5L, 17L, 23L, 41L, 60L, 9L)
    val r = (1 to 5).map(_ => be.embedDoc(ids).toSeq)
    assert(r.distinct.size == 1)
  }
}
