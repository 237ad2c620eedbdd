package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.backend.{AttnBank, GqaAttentionBackend}

/** The learned-projection GQA attention backend: bank round-trip
  * through the two-shard safetensors checkpoint, the pipeline
  * invariance contracts (pad/batch composition), causality, and the
  * repeat_kv sharing contract (/root/reference/src/models/qwen3.rs:
  * 727-737, 818-820) pinned with a synthetic bank. */
class GqaAttentionSpec extends AnyFunSuite {

  private val be = GqaAttentionBackend.fromBank()

  // ---- the checkpoint round-trip -----------------------------------------

  test("AttnBank: two-shard load round-trips the generating formula") {
    val loaded = AttnBank.loadedQuantized
    assert(loaded.length == AttnBank.Total)
    assert(loaded.indices.forall(i => loaded(i) == AttnBank.weightK(i)),
      "re-quantized F32 entries must equal their integer numerators")
  }

  test("AttnBank: shard files carry the reference naming and split q/k from v/o") {
    val names = be.bank // force init
    val fs = AttnBank.shardFiles
    assert(fs.keySet == Set(
      "model-00001-of-00002.safetensors", "model-00002-of-00002.safetensors"))
    assert(names.length == AttnBank.Total)
  }

  // ---- pipeline contracts (the q68 invariances on the learned path) ------

  test("batch composition cannot change results (left pad + mask-derived positions)") {
    val shortSeq = Array(5L, 17L, 23L)
    val longSeq = Array(101L, 7L, 3L, 45L, 88L, 9L)
    val alone = be.embedBatch(Seq(shortSeq)).head.toSeq
    val padded = be.embedBatch(Seq(shortSeq, longSeq)).head.toSeq
    assert(alone == padded)
    // and deterministic
    assert(be.embedBatch(Seq(longSeq)).head.toSeq ==
      be.embedBatch(Seq(longSeq)).head.toSeq)
  }

  test("causality: the state at query index qi ignores later tokens") {
    val a = Array(42L, 7L, 99L, 13L, 64L)
    val b = Array(42L, 7L, 99L, 1L, 2L) // same prefix, different tail
    def unpadded(ids: Array[Long]) =
      (ids, Array.fill(ids.length)(1), ids.indices.toArray)
    val (idsA, mA, pA) = unpadded(a)
    val (idsB, mB, pB) = unpadded(b)
    assert(be.attnAt(idsA, mA, pA, 2).toSeq == be.attnAt(idsB, mB, pB, 2).toSeq)
    assert(be.attnAt(idsA, mA, pA, 4).toSeq != be.attnAt(idsB, mB, pB, 4).toSeq)
  }

  test("padded query positions are rejected, not NaN") {
    val ids = Array(0L, 5L, 17L)
    val mask = Array(0, 1, 1)
    val pos = Array(0, 0, 1)
    assertThrows[IllegalArgumentException](be.attnAt(ids, mask, pos, 0))
  }

  // ---- repeat_kv ----------------------------------------------------------

  test("repeat_kv: duplicated q-head rows + identity o_proj ⇒ identical head outputs") {
    // Both query heads read the SAME kv head (nKvHeads=1). With head 1's
    // q_proj rows copied from head 0 and o_proj = identity, the two
    // heads' quantized mixes must coincide exactly — they differ ONLY
    // through q_proj. This fails if head 1 read its own kv head.
    import AttnBank.{Hidden => H, HeadDim => D, QOut, KvOut}
    val bank = AttnBank.loadedQuantized.toArray
    // copy q head 0 rows (D rows of H) over q head 1
    var i = 0
    while (i < D * H) { bank(D * H + i) = bank(i); i += 1 }
    // o_proj = identity: out dd picks z(dd)
    val offO = (QOut + 2 * KvOut) * H
    java.util.Arrays.fill(bank, offO, offO + H * QOut, 0L)
    var dd = 0
    while (dd < H) { bank(offO + dd * QOut + dd) = 1L; dd += 1 }
    val twin = GqaAttentionBackend(bank.toIndexedSeq)
    val ids = Array(42L, 7L, 99L, 13L)
    val out = twin.embedBatch(Seq(ids)).head
    val (h0, h1) = (out.slice(0, D).toSeq, out.slice(D, 2 * D).toSeq)
    assert(h0 == h1, "with shared kv and equal q rows, head mixes must be equal")
    // negative control: the real bank's heads differ
    val real = be.embedBatch(Seq(ids)).head
    assert(real.slice(0, D).toSeq != real.slice(D, 2 * D).toSeq)
  }

  // ---- q_norm / k_norm (q89) ----------------------------------------------

  test("QkNormBank: load round-trips the gain formula; norms are live and invariant") {
    import graft.backend.QkNormBank
    val (gq, gk) = QkNormBank.loaded
    assert(gq.indices.forall(d => gq(d) == 2048L + QkNormBank.gainK(d)))
    assert(gk.indices.forall(d => gk(d) == 2048L + QkNormBank.gainK(AttnBank.HeadDim + d)))
    val normed = GqaAttentionBackend.withQkNorm()
    val shortSeq = Array(5L, 17L, 23L)
    val longSeq = Array(101L, 7L, 3L, 45L, 88L, 9L)
    // the norm changes the forward (it is not a no-op)...
    assert(normed.embedBatch(Seq(shortSeq)).head.toSeq !=
      be.embedBatch(Seq(shortSeq)).head.toSeq)
    // ...and the pipeline invariances survive it
    assert(normed.embedBatch(Seq(shortSeq)).head.toSeq ==
      normed.embedBatch(Seq(shortSeq, longSeq)).head.toSeq)
  }

  // ---- attention_bias branch (q94) ----------------------------------------

  test("AttnBiasBank: load round-trips the formula; biases are live and invariant") {
    import graft.backend.AttnBiasBank
    val b = AttnBiasBank.loadedQuantized
    assert(b.length == AttnBiasBank.Total)
    assert(b.indices.forall(i => b(i) == AttnBiasBank.biasK(i)))
    val biased = GqaAttentionBackend.withBiases()
    val shortSeq = Array(5L, 17L, 23L)
    val longSeq = Array(101L, 7L, 3L, 45L, 88L, 9L)
    // the biases change the forward vs linear_no_bias...
    assert(biased.embedBatch(Seq(shortSeq)).head.toSeq !=
      be.embedBatch(Seq(shortSeq)).head.toSeq)
    // ...the o-bias alone is live (zero the q/k/v biases, keep o's)...
    val oOnly = GqaAttentionBackend(AttnBank.loadedQuantized,
      biases = Some(b.indices.map(i => if (i < AttnBiasBank.OffO) 0L else b(i))))
    assert(oOnly.embedBatch(Seq(shortSeq)).head.toSeq !=
      be.embedBatch(Seq(shortSeq)).head.toSeq)
    // ...and the pipeline invariances survive the branch
    assert(biased.embedBatch(Seq(shortSeq)).head.toSeq ==
      biased.embedBatch(Seq(shortSeq, longSeq)).head.toSeq)
  }

  test("v is not rotated: corrupting only rotation-relevant k rows moves scores, not values") {
    // Zero out k_proj entirely: every score collapses to the constant
    // (0 % M3) + 1 = 1 per key, so the output becomes the UNWEIGHTED
    // mean of the v projections — still well-defined (no NaN), proving
    // the value path is independent of the rotated score path.
    import AttnBank.{Hidden => H, QOut, KvOut}
    val bank = AttnBank.loadedQuantized.toArray
    java.util.Arrays.fill(bank, QOut * H, QOut * H + KvOut * H, 0L)
    val flat = GqaAttentionBackend(bank.toIndexedSeq)
    val out = flat.embedBatch(Seq(Array(42L, 7L, 99L))).head
    assert(out.forall(d => !d.isNaN && !d.isInfinite))
  }
}
