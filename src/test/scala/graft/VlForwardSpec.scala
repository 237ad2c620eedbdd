package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.backend.{TransformerBackend, VlForward}

/** The q78 composition forward: sectioned MRoPE rotation over fused
  * values, last-token pooled (qwen3.rs:1397-1452 embed_image shape). */
class VlForwardSpec extends AnyFunSuite {

  private val fids = Array(42L, 7L, 999L, 13L, 64L)
  private def seqIds(n: Int): Array[Long] = Array.tabulate(n)(_.toLong)

  test("degenerate planes (t=h=w=sequence index) reduce to the q68 forward") {
    // when all three MRoPE planes carry the plain sequential position,
    // every pair's rotation angle u = pos + pair + 2 equals
    // TransformerBackend's — the composition is a strict generalization
    val p = seqIds(fids.length)
    val got = VlForward.embed(fids, p, p, p)
    val be = TransformerBackend(dim = 8)
    val expected = be.embedBatch(Seq(fids)).head
    assert(got.toSeq == expected.toSeq)
  }

  test("all three id planes genuinely steer the forward") {
    val p = seqIds(fids.length)
    val base = VlForward.embed(fids, p, p, p).toSeq
    def bump(a: Array[Long], i: Int): Array[Long] = {
      val b = a.clone(); b(i) += 7L; b
    }
    assert(VlForward.embed(fids, bump(p, 1), p, p).toSeq != base, "t plane inert")
    assert(VlForward.embed(fids, p, bump(p, 1), p).toSeq != base, "h plane inert")
    assert(VlForward.embed(fids, p, p, bump(p, 1)).toSeq != base, "w plane inert")
  }

  test("the forward is order-dependent over fused values") {
    val p = seqIds(fids.length)
    val rev = fids.reverse
    assert(VlForward.embed(fids, p, p, p).toSeq != VlForward.embed(rev, p, p, p).toSeq)
  }

  test("position planes must parallel the fused values") {
    intercept[IllegalArgumentException] {
      VlForward.embed(fids, seqIds(3), seqIds(5), seqIds(5))
    }
    intercept[IllegalArgumentException] {
      VlForward.embed(Array.empty[Long], Array.empty, Array.empty, Array.empty)
    }
  }

  test("deterministic across calls") {
    val p = seqIds(fids.length)
    assert(VlForward.embed(fids, p, p, p).toSeq == VlForward.embed(fids, p, p, p).toSeq)
  }

  // ---- the learned variant (q91) ------------------------------------------

  test("VlAttnBank: single-file load round-trips the generating formula") {
    import graft.backend.VlAttnBank
    val loaded = VlAttnBank.loadedQuantized
    assert(loaded.length == VlAttnBank.Total)
    assert(loaded.indices.forall(i => loaded(i) == VlAttnBank.weightK(i)))
  }

  test("learned forward: all three id planes steer angles; deterministic") {
    import graft.backend.VlAttnBank
    val bank = VlAttnBank.loadedQuantized
    val p = seqIds(fids.length)
    val base = VlForward.embedLearned(fids, p, p, p, bank).toSeq
    def bump(a: Array[Long], i: Int): Array[Long] = {
      val b = a.clone(); b(i) += 7L; b
    }
    // one head of head_dim 8 → pairs 0..3 rotate by planes t,h,w,t —
    // every plane moves the result (with q78's 4-wide rotation the w
    // plane would only enter via pair 2; here it is pinned live)
    assert(VlForward.embedLearned(fids, bump(p, 1), p, p, bank).toSeq != base, "t plane inert")
    assert(VlForward.embedLearned(fids, p, bump(p, 1), p, bank).toSeq != base, "h plane inert")
    assert(VlForward.embedLearned(fids, p, p, bump(p, 1), bank).toSeq != base, "w plane inert")
    assert(VlForward.embedLearned(fids, p, p, p, bank).toSeq == base)
    // and the learned projections actually differ from the hash forward
    assert(base != VlForward.embed(fids, p, p, p).toSeq)
  }
}
