package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.backend.MoEBackend
import graft.functions.K

/** The I5/A10 MoE-routing contract (nomic_v2_moe.rs): top-k expert
  * selection order, the tie rule, un-renormalized gate weights, shared
  * bias, and exact pooling invariance. */
class MoESpec extends AnyFunSuite {

  private val be = MoEBackend(dim = 8, nExperts = 8, topK = 2)

  test("packed-key routing ≡ full sort by (score desc, index asc)") {
    (0L until 5000L).foreach { t =>
      val got = be.routeTopK(t).toSeq
      val ref = MoEBackend.routeAllSorted(t, 8).take(2)
      assert(got == ref, s"token $t")
    }
  }

  test("tie rule: equal scores decode to the LOWER expert index") {
    // real router cells CANNOT tie: the score gap between experts e1≠e2
    // is the constant (e1−e2)·B3 mod M3, nonzero for a prime modulus —
    // so the stable-sort rule (nomic_v2_moe.rs:352-355) is pinned on the
    // packed-key mechanism itself with synthetic tied scores
    val E = 8
    val scores = Array(5L, 9L, 9L, 3L, 9L, 1L, 0L, 2L) // three-way tie at 9
    val keys = scores.zipWithIndex.map { case (s, e) => s * E + (E - 1 - e) }
    def popMax(remaining: Set[Int]): Int = {
      val k = remaining.map(keys(_)).max
      E - 1 - (k % E).toInt
    }
    val first = popMax((0 until E).toSet)
    val second = popMax((0 until E).toSet - first)
    val third = popMax((0 until E).toSet - first - second)
    assert((first, second, third) == ((1, 2, 4)),
      "tied experts must dispatch in ascending index order")
  }

  test("top-k is a strict subset: dropping an expert changes the output") {
    // if routing silently mixed ALL experts, topK would not matter
    val k1 = MoEBackend(dim = 8, nExperts = 8, topK = 1)
    val k8 = MoEBackend(dim = 8, nExperts = 8, topK = 8)
    val tids = Array(17L, 99L, 4242L)
    val a = be.embedBatch(Seq(tids)).head.toSeq
    assert(a != k1.embedBatch(Seq(tids)).head.toSeq)
    assert(a != k8.embedBatch(Seq(tids)).head.toSeq)
  }

  test("batch and partition shape cannot change results (exact pooling)") {
    val seqs = Seq(
      Array(5L, 17L, 23L),
      Array(101L, 7L, 3L, 45L, 88L, 9L),
      Array(999999L))
    val together = be.embedBatch(seqs).map(_.toSeq)
    val separate = seqs.map(s => be.embedBatch(Seq(s)).head.toSeq)
    assert(together == separate)
  }

  test("mixed output ≡ naive per-token recompute with un-renormalized gates") {
    import K.{M3, A3, B3, C3}
    def cell(t: Long, i: Int): Long = ((t % M3) * A3 + i.toLong * B3 + C3) % M3
    def reference(tids: Array[Long]): Seq[Double] = {
      val sums = new Array[Long](8)
      tids.foreach { t =>
        val denom = (0 until 8).map(e => cell(t, MoEBackend.OffRouter + e) + 1L).sum
        val top2 = MoEBackend.routeAllSorted(t, 8).take(2)
        (0 until 8).foreach { d =>
          val num = top2.map { case (e, s) =>
            (s + 1L) * cell(t, MoEBackend.OffExperts + e * 8 + d)
          }.sum
          val bias = cell(1L, MoEBackend.OffBias + d)
          sums(d) += math.floor(
            ((num + bias * denom).toDouble / denom.toDouble) * 1000000.0 + 0.5).toLong
        }
      }
      val mn = sums.map(s =>
        (s.toDouble / tids.length.toDouble / 1000000.0 / (2.0 * M3.toDouble)) * 2.0 - 1.0)
      val nv = math.sqrt(mn.map(v => v * v).sum)
      mn.map(_ / (nv + K.Eps)).toSeq
    }
    val seqs = Seq(
      Array(5L, 17L, 23L),
      Array.tabulate(40)(i => (i * 31 + 7).toLong))
    be.embedBatch(seqs).zip(seqs).foreach { case (got, s) =>
      assert(got.toSeq == reference(s), s"len ${s.length}")
    }
  }

  test("empty encoding → zero vector") {
    assert(be.embedBatch(Seq(Array.empty[Long])).head.toSeq == Seq.fill(8)(0.0))
  }

  // ---- the learned router (q92) -------------------------------------------

  test("RouterBank: load round-trips the formula; learned routing is live") {
    import graft.backend.RouterBank
    val w = RouterBank.loadedQuantized
    assert(w.length == RouterBank.NExperts * RouterBank.HiddenDim)
    assert(w.indices.forall(i => w(i) == RouterBank.weightK(i)))
    val routed = MoEBackend(dim = 8, routerBank = Some(w))
    // the learned logits must route SOME token to a different top-2
    // than the hash logits (otherwise the gate proves nothing new)
    val differs = (0L until 200L).exists(t => routed.routeTopK(t).map(_._1).toSeq !=
      be.routeTopK(t).map(_._1).toSeq)
    assert(differs, "learned router never changed a routing decision")
    // selection rule preserved: packed-key top-2 == stable full sort
    // over the SAME learned scores
    import K.M3
    for (t <- 0L until 50L) {
      val scores: Seq[(Int, Long)] = (0 until 8).map { e =>
        val acc = (0 until 8).map(h => w(e * 8 + h) *
          (((t % M3) * K.A3 + h.toLong * K.B3 + K.C3) % M3)).sum
        (e, (acc % M3 + M3) % M3)
      }
      val expected = scores.sortBy { case (e, s) => (-s, e) }.take(2).map(_._1)
      assert(routed.routeTopK(t).map(_._1).toSeq == expected, s"t=$t")
    }
  }

  // ---- the complete megablocks layer (q93) --------------------------------

  test("ExpertMlpBank: the checkpoint round-trips, router rows match q92's") {
    import graft.backend.{ExpertMlpBank, RouterBank}
    val em = ExpertMlpBank.loaded
    assert(em.router == RouterBank.loadedQuantized)
    assert(em.w1.indices.forall(i => em.w1(i) == ExpertMlpBank.w1K(i)))
    assert(em.w2.indices.forall(i => em.w2(i) == ExpertMlpBank.w2K(i)))
    assert(em.bias.indices.forall(i => em.bias(i) == ExpertMlpBank.biasK(i)))
  }

  test("megablocks layer: activation and bias are live") {
    import graft.backend.ExpertMlpBank
    val em = ExpertMlpBank.loaded
    val full = MoEBackend(dim = 8, expertMlp = Some(em))
    val seqs = Seq(Array(5L, 17L, 23L), Array.tabulate(20)(i => (i * 31 + 7).toLong))
    // two-matrix experts differ from the single-matrix q83 dispatch
    val single = MoEBackend(dim = 8,
      expertBank = Some(graft.backend.ExpertBank.loadedQuantized),
      routerBank = Some(graft.backend.RouterBank.loadedQuantized))
    assert(full.embedBatch(seqs).map(_.toSeq) != single.embedBatch(seqs).map(_.toSeq))
    // the learned bias moves the output (zero it → different vectors)
    val noBias = MoEBackend(dim = 8,
      expertMlp = Some(em.copy(bias = IndexedSeq.fill(8)(0L))))
    assert(full.embedBatch(seqs).map(_.toSeq) != noBias.embedBatch(seqs).map(_.toSeq))
    // the activation clamps some up lanes and passes others
    import graft.functions.K.{M3, A3, B3, C3}
    val lanes = for (t <- 0L until 20L; e <- 0 until 8; i <- 0 until 8) yield {
      val acc = (0 until 8).map(h =>
        em.w1((e * 8 + i) * 8 + h) * (((t % M3) * A3 + h.toLong * B3 + C3) % M3)).sum
      math.max(0L, (acc % M3 + M3) % M3 - graft.backend.GatedMlpBackend.Center)
    }
    assert(lanes.count(_ == 0L) > 0 && lanes.count(_ > 0L) > 0)
  }
}
