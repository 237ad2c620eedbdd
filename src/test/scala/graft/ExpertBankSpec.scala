package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.backend.{ExpertBank, MoEBackend}
import graft.model.Safetensors

/** The learned-expert bank and its one-shard-per-expert checkpoint. */
class ExpertBankSpec extends AnyFunSuite {

  test("eight shards resolve in order through the full probe walk") {
    assert(Safetensors.resolveWeightFiles(ExpertBank.shardFiles.keySet) ==
      Safetensors.shardFileNames(ExpertBank.NExperts))
  }

  test("loadedQuantized recovers the generating formula expert-major") {
    val wq = ExpertBank.loadedQuantized
    assert(wq.length == ExpertBank.NExperts * ExpertBank.Dim * ExpertBank.HiddenDim)
    assert(wq == (0 until wq.length).map(ExpertBank.weightK))
    // fractional bank, not integers in float clothing
    assert(ExpertBank.expertMatrix(0).exists(f => f != math.floor(f)))
  }

  test("the bank genuinely steers the forward (≠ hash experts; routing shared)") {
    val tids = Array(42L, 7L, 999L)
    val hash = MoEBackend(dim = 8)
    val learned = MoEBackend(dim = 8, expertBank = Some(ExpertBank.loadedQuantized))
    assert(hash.embedBatch(Seq(tids)).head.toSeq !=
      learned.embedBatch(Seq(tids)).head.toSeq)
    // routing is bank-independent — same top-k either way
    assert(hash.routeTopK(42L).toSeq == learned.routeTopK(42L).toSeq)
  }

  test("weighted forward: by-hand recompute of one token, one dim") {
    val t = 42L
    val be = MoEBackend(dim = 8, expertBank = Some(ExpertBank.loadedQuantized))
    val M3 = graft.functions.K.M3
    def cell(i: Int): Long =
      ((t % M3) * graft.functions.K.A3 + i.toLong * graft.functions.K.B3 +
        graft.functions.K.C3) % M3
    val top = be.routeTopK(t)
    val denom = (0 until 8).map(e => cell(MoEBackend.OffRouter + e) + 1L).sum
    def expertOut(e: Int, d: Int): Long =
      (0 until ExpertBank.HiddenDim).map(h =>
        ExpertBank.weightK((e * 8 + d) * 8 + h) * cell(h)).sum
    val num = top.map { case (e, s) => (s + 1L) * expertOut(e, 0) }.sum
    val bias = ((1L % M3) * graft.functions.K.A3 +
      (MoEBackend.OffBias + 0).toLong * graft.functions.K.B3 +
      graft.functions.K.C3) % M3
    val q = math.floor(((num + bias * denom).toDouble / denom.toDouble) *
      MoEBackend.QuantScale + 0.5).toLong
    val mn = (q.toDouble / 1.0 / MoEBackend.QuantScale / (2.0 * M3.toDouble)) * 2.0 - 1.0
    // single-token doc: the pooled pre-norm value at dim 0 is mn
    val out = be.embedBatch(Seq(Array(t))).head
    val ss = math.sqrt((0 until 8).map { d =>
      val numd = top.map { case (e, s) => (s + 1L) * expertOut(e, d) }.sum
      val biasd = ((1L % M3) * graft.functions.K.A3 +
        (MoEBackend.OffBias + d).toLong * graft.functions.K.B3 +
        graft.functions.K.C3) % M3
      val qd = math.floor(((numd + biasd * denom).toDouble / denom.toDouble) *
        MoEBackend.QuantScale + 0.5).toLong
      val v = (qd.toDouble / MoEBackend.QuantScale / (2.0 * M3.toDouble)) * 2.0 - 1.0
      v * v
    }.sum)
    assert(out(0) == mn / (ss + graft.functions.K.Eps))
  }

  test("a wrong-sized bank is rejected at construction") {
    intercept[IllegalArgumentException] {
      MoEBackend(dim = 8, expertBank = Some(IndexedSeq(1L, 2L)))
    }
  }
}
