package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.backend.{DecoderLayerBackend, RerankHeadBackend, RerankHeadBank}

/** The learned sequence-classification head — the reference reranker's
  * `logits[:, 0]` (/root/reference/src/reranking/impl.rs:167-180) as a
  * real `score.weight`/`score.bias` Linear over the full learned
  * model's pooled pre-normalize hidden. */
class RerankHeadSpec extends AnyFunSuite {

  private val (w, b) = RerankHeadBank.loadedQuantized
  private val head = RerankHeadBackend(DecoderLayerBackend.fullModel(), w, b)

  test("checkpoint round-trip: weight row + bias carry the generating stream") {
    assert(w.length == RerankHeadBank.Hidden)
    assert(w.indices.forall(i => w(i) == RerankHeadBank.headK(i)))
    assert(b == RerankHeadBank.headK(RerankHeadBank.Hidden))
    // distinct from the other (B3, A3)-stream banks: a wrong-bank
    // wiring must fail the oracle, not silently pass
    assert(w.indices.map(i => graft.backend.SparseLinearBank.weightK(i)) != w)
    assert(w.indices.map(i => graft.backend.ProjectionBank.weightK(i)) != w)
  }

  test("the score IS the head fold over the pooled hidden, bias last") {
    val ids = Array(1L, 7L, 23L, 4L)
    val h = head.model.pooledHidden(Seq(ids)).head
    var s = 0.0
    for (d <- h.indices) s += (w(d).toDouble / 1024.0) * h(d)
    val expected = s + b.toDouble / 1024.0
    assert(head.embedBatch(Seq(ids)).head.toSeq == Seq(expected))
  }

  test("dim-1 scores ride the embed plumbing and stay batch-invariant") {
    assert(head.dim == 1)
    val a = Array(1L, 7L, 23L, 4L)
    val c = Array(3L, 43L, 11L, 9L, 2L, 30L)
    assert(head.embedBatch(Seq(a)).head.toSeq == head.embedBatch(Seq(a, c)).head.toSeq)
    assert(head.embedBatch(Seq(c)).head.toSeq == head.embedBatch(Seq(a, c))(1).toSeq)
  }

  test("the head separates inputs (weights are live, not a constant map)") {
    val s1 = head.embedBatch(Seq(Array(1L, 7L, 23L))).head(0)
    val s2 = head.embedBatch(Seq(Array(2L, 9L, 40L))).head(0)
    assert(s1 != s2)
  }

  test("pooledHidden is embedBatch pre-l2 (the refactor contract)") {
    val m = DecoderLayerBackend.fullModel()
    val ids = Array(5L, 17L, 23L)
    val h = m.pooledHidden(Seq(ids)).head
    val norm = math.sqrt(h.map(x => x * x).sum) + graft.functions.K.Eps
    assert(m.embedBatch(Seq(ids)).head.toSeq == h.map(_ / norm).toSeq)
  }
}
