package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.backend.{GatedMlpBackend, MlpBank}
import graft.functions.K

/** The learned gated-MLP backend: bank round-trip through the
  * single-file checkpoint, an independent recompute of the
  * down(act(gate(x)) * up(x)) contract (/root/reference/src/models/
  * qwen3.rs:510-536), and proof that the gate is a LIVE nonlinearity
  * (some lanes clamp to zero, some pass). */
class GatedMlpSpec extends AnyFunSuite {

  private val be = GatedMlpBackend.fromBank()
  import K.{M3, A3, B3, C3}

  test("MlpBank: single-file load round-trips the generating formula") {
    val loaded = MlpBank.loadedQuantized
    assert(loaded.length == MlpBank.Total)
    assert(loaded.indices.forall(i => loaded(i) == MlpBank.weightK(i)))
  }

  test("mlpOut equals a naive functional recompute") {
    val w = MlpBank.loadedQuantized
    def emb(t: Long, e: Int) = ((t % M3) * A3 + e.toLong * B3 + C3) % M3
    def proj(t: Long, off: Int, i: Int) =
      (((0 until MlpBank.Hidden).map(e => w(off + i * MlpBank.Hidden + e) * emb(t, e)).sum
        % M3) + M3) % M3
    def naive(t: Long, d: Int): Long =
      (0 until MlpBank.Inter).map { i =>
        val act = math.max(0L, proj(t, 0, i) - GatedMlpBackend.Center)
        w(MlpBank.OffDown + d * MlpBank.Inter + i) * (act * proj(t, MlpBank.OffUp, i))
      }.sum
    for (t <- Seq(0L, 5L, 17L, 42L, 99L, 12345L); d <- 0 until MlpBank.Hidden)
      assert(be.mlpOut(t, d) == naive(t, d), s"t=$t d=$d")
  }

  test("the gate is a live nonlinearity: some lanes clamp, some pass") {
    def gate(t: Long, i: Int): Long = {
      val w = MlpBank.loadedQuantized
      def emb(e: Int) = ((t % M3) * A3 + e.toLong * B3 + C3) % M3
      val g = (((0 until MlpBank.Hidden).map(e => w(i * MlpBank.Hidden + e) * emb(e)).sum
        % M3) + M3) % M3
      math.max(0L, g - GatedMlpBackend.Center)
    }
    val lanes = for (t <- 0L until 20L; i <- 0 until MlpBank.Inter) yield gate(t, i)
    assert(lanes.count(_ == 0L) > 0, "no lane ever clamps - the gate is dead")
    assert(lanes.count(_ > 0L) > 0, "every lane clamps - the MLP is constant zero")
  }

  test("chunking invariance and determinism") {
    val a = Array(5L, 17L, 23L)
    val b = Array(101L, 7L, 3L, 45L, 88L, 9L)
    assert(be.embedBatch(Seq(a, b)).map(_.toSeq) ==
      Seq(be.embedBatch(Seq(a)).head.toSeq, be.embedBatch(Seq(b)).head.toSeq))
    assert(be.embedBatch(Seq(a)).head.toSeq == be.embedBatch(Seq(a)).head.toSeq)
  }

  test("empty encoding yields the zero vector, not NaN") {
    assert(be.embedBatch(Seq(Array.empty[Long])).head.toSeq ==
      Seq.fill(MlpBank.Hidden)(0.0))
  }
}
