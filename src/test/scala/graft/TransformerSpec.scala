package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.backend.{BackendEmbedder, TransformerBackend}
import graft.functions.{K, Kernel}

/** The I4 transformer-contract backend: the reference's batch-size
  * invariance test (/root/reference/tests/text-embeddings.rs:494-523)
  * against a backend that is GENUINELY sequence- and position-dependent
  * — plus negative controls proving the invariance test has teeth (a
  * backend that mishandles left padding or position ids fails it), the
  * causal-mask contract, and the pad-free reference recompute the
  * DuckDB oracle mirrors. */
class TransformerSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val be = TransformerBackend(dim = 8)

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    .select(col("doc_id"), col("text"))

  private def withTids = docs
    .withColumn("tids", Kernel.tokenIds(col("text")))
    .filter(size(col("tids")) > 0)
    .select(col("doc_id"), col("tids"))

  private def embedMap(df: org.apache.spark.sql.DataFrame,
                       backend: TransformerBackend,
                       batchSize: Int): Map[Long, Seq[Double]] =
    BackendEmbedder.embed(df, "doc_id", "tids", backend, batchSize)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq)
      .toMap

  // ---- the reference's invariance contract -------------------------------

  test("batch-size invariance: batchSize 1 ≡ 7 ≡ 256, bit-exact") {
    // different micro-batch sizes → different batch-longest pad widths
    // per row → identical results (tests/text-embeddings.rs:494-523)
    val whole = embedMap(withTids, be, 256)
    val small = embedMap(withTids, be, 7)
    val single = embedMap(withTids, be, 1)
    assert(whole.nonEmpty)
    assert(whole == small)
    assert(whole == single)
  }

  test("repartition invariance: 1 ≡ 13 partitions, bit-exact") {
    val a = embedMap(withTids.coalesce(1), be, 64)
    val b = embedMap(withTids.repartition(13), be, 64)
    assert(a == b)
  }

  // ---- negative controls: the test must have teeth -----------------------

  test("tensor-index positions (the classic left-pad bug) DO leak pad length") {
    // maskDerivedPositions=false uses the raw tensor index as position:
    // a real token's position then shifts with pad width, so batching a
    // short sequence with a longer one changes its embedding — the
    // failure mode the mask-derived rule exists to prevent. If this
    // test ever fails, the backend stopped being position-dependent and
    // the invariance tests above prove nothing.
    val buggy = TransformerBackend(dim = 8, maskDerivedPositions = false)
    val shortSeq = Array(5L, 17L, 23L)
    val longSeq = Array(101L, 7L, 3L, 45L, 88L, 9L)
    val alone = buggy.embedBatch(Seq(shortSeq)).head.toSeq
    val padded = buggy.embedBatch(Seq(shortSeq, longSeq)).head.toSeq
    assert(alone != padded, "tensor-index positions must leak pad length")
    // the contract-abiding backend is invariant on the identical input
    assert(be.embedBatch(Seq(shortSeq)).head.toSeq ==
      be.embedBatch(Seq(shortSeq, longSeq)).head.toSeq)
  }

  test("unmasked padding DOES leak pad tokens into the pooled state") {
    val buggy = TransformerBackend(dim = 8, maskPadding = false)
    val shortSeq = Array(5L, 17L, 23L)
    val longSeq = Array(101L, 7L, 3L, 45L, 88L, 9L)
    val alone = buggy.embedBatch(Seq(shortSeq)).head.toSeq
    val padded = buggy.embedBatch(Seq(shortSeq, longSeq)).head.toSeq
    assert(alone != padded, "unmasked pads must contaminate attention")
  }

  // ---- causal mask -------------------------------------------------------

  test("causal mask: hidden state at position i ignores all later tokens") {
    val tids = Array(42L, 7L, 99L, 13L, 64L)
    def unpadded(ids: Array[Long]) =
      (ids, Array.fill(ids.length)(1), ids.indices.toArray)
    val (ids5, m5, p5) = unpadded(tids)
    val (ids3, m3, p3) = unpadded(tids.take(3))
    // query index 2 sees tokens 0..2 in both tensors — later tokens are
    // additively masked out to exactly zero weight
    assert(be.hiddenAt(ids5, m5, p5, 2).toSeq == be.hiddenAt(ids3, m3, p3, 2).toSeq)
  }

  test("the forward is genuinely order-dependent (not a bag of tokens)") {
    val a = be.embedBatch(Seq(Array(1L, 2L, 3L, 4L))).head.toSeq
    val b = be.embedBatch(Seq(Array(4L, 3L, 2L, 1L))).head.toSeq
    assert(a != b, "token order must matter — HashingBackend cannot do this")
  }

  // ---- oracle-shape reference recompute ----------------------------------

  test("left-padded forward ≡ the pad-free per-doc recompute (oracle shape)") {
    import K.{M3, A3, B3, C3}
    def emb(t: Long, d: Int): Long = ((t % M3) * A3 + d.toLong * B3 + C3) % M3
    def rot(t: Long, p: Int): Array[Long] = {
      val out = new Array[Long](8)
      var h = 0
      while (h < 4) {
        val x0 = emb(t, 2 * h); val x1 = emb(t, 2 * h + 1)
        val u = (p + h + 2).toLong; val c = u * u - 1L; val s = 2L * u
        out(2 * h) = (((x0 * c - x1 * s) % M3) + M3) % M3
        out(2 * h + 1) = (((x0 * s + x1 * c) % M3) + M3) % M3
        h += 1
      }
      out
    }
    def reference(tids: Array[Long]): Seq[Double] = {
      val n = tids.length
      val ql = rot(tids(n - 1), n - 1)
      val w = (0 until n).map { j =>
        val kk = rot(tids(j), j)
        ((0 until 8).map(d => ql(d) * kk(d)).sum % M3) + 1L
      }
      val tw = w.sum
      val y = (0 until 8).map(d => (0 until n).map(j => w(j) * emb(tids(j), d)).sum)
      val mn = y.map(v => (v.toDouble / tw.toDouble / M3.toDouble) * 2.0 - 1.0)
      val nv = math.sqrt(mn.map(v => v * v).sum)
      mn.map(_ / (nv + K.Eps))
    }
    val seqs = Seq(
      Array(5L, 17L, 23L),
      Array(101L, 7L, 3L, 45L, 88L, 9L),
      Array(999999L),
      Array.tabulate(40)(i => (i * 31 + 7).toLong))
    val got = be.embedBatch(seqs) // one batch → three different pad widths
    seqs.zip(got).foreach { case (s, g) =>
      assert(g.toSeq == reference(s), s"len ${s.length}")
    }
  }

  test("empty encoding → zero vector, deterministic across calls") {
    val a = be.embedBatch(Seq(Array.empty[Long], Array(3L)))
    assert(a.head.toSeq == Seq.fill(8)(0.0))
    val b = be.embedBatch(Seq(Array.empty[Long], Array(3L)))
    assert(a.map(_.toSeq) == b.map(_.toSeq))
  }
}
