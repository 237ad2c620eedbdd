package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.backend.SparseLinearBank
import graft.model.Safetensors
import graft.operators.SparseEmbedder

/** The learned-weight sparse-linear bank (bgem3_weights.rs:14-43) and
  * its S10 sharded-container consumption path. */
class SparseLinearBankSpec extends AnyFunSuite with SparkSessionTestWrapper {

  test("bank weights are genuinely fractional and exact in F32") {
    val b = SparseLinearBank.bank
    assert(b.length == SparseLinearBank.Dim)
    // at least one non-integral weight — this is a real-valued bank,
    // not an integer table wearing a float type
    assert(b.exists(f => f != math.floor(f)))
    // k/1024 with |k| <= 2000 is exact in F32: the double round-trip
    // recovers the numerator exactly for every dim
    b.zipWithIndex.foreach { case (f, d) =>
      assert(math.floor(f.toDouble * SparseLinearBank.Scale + 0.5).toLong ==
        SparseLinearBank.weightK(d))
    }
  }

  test("loadedQuantized recovers the generating formula from the shard bytes") {
    val (wq, bq) = SparseLinearBank.loadedQuantized
    assert(wq.toSeq == (0 until SparseLinearBank.Dim).map(SparseLinearBank.weightK))
    assert(bq == SparseLinearBank.BiasK)
  }

  test("resolveWeightFiles: model.safetensors wins outright (qwen3.rs:1033)") {
    assert(Safetensors.resolveWeightFiles(
      Set("model.safetensors", "model-00001-of-00002.safetensors")) ==
      Seq("model.safetensors"))
  }

  test("resolveWeightFiles: sharded probe walks i = 1.. and stops at the first gap") {
    val avail = Set(
      "model-00001-of-00003.safetensors",
      "model-00002-of-00003.safetensors",
      "model-00003-of-00003.safetensors")
    assert(Safetensors.resolveWeightFiles(avail) == Safetensors.shardFileNames(3))
    // a gap at i=2 truncates the list (the reference breaks on the
    // first i with no candidate)
    assert(Safetensors.resolveWeightFiles(
      avail - "model-00002-of-00003.safetensors") ==
      Seq("model-00001-of-00003.safetensors"))
  }

  test("resolveWeightFiles errors when nothing resolves") {
    val e = intercept[IllegalArgumentException] {
      Safetensors.resolveWeightFiles(Set("config.json"))
    }
    assert(e.getMessage.contains("Could not locate"))
  }

  test("sharded load ≡ single-file load, tensor-for-tensor") {
    val single = Safetensors.write(Seq(
      ("weight", Seq(SparseLinearBank.Dim), SparseLinearBank.bank),
      ("bias", Seq(1), Array(SparseLinearBank.biasF))))
    val h = Safetensors.parseHeader(single)
    val files = SparseLinearBank.shardFiles
    val sharded = Safetensors.loadShards(
      Safetensors.resolveWeightFiles(files.keySet).map(files))
    assert(sharded.tensorF32("weight").toSeq ==
      Safetensors.tensorF32(single, h, "weight").toSeq)
    assert(sharded.tensorF32("bias").toSeq ==
      Safetensors.tensorF32(single, h, "bias").toSeq)
  }

  test("a tensor defined in two shards is rejected at load") {
    val s1 = Safetensors.write(Seq(("w", Seq(1), Array(1f))))
    val e = intercept[IllegalArgumentException] {
      Safetensors.loadShards(Seq(s1, s1))
    }
    assert(e.getMessage.contains("multiple shards"))
  }

  test("missing tensor errors by name across the shard set") {
    val sharded = Safetensors.loadShards(
      Seq(Safetensors.write(Seq(("w", Seq(1), Array(1f))))))
    val e = intercept[NoSuchElementException] { sharded.tensorF32("nope") }
    assert(e.getMessage.contains("nope"))
  }

  test("relu prunes: some occurring token scores to zero and is dropped") {
    import spark.implicits._
    val df = Seq((0L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val (wq, bq) = SparseLinearBank.loadedQuantized
    val out = SparseEmbedder.weightedExploded(df, "doc_id", "text",
      wq, bq, SparseLinearBank.Scale).collect()
    val nTokens = 8
    assert(out.length > 0 && out.length < nTokens,
      s"expected the relu to keep some but not all of $nTokens tokens, kept ${out.length}")
    // every kept weight sits on the 1/Scale grid and is strictly positive
    out.foreach { r =>
      val w = r.getDouble(2)
      assert(w > 0.0)
      val q = w * SparseLinearBank.Scale
      assert(q == math.rint(q), s"weight $w is off the 1/${SparseLinearBank.Scale} grid")
    }
  }

  test("duplicate token ids max-merge (impl.rs:288-293)") {
    import spark.implicits._
    val (wq, bq) = SparseLinearBank.loadedQuantized
    // same word at positions 0 and 2: hidden is position-dependent, so
    // two different candidate weights exist; the output must keep ONE
    // row at their max
    val df = Seq((0L, "alpha beta alpha")).toDF("doc_id", "text")
    val out = SparseEmbedder.weightedExploded(df, "doc_id", "text",
      wq, bq, SparseLinearBank.Scale).collect()
    val byTok = out.groupBy(_.getLong(1))
    assert(byTok.values.forall(_.length == 1), "duplicate token ids must merge")
    // recompute the two occurrence weights by hand and check the max won
    val tidAlpha = {
      var acc = 0L
      "alpha".foreach(c => acc = (acc * 31 + c.toLong) % graft.functions.K.M)
      acc
    }
    def occ(pos: Long): Long = {
      val dot = (0 until SparseLinearBank.Dim).map(d =>
        SparseLinearBank.hiddenCell(tidAlpha, pos, d) * wq(d)).sum
      math.max(0L, dot + bq)
    }
    val expected = math.max(occ(0L), occ(2L)).toDouble / SparseLinearBank.Scale
    if (expected > 0.0)
      assert(out.find(_.getLong(1) == tidAlpha).map(_.getDouble(2)).contains(expected))
  }
}
