package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.backend.MergerBank
import graft.model.Safetensors

/** The learned PatchMerger bank (the vision tower's projection MLP). */
class MergerBankSpec extends AnyFunSuite with SparkSessionTestWrapper {

  test("bank recovers its formula from model.safetensors") {
    assert(Safetensors.resolveWeightFiles(MergerBank.files.keySet) ==
      Seq("model.safetensors"))
    val wq = MergerBank.loadedQuantized
    assert(wq.length == MergerBank.OutDim * MergerBank.NVals)
    assert(wq == (0 until wq.length).map(MergerBank.weightK))
    assert(MergerBank.bank.exists(f => f != math.floor(f)))
  }

  test("the learned merger genuinely steers the tokens and stays unit-norm") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq((0L, graft.operators.ImagePipeline.pngFixture(
      "spark window merge table".getBytes("UTF-8")))).toDF("doc_id", "png")
    val hash = graft.operators.VlPreprocess
      .windowedMergeTokens(df, "doc_id", "png")
      .collect().map(r => (r.getLong(1), r.getLong(2)) -> r.getDouble(3)).toMap
    val learned = graft.operators.VlPreprocess
      .windowedMergeTokens(df, "doc_id", "png",
        mergerBank = Some(MergerBank.loadedQuantized))
      .collect().map(r => (r.getLong(1), r.getLong(2)) -> r.getDouble(3)).toMap
    assert(hash.keySet == learned.keySet, "same token/dim layout")
    assert(hash != learned, "bank must steer the projection")
    // per token: unit norm
    learned.groupBy(_._1._1).foreach { case (_, m) =>
      val norm = math.sqrt(m.values.map(v => v * v).sum)
      assert(math.abs(norm - 1.0) < 1e-9)
    }
  }

  test("deepstack merger: a DISTINCT learned matrix from the same checkpoint") {
    val main = MergerBank.loadedQuantized
    val deep = MergerBank.loadedDeepstackQuantized
    assert(deep.length == main.length)
    assert(deep != main, "deepstack_merger_list.0 is its own PatchMerger")
    assert(deep == (0 until deep.length).map(i => MergerBank.weightK(MergerBank.Total + i)))
  }

  test("mergedWithDeepstack with banks = learned main + learned deepstack, fused") {
    import spark.implicits._
    val df = Seq((0L, graft.operators.ImagePipeline.pngFixture(
      "spark window merge table".getBytes("UTF-8")))).toDF("doc_id", "png")
    val fusedLearned = graft.operators.VlPreprocess
      .mergedWithDeepstack(df, "doc_id", "png",
        mergerBank = Some(MergerBank.loadedQuantized),
        deepstackBank = Some(MergerBank.loadedDeepstackQuantized))
      .collect().map(r => (r.getLong(1), r.getLong(2)) -> r.getDouble(3)).toMap
    // the two-scan composition with the same banks must agree exactly
    val main = graft.operators.VlPreprocess
      .windowedMergeTokens(df, "doc_id", "png",
        mergerBank = Some(MergerBank.loadedQuantized))
      .collect().map(r => (r.getLong(1), r.getLong(2)) -> r.getDouble(3)).toMap
    val deep = graft.operators.VlPreprocess
      .windowedMergeTokens(df, "doc_id", "png", attend = false,
        cellBase = graft.operators.VlPreprocess.DeepstackCellBase,
        mergerBank = Some(MergerBank.loadedDeepstackQuantized))
      .collect().map(r => (r.getLong(1), r.getLong(2)) -> r.getDouble(3)).toMap
    assert(fusedLearned.keySet == main.keySet)
    fusedLearned.foreach { case (k, v) => assert(v == main(k) + deep(k)) }
    // both learned legs steer vs the hash formulation
    val fusedHash = graft.operators.VlPreprocess
      .mergedWithDeepstack(df, "doc_id", "png")
      .collect().map(r => (r.getLong(1), r.getLong(2)) -> r.getDouble(3)).toMap
    assert(fusedLearned != fusedHash)
  }

  test("a wrong-sized merger bank is rejected before any decode") {
    import spark.implicits._
    val df = Seq((0L, Array[Byte](1))).toDF("doc_id", "png")
    intercept[IllegalArgumentException] {
      graft.operators.VlPreprocess.windowedMergeTokens(df, "doc_id", "png",
        mergerBank = Some(IndexedSeq(1L, 2L)))
    }
  }
}
