package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.backend.ProjectionBank
import graft.model.Safetensors

/** The learned dense projection head and its single-file safetensors
  * consumption path (the non-sharded resolution branch). */
class ProjectionBankSpec extends AnyFunSuite with SparkSessionTestWrapper {

  test("bank is [out x in], fractional, and F32-lossless on its grid") {
    val b = ProjectionBank.bank
    assert(b.length == ProjectionBank.DimOut * ProjectionBank.DimIn)
    assert(b.exists(f => f != math.floor(f)))
    b.zipWithIndex.foreach { case (f, i) =>
      assert(math.floor(f.toDouble * ProjectionBank.Scale + 0.5).toLong ==
        ProjectionBank.weightK(i))
    }
  }

  test("single-file model.safetensors resolves ahead of any shard name") {
    assert(Safetensors.resolveWeightFiles(ProjectionBank.files.keySet) ==
      Seq("model.safetensors"))
    val wq = ProjectionBank.loadedQuantized
    assert(wq.toSeq ==
      (0 until ProjectionBank.DimOut * ProjectionBank.DimIn).map(ProjectionBank.weightK))
  }

  test("projection head output is unit-norm and matches a by-hand row") {
    import spark.implicits._
    val df = Seq((0L, "the customer scan")).toDF("doc_id", "text")
    val wq = ProjectionBank.loadedQuantized
    val out = graft.operators.TextEmbedder.embedProjectedTokens(
        df.withColumn("__t", graft.functions.Kernel.tokenIds(col("text"))),
        "__t", "emb", wq, ProjectionBank.DimIn, ProjectionBank.DimOut)
      .select(col("emb")).head().getSeq[Double](0)
    assert(out.length == ProjectionBank.DimOut)
    val norm = math.sqrt(out.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-9)
    // by-hand recompute of dim 0
    val tids = Seq("the", "customer", "scan").map { w =>
      var acc = 0L
      w.foreach(c => acc = (acc * 31 + c.toLong) % graft.functions.K.M)
      acc
    }
    val sums = (0 until ProjectionBank.DimIn).map(e =>
      tids.map(t => (t * graft.functions.K.A + e * graft.functions.K.B +
        graft.functions.K.C) % graft.functions.K.M).sum)
    val y = (0 until ProjectionBank.DimOut).map(d =>
      (0 until ProjectionBank.DimIn).map(e =>
        ProjectionBank.weightK(d * ProjectionBank.DimIn + e) * sums(e)).sum.toDouble)
    val nv = math.sqrt(y.map(v => v * v).sum)
    assert(out(0) == y(0) / (nv + graft.functions.K.Eps))
  }

  test("bank size mismatch is rejected") {
    import spark.implicits._
    val df = Seq((0L, "a")).toDF("doc_id", "text")
      .withColumn("__t", graft.functions.Kernel.tokenIds(col("text")))
    intercept[IllegalArgumentException] {
      graft.operators.TextEmbedder.embedProjectedTokens(df, "__t", "emb",
        Array(1L, 2L), ProjectionBank.DimIn, ProjectionBank.DimOut)
    }
  }
}
