package graft.backend

import graft.functions.K
import graft.model.Safetensors

/** Learned PatchMerger projection for the vision tower — the MLP that
  * maps each merge window's concatenated patch values to the LLM width
  * (/root/reference/src/models/qwen3_vl.rs PatchMerger: hidden =
  * merge²·vision_dim → out_dim through learned linear layers). A real
  * F32 [outDim × nVals] matrix in a single-file checkpoint; k/1024
  * fixed-point entries, re-quantized losslessly, applied in exact
  * int64 with the l2 normalize dividing the common scales out (the
  * [[ProjectionBank]] scheme at the vision tower's merger site). */
object MergerBank {
  import K.{B3, C3}

  /** nVals = mergeSize² · 3·patchSize² (4 · 12 with the gate config). */
  val NVals: Int = 48
  val OutDim: Int = 16
  val Scale: Long = 1024L

  /** Integer numerator at flat index i = d·NVals + j. */
  def weightK(i: Int): Long = (((i + 1).toLong * B3 + C3) % 4001L) - 2000L

  def bank: Array[Float] =
    Array.tabulate(OutDim * NVals)(i => weightK(i).toFloat / Scale)

  def files: Map[String, Array[Byte]] = Map(
    "model.safetensors" -> Safetensors.write(Seq(
      ("merger.mlp.weight", Seq(OutDim, NVals), bank))))

  def loadedQuantized: IndexedSeq[Long] = {
    val fs = files
    val order = Safetensors.resolveWeightFiles(fs.keySet)
    val sharded = Safetensors.loadShards(order.map(fs))
    sharded.tensorF32("merger.mlp.weight")
      .map(f => math.floor(f.toDouble * Scale + 0.5).toLong).toIndexedSeq
  }
}
