package graft.backend

import graft.functions.K
import graft.model.Safetensors

/** The FULL learned decoder-layer checkpoint — every tensor of one
  * Qwen3 decoder layer plus the model-level final norm, exactly the
  * parameter set `Qwen3DecoderLayer::new` + `model.norm` pull from a
  * candle VarBuilder (/root/reference/src/models/qwen3.rs:852-869,
  * 897-931): the four attention projections, the three MLP
  * projections, and the three RMSNorm gain vectors, spread over a
  * THREE-SHARD checkpoint with mixed tensor kinds per shard — the
  * realistic sharded-model layout (real checkpoints interleave layer
  * tensors across shards).
  *
  * The attention and MLP tensors reuse the [[AttnBank]]/[[MlpBank]]
  * generating formulas — the q86/q87 banks ARE this layer's blocks
  * (spec-pinned equal), so the composed layer is built from the same
  * learned pieces gated individually. Norm gains are 1 + k/2048 with
  * k ∈ [−1024, 1024] (exact in F32; re-quantized to 2048 + k on
  * load), a distinct constant stream. */
object LayerBank {
  import K.{A3, C3}

  val Hidden: Int = AttnBank.Hidden
  val GainScale: Long = 2048L

  /** Gain numerator k at gain index i (g1 = 0..H−1, g2 = H..2H−1,
    * final = 2H..3H−1). */
  def gainK(i: Int): Long = (((i + 1).toLong * A3 + C3) % 2049L) - 1024L

  private def gainFloats(off: Int): Array[Float] =
    Array.tabulate(Hidden)(e => (1.0 + gainK(off + e).toDouble / 2048.0).toFloat)

  private def attnSlice(off: Int, len: Int): Array[Float] =
    Array.tabulate(len)(j => AttnBank.weightK(off + j).toFloat / AttnBank.Scale)

  private def mlpSlice(off: Int, len: Int): Array[Float] =
    Array.tabulate(len)(j => MlpBank.weightK(off + j).toFloat / MlpBank.Scale)

  /** Three shards, mixed tensor kinds. */
  def shardFiles: Map[String, Array[Byte]] = {
    import AttnBank.{QOut, KvOut, Hidden => H}
    import MlpBank.Inter
    val names = Safetensors.shardFileNames(3)
    Map(
      names(0) -> Safetensors.write(Seq(
        ("model.layers.0.self_attn.q_proj.weight", Seq(QOut, H), attnSlice(AttnBank.OffQ, QOut * H)),
        ("model.layers.0.self_attn.k_proj.weight", Seq(KvOut, H), attnSlice(AttnBank.OffK, KvOut * H)))),
      names(1) -> Safetensors.write(Seq(
        ("model.layers.0.self_attn.v_proj.weight", Seq(KvOut, H), attnSlice(AttnBank.OffV, KvOut * H)),
        ("model.layers.0.self_attn.o_proj.weight", Seq(H, QOut), attnSlice(AttnBank.OffO, H * QOut)),
        ("model.layers.0.input_layernorm.weight", Seq(H), gainFloats(0)),
        ("model.layers.0.post_attention_layernorm.weight", Seq(H), gainFloats(Hidden)),
        ("model.norm.weight", Seq(H), gainFloats(2 * Hidden)))),
      names(2) -> Safetensors.write(Seq(
        ("model.layers.0.mlp.gate_proj.weight", Seq(Inter, H), mlpSlice(MlpBank.OffGate, Inter * H)),
        ("model.layers.0.mlp.up_proj.weight", Seq(Inter, H), mlpSlice(MlpBank.OffUp, Inter * H)),
        ("model.layers.0.mlp.down_proj.weight", Seq(H, Inter), mlpSlice(MlpBank.OffDown, H * Inter)))))
  }

  /** The loaded layer: attention/MLP banks in their q86/q87 layouts,
    * gains as 2048 + k longs. */
  final case class Weights(
      attn: IndexedSeq[Long],
      mlp: IndexedSeq[Long],
      g1: IndexedSeq[Long],
      g2: IndexedSeq[Long],
      gFinal: IndexedSeq[Long]) extends Serializable

  def loaded: Weights = {
    val fs = shardFiles
    val order = Safetensors.resolveWeightFiles(fs.keySet)
    val sh = Safetensors.loadShards(order.map(fs))
    def quant(name: String, scale: Long): IndexedSeq[Long] =
      sh.tensorF32(name).map(f => math.floor(f.toDouble * scale + 0.5).toLong).toIndexedSeq
    val attn = Seq("q_proj", "k_proj", "v_proj", "o_proj")
      .flatMap(p => quant(s"model.layers.0.self_attn.$p.weight", AttnBank.Scale))
    val mlp = Seq("gate_proj", "up_proj", "down_proj")
      .flatMap(p => quant(s"model.layers.0.mlp.$p.weight", MlpBank.Scale))
    Weights(
      attn.toIndexedSeq,
      mlp.toIndexedSeq,
      quant("model.layers.0.input_layernorm.weight", GainScale),
      quant("model.layers.0.post_attention_layernorm.weight", GainScale),
      quant("model.norm.weight", GainScale))
  }
}
