package graft.model

import graft.functions.K
import graft.operators.Pooling

/** Quantization modes of the reference
  * (/root/reference/src/models/quantization.rs:1-8). `Dynamic` fits
  * activation ranges per batch, so the whole input must be one batch
  * (src/text_embedding/impl.rs:330-347) — in Spark terms: the operator
  * must run single-partition (`coalesce(1)`), an anti-parallel semantic
  * constraint we surface as a flag rather than silently violate. */
sealed trait Quantization
object Quantization {
  case object None extends Quantization
  case object Static extends Quantization
  case object Dynamic extends Quantization
}

/** Model descriptor — the analogue of the reference's `ModelInfo`
  * (/root/reference/src/models/model_info.rs:4-14): name, dim,
  * description, pooling default (src/text_embedding/impl.rs:158-218),
  * quantization, and truncation cap. */
final case class ModelInfo(
    name: String,
    dim: Int,
    description: String,
    pooling: Pooling,
    quantization: Quantization = Quantization.None,
    maxLength: Int = K.MaxLength)

/** Static in-memory registry, the analogue of the reference's
  * `OnceLock<HashMap<Model, ModelInfo>>`
  * (/root/reference/src/models/text_embedding.rs:6, 556-558). Names are
  * this engine's own (deterministic hashing-projector variants) — the
  * reference's ONNX checkpoints have no meaning in a zero-egress build,
  * but the registry surface (default model, lookup, list, user-defined
  * add — src/text_embedding/init.rs:88-138) is preserved. */
object ModelRegistry {
  val DefaultModel = "graft-hash-64-mean"

  private val builtin: Map[String, ModelInfo] = Seq(
    ModelInfo("graft-hash-64-mean", 64, "64-d hashing projector, mean pooling", Pooling.Mean),
    ModelInfo("graft-hash-64-cls", 64, "64-d hashing projector, CLS pooling", Pooling.Cls),
    ModelInfo("graft-hash-64-last", 64, "64-d hashing projector, last-token pooling", Pooling.Last),
    ModelInfo("graft-hash-128-mean", 128, "128-d hashing projector, mean pooling", Pooling.Mean),
    ModelInfo("graft-hash-384-mean", 384, "384-d hashing projector, mean pooling (BGE-small shape)", Pooling.Mean),
    ModelInfo("graft-hash-64-mean-dynq", 64, "64-d projector, dynamic quantization (single-batch rule)",
      Pooling.Mean, Quantization.Dynamic)
  ).map(m => m.name -> m).toMap

  @volatile private var userModels: Map[String, ModelInfo] = Map.empty

  /** "Bring your own model" (src/text_embedding/init.rs:88-138 analogue). */
  def register(info: ModelInfo): Unit = synchronized { userModels += (info.name -> info) }

  def get(name: String): Option[ModelInfo] = userModels.get(name).orElse(builtin.get(name))
  def apply(name: String): ModelInfo =
    get(name).getOrElse(throw new NoSuchElementException(s"unknown model: $name"))
  def listSupportedModels(): Seq[ModelInfo] =
    (builtin ++ userModels).values.toSeq.sortBy(_.name)
}
