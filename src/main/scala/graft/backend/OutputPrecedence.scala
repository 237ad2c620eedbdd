package graft.backend

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Output-key selection (A8) — the reference picks which named model
  * output to export by precedence
  * (/root/reference/src/output/output_precedence.rs:10-16,
  * src/output/embedding_output.rs:22-50):
  * OnlyOne (iff exactly one output) → by-name in precedence order →
  * by-position (first); per-model override first
  * (`sentence_embedding` for Gemma, src/models/text_embedding.rs:423). */
object OutputPrecedence {
  /** Default name precedence (output_precedence.rs:12-15). */
  val Default: Seq[String] = Seq("text_embeds", "last_hidden_state", "sentence_embedding")

  def select(available: Seq[String], overrideKey: Option[String] = None,
             precedence: Seq[String] = Default): String = {
    require(available.nonEmpty, "backend produced no outputs")
    overrideKey.filter(available.contains).getOrElse {
      if (available.length == 1) available.head // OnlyOne
      else precedence.find(available.contains).getOrElse(available.head)
    }
  }
}

/** Backend returning NAMED raw token-level outputs — the analogue of the
  * reference's `ort::Value` map keyed by output name
  * (/root/reference/src/output/embedding_output.rs:12-15). Each output:
  * per row, a [tokens × dim] matrix. Outputs are a Seq IN DECLARATION
  * ORDER — the by-position precedence fallback needs the model's output
  * order, which a Map would destroy. */
trait RawBackend extends Serializable {
  def dim: Int
  def forwardBatch(batch: Seq[Array[Long]]): Seq[(String, Seq[Array[Array[Double]]])]
}

/** Raw hashing backend: emits `last_hidden_state` (one projector vector
  * per token position, shifted by position like the ColBERT head) and
  * `text_embeds` (the pooled unit vector, identical to
  * [[HashingBackend]]). */
final case class HashingRawBackend(dim: Int = graft.functions.K.Dim) extends RawBackend {
  import graft.functions.K

  private def tokenVec(t: Long, pos: Int): Array[Double] = {
    val out = new Array[Double](dim)
    val tk = t + pos.toLong * (K.B2 % K.M)
    var d = 0
    while (d < dim) {
      out(d) = ((tk * K.A + d.toLong * K.B + K.C) % K.M).toDouble / K.M.toDouble * 2.0 - 1.0
      d += 1
    }
    out
  }

  def forwardBatch(batch: Seq[Array[Long]]): Seq[(String, Seq[Array[Array[Double]]])] = {
    val hidden = batch.map { tids =>
      Array.tabulate(tids.length)(p => tokenVec(tids(p), p))
    }
    val pooled = HashingBackend(dim).embedBatch(batch).map(v => Array(v))
    Seq("last_hidden_state" -> hidden, "text_embeds" -> pooled)
  }
}

/** The custom-transformer export hook
  * (/root/reference/src/output/embedding_output.rs:111-118,
  * `export_with_transformer`): run the backend, select one named output
  * by precedence, and hand the RAW per-row token-level matrix to a user
  * closure — so callers can implement their own pooling/quantization/
  * truncation instead of the built-in pool+normalize tail. */
object RawBackendEmbedder {
  def embedWith(df: DataFrame, idCol: String, tidsCol: String,
                backend: RawBackend,
                transform: Array[Array[Double]] => Array[Double],
                outputKey: Option[String] = None,
                batchSize: Int = 256): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("embedding", ArrayType(DoubleType, containsNull = false), nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    val tIdx = df.schema.fieldIndex(tidsCol)
    val rows = df.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { group =>
        val ids = group.map(_.getLong(idIdx))
        val tids = group.map(r => r.getSeq[Long](tIdx).toArray)
        val outputs = backend.forwardBatch(tids)
        // declaration order preserved → the by-position fallback really
        // is "first declared output", matching the reference
        val key = OutputPrecedence.select(outputs.map(_._1), outputKey)
        val selected = outputs.find(_._1 == key).get._2
        ids.zip(selected).map { case (id, m) => Row(id, transform(m).toSeq) }
      }
    }
    spark.createDataFrame(rows, outSchema)
  }
}
