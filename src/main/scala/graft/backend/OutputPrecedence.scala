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

/** Cross-encoder scoring backend — the analogue of the reference's
  * reranker ONNX session whose single output is `logits` of shape
  * [batch, 1] (/root/reference/src/reranking/impl.rs:156-180). Input is
  * the pair encoding with segment ids folded in (token id + seg·(B2%M),
  * the same segment-offset stream as the ColBERT position offset); the
  * "logit" is the mean-scaled dim-0 projector value over the joint
  * sequence — deterministic, oracle-expressible, and shaped exactly like
  * a real cross-encoder head (one raw unnormalized score per pair). */
final case class HashingCrossEncoder(dim: Int = 1) extends RawBackend {
  import graft.functions.K

  private def logit(tids: Array[Long]): Double = {
    val n = tids.length
    if (n == 0) return 0.0
    var s = 0L
    var i = 0
    while (i < n) { s += (tids(i) * K.A + K.C) % K.M; i += 1 } // cell(t, d=0)
    (s.toDouble / n.toDouble / K.M.toDouble) * 2.0 - 1.0
  }

  def forwardBatch(batch: Seq[Array[Long]]): Seq[(String, Seq[Array[Array[Double]]])] =
    // single output ⇒ the OnlyOne precedence rule selects it
    Seq("logits" -> batch.map(tids => Array(Array(logit(tids)))))
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

  /** Pair variant — the reranker's backend route
    * (/root/reference/src/reranking/impl.rs:156-180): run the encoded
    * (query, document) pair sequences through a [[RawBackend]] forward,
    * select the output by the same precedence rules, and take element
    * [0] of each pair's first output row — the `logits[:, 0]` score
    * slice. Output: (qIdCol, index = original doc id, score). Narrow,
    * micro-batched like every inference path. */
  def scorePairs(df: DataFrame, qIdCol: String, dIdCol: String,
                 tidsCol: String, backend: RawBackend,
                 outputKey: Option[String] = None,
                 batchSize: Int = 256): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField(qIdCol, LongType, nullable = false),
      StructField("index", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false)))
    val qIdx = df.schema.fieldIndex(qIdCol)
    val dIdx = df.schema.fieldIndex(dIdCol)
    val tIdx = df.schema.fieldIndex(tidsCol)
    val rows = df.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { group =>
        val tids = group.map(r => r.getSeq[Long](tIdx).toArray)
        val outputs = backend.forwardBatch(tids)
        val key = OutputPrecedence.select(outputs.map(_._1), outputKey)
        val selected = outputs.find(_._1 == key).get._2
        group.zip(selected).map { case (r, m) =>
          Row(r.getLong(qIdx), r.getLong(dIdx), m(0)(0)) // logits[:, 0]
        }
      }
    }
    spark.createDataFrame(rows, outSchema)
  }
}
