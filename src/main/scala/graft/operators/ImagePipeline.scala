package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.K

/** Multimodal column plumbing: images (audio/video alike) ride as opaque
  * `binary` columns with typed metadata, processed per-partition in
  * micro-batches — the Spark re-expression of the reference's image path
  * (/root/reference/src/image_embedding/impl.rs:119-269):
  * decode → Compose(resize → center-crop → rescale → normalize) → embed.
  *
  * The image codec libraries are not in this container, so `decodeStub`
  * is a clearly-marked deterministic fake (it derives a pixel grid from
  * the bytes). Everything around it — schema, micro-batch shape,
  * per-executor state, partition invariance — is real and tested, and a
  * javax.imageio decoder can replace the stub without touching the
  * operator.
  */
object ImagePipeline {

  /** Decoded-image schema (the `DynamicImage` analogue). */
  val decodedSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("pixels", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** STUB decode: a real implementation would call an image codec
    * (javax.imageio / a JNI codec). This deterministic fake tiles the
    * byte stream into an 8×8×3 CHW pixel grid in [0,1) so the downstream
    * preprocessing math is exercised for real. */
  def decodeStub(bytes: Array[Byte], side: Int = 8): (Int, Int, Int, Array[Float]) = {
    val n = side * side * 3
    val px = new Array[Float](n)
    var i = 0
    while (i < n) {
      val b = bytes(i % math.max(bytes.length, 1)) & 0xff
      px(i) = b.toFloat / 256.0f
      i += 1
    }
    (side, side, 3, px)
  }

  /** Compose chain (P10 rescale + P11 channel-normalize,
    * /root/reference/src/image_embedding/utils.rs:123-167): CHW pixels →
    * (x*scale - mean[c]) / std[c]. CLIP constants. */
  val clipMean: Array[Float] = Array(0.48145467f, 0.4578275f, 0.40821073f)
  val clipStd: Array[Float] = Array(0.26862955f, 0.2613026f, 0.2757771f)

  def normalizeChw(px: Array[Float], channels: Int): Array[Float] = {
    val per = px.length / channels
    val out = new Array[Float](px.length)
    var c = 0
    while (c < channels) {
      var i = 0
      while (i < per) {
        out(c * per + i) = (px(c * per + i) - clipMean(c)) / clipStd(c)
        i += 1
      }
      c += 1
    }
    out
  }

  /** Embed a binary column: decode → normalize → hash-project pixels to a
    * unit `dim`-vector. Micro-batched mapPartitions like the text
    * backend; output (idCol, width, height, channels, embedding). */
  def embedImages(df: DataFrame, idCol: String, bytesCol: String,
                  dim: Int = K.Dim, batchSize: Int = 256): DataFrame = {
    val spark = df.sparkSession
    val idIdx = df.schema.fieldIndex(idCol)
    val bIdx = df.schema.fieldIndex(bytesCol)
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("channels", IntegerType, nullable = false),
      StructField("embedding", ArrayType(DoubleType, containsNull = false), nullable = false)))
    val rows = df.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { group =>
        group.map { r =>
          val (w, h, c, px) = decodeStub(r.getAs[Array[Byte]](bIdx))
          val norm = normalizeChw(px, c)
          // integer-quantized pixel hash-projection (deterministic)
          val out = new Array[Double](dim)
          var d = 0
          while (d < dim) {
            var s = 0L
            var i = 0
            while (i < norm.length) {
              val q = math.round(norm(i) * 1000.0f).toLong + 2000L // positive
              s += (q * K.A + d.toLong * K.B + K.C) % K.M
              i += 1
            }
            out(d) = (s.toDouble / norm.length.toDouble / K.M.toDouble) * 2.0 - 1.0
            d += 1
          }
          var ss = 0.0; var j = 0
          while (j < dim) { ss += out(j) * out(j); j += 1 }
          val nv = math.sqrt(ss) + K.Eps
          var kk = 0
          while (kk < dim) { out(kk) = out(kk) / nv; kk += 1 }
          Row(r.getLong(idIdx), w, h, c, out.toSeq)
        }
      }
    }
    spark.createDataFrame(rows, outSchema)
  }
}
