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
  * Two decode routes:
  *  - [[decodeImage]]: REAL decode via javax.imageio (PNG/BMP/GIF ship in
  *    the JDK; JPEG depends on the JRE build) → RGB HWC→CHW int pixels —
  *    the analogue of `DynamicImage::into_rgb8` + tensorize
  *    (/root/reference/src/image_embedding/utils.rs:33-41, 101-121).
  *  - [[decodeRaw]]: deterministic raw-byte tiling (a headerless "raw RGB"
  *    codec) used by the oracle-checked query, since the DuckDB oracle can
  *    reproduce it from the source bytes exactly.
  *
  * All preprocessing math is double-precision with a fixed operation
  * order, mirrored term-for-term in the DuckDB oracle
  * ([[graft.oracle.OracleSql.q23_image_embed]]).
  */
object ImagePipeline {

  /** CLIP preprocessing constants
    * (/root/reference/src/image_embedding/utils.rs:350-374 dialect), as
    * double literals shared with the oracle SQL. */
  val ClipMean: Array[Double] = Array(0.48145466, 0.4578275, 0.40821073)
  val ClipStd: Array[Double] = Array(0.26862954, 0.26130258, 0.27577711)
  /** Rescale factor 1/255 (utils.rs:123-133, default scale). */
  val Rescale: Double = 1.0 / 255.0

  /** Raw-byte "decode": tiles the byte stream into a side×side×3 CHW
    * integer pixel grid (values 0..255). Deterministic and exactly
    * reproducible in SQL from the source bytes — the checked stand-in for
    * a real codec. Empty input → all-zero pixels (one empty image must
    * not crash the task). */
  def decodeRaw(bytes: Array[Byte], side: Int = 8): (Int, Int, Int, Array[Int]) = {
    val n = side * side * 3
    val px = new Array[Int](n)
    if (bytes != null && bytes.nonEmpty) {
      var i = 0
      while (i < n) {
        px(i) = bytes(i % bytes.length) & 0xff
        i += 1
      }
    }
    (side, side, 3, px)
  }

  /** REAL image decode via javax.imageio: bytes → RGB → CHW int pixels
    * (P6 Image→RGB + P9 tensorize). Returns None for undecodable bytes.
    * Decodes through an explicit in-memory ImageInputStream: ImageIO's
    * default stream factory consults a process-wide DISK cache, whose
    * per-image temp-file churn dominated this loop ~6× — scoping the
    * stream here avoids both the cost and any global ImageIO toggle. */
  def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Int, Array[Int])] = {
    if (bytes == null || bytes.isEmpty) return None
    val img = javax.imageio.ImageIO.read(
      new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes)))
    if (img == null) return None
    val w = img.getWidth
    val h = img.getHeight
    val px = new Array[Int](3 * h * w)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y) // sRGB packed int
        val i = y * w + x
        px(i) = (rgb >> 16) & 0xff // R plane
        px(h * w + i) = (rgb >> 8) & 0xff // G plane
        px(2 * h * w + i) = rgb & 0xff // B plane
        x += 1
      }
      y += 1
    }
    Some((w, h, 3, px))
  }

  /** Compose chain P10+P11 on CHW int pixels, double math:
    * x = px * (1/255); out = (x - mean[c]) / std[c]
    * (/root/reference/src/image_embedding/utils.rs:123-167). */
  def rescaleNormalize(px: Array[Int], channels: Int,
                       mean: Array[Double] = ClipMean,
                       std: Array[Double] = ClipStd): Array[Double] = {
    val per = px.length / channels
    val out = new Array[Double](px.length)
    var c = 0
    while (c < channels) {
      var i = 0
      while (i < per) {
        val x = px(c * per + i).toDouble * Rescale
        out(c * per + i) = (x - mean(c)) / std(c)
        i += 1
      }
      c += 1
    }
    out
  }

  /** Integer quantization of a normalized pixel — keeps the projection in
    * the exact-integer domain: q = floor(v*1000 + 0.5) + 2000 (strictly
    * positive for any CLIP-normalized value). */
  @inline def quantize(v: Double): Long = math.floor(v * 1000.0 + 0.5).toLong + 2000L

  /** Hash-project quantized pixels to a unit `dim`-vector — same integer
    * projector + mean-scale + L2 chain as the text path ([[graft.functions.Kernel]]). */
  def projectPixels(qs: Array[Long], dim: Int): Array[Double] = {
    val n = qs.length
    val out = new Array[Double](dim)
    if (n == 0) return out
    var d = 0
    while (d < dim) {
      var s = 0L
      var i = 0
      while (i < n) {
        s += (qs(i) * K.A + d.toLong * K.B + K.C) % K.M
        i += 1
      }
      out(d) = (s.toDouble / n.toDouble / K.M.toDouble) * 2.0 - 1.0
      d += 1
    }
    var ss = 0.0
    var j = 0
    while (j < dim) { ss += out(j) * out(j); j += 1 }
    val nv = math.sqrt(ss) + K.Eps
    var kk = 0
    while (kk < dim) { out(kk) = out(kk) / nv; kk += 1 }
    out
  }

  /** Embed a binary column: decode → rescale+normalize → quantize →
    * hash-project to a unit `dim`-vector. Micro-batched mapPartitions like
    * the text backend; narrow (no shuffle); output
    * (idCol, width, height, channels, embedding).
    *
    * `real=true` routes through javax.imageio ([[decodeImage]]; rows whose
    * bytes don't decode are dropped, matching the reference's per-image
    * decode error surface); `real=false` uses the raw-byte codec. */
  def embedImages(df: DataFrame, idCol: String, bytesCol: String,
                  dim: Int = K.Dim, batchSize: Int = 256,
                  real: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { group =>
          group.flatMap { case (id, bytes) =>
            val decoded =
              if (real) decodeImage(bytes) else Some(decodeRaw(bytes))
            decoded.map { case (w, h, c, px) =>
              val norm = rescaleNormalize(px, c)
              val qs = new Array[Long](norm.length)
              var i = 0
              while (i < norm.length) { qs(i) = quantize(norm(i)); i += 1 }
              (id, w, h, c, projectPixels(qs, dim))
            }
          }
        }
      }
      .toDF(idCol, "width", "height", "channels", "embedding")
  }

  /** Real-codec embedding with a config-driven preprocessing chain
    * (S8/P6-P12): javax.imageio decode → [[Preprocess.Compose]]
    * (resize → center-crop → rescale → normalize per the
    * preprocessor_config.json dialect) → quantize → hash-project.
    * Undecodable rows are dropped. Narrow, micro-batched like every
    * inference path. */
  def embedImagesCompose(df: DataFrame, idCol: String, bytesCol: String,
                         compose: Preprocess.Compose,
                         dim: Int = K.Dim, batchSize: Int = 256): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { group =>
          group.flatMap { case (id, bytes) =>
            decodeImage(bytes).map { case (w, h, _, px) =>
              val (img, norm) = compose(Preprocess.Img(w, h, px))
              val qs = new Array[Long](norm.length)
              var i = 0
              while (i < norm.length) { qs(i) = quantize(norm(i)); i += 1 }
              (id, img.w, img.h, 3, projectPixels(qs, dim))
            }
          }
        }
      }
      .toDF(idCol, "width", "height", "channels", "embedding")
  }

  /** Deterministic PNG fixture: tile `bytes` into a side×side RGB image
    * (channel c of pixel (y,x) = bytes[(3·(y·side+x)+c) % n]) and encode
    * it as a real PNG via javax.imageio. PNG is lossless for 8-bit RGB,
    * so [[decodeImage]] recovers exactly these pixel values — which is
    * what lets the DuckDB oracle reproduce the decode→Compose chain from
    * the source bytes (q23b/q23c). Fixture-generation helper, not an
    * operator. */
  def pngFixture(bytes: Array[Byte], side: Int = 8): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      side, side, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val n = if (bytes == null) 0 else bytes.length
    var y = 0
    while (y < side) {
      var x = 0
      while (x < side) {
        val base = 3 * (y * side + x)
        def b(o: Int): Int = if (n == 0) 0 else bytes((base + o) % n) & 0xff
        img.setRGB(x, y, (b(0) << 16) | (b(1) << 8) | b(2))
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    // explicit in-memory output stream — same disk-cache avoidance as decodeImage
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
    javax.imageio.ImageIO.write(img, "png", ios)
    ios.close()
    out.toByteArray
  }

  /** Image-path ingest (S2,
    * /root/reference/src/image_embedding/impl.rs:155-186): directory of
    * image files → (path, bytes) via Spark's binaryFile source. Pushed
    * filters prune by path glob/size before bytes are read. */
  def readImages(spark: org.apache.spark.sql.SparkSession, path: String,
                 glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(path)
      .select(col("path"), col("content"))
}
