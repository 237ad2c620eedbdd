package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.K

/** Video as an opaque binary column with typed metadata, mirroring the
  * reference's decode-from-bytes ingestion surface
  * (/root/reference/src/image_embedding/impl.rs:119-149 decodes images
  * straight from an in-memory byte buffer; video is the same idea one
  * container level up). Two container routes share one embedding chain:
  *
  *  - '''Raw concatenation''' ([[splitFrames]]): fixed-size raw RGB
  *    frames back to back — the oracle-reproducible baseline (q48).
  *  - '''RIFF/AVI''' ([[demuxAvi]]): a REAL chunk-walking AVI demuxer
  *    (pure JVM, same RIFF family as [[AudioPipeline.decodeWav]]) that
  *    reads the `avih` header and extracts every stream-0 frame chunk
  *    from the `movi` list — `00db` (uncompressed DIB, decoded by the
  *    raw tiler) and `00dc` (compressed, decoded from bytes via
  *    javax.imageio exactly like [[ImagePipeline.decodeImage]]; real
  *    MJPEG works because the JRE ships a JPEG codec, and the gate
  *    fixture uses lossless PNG payloads so the DuckDB oracle can
  *    reproduce the pixels). [[toAvi]] builds spec-shaped containers
  *    for fixtures and round-trip tests; q48b gates the demux route
  *    against q48's oracle bit-for-bit.
  *
  * Everything downstream is real Spark plumbing: stride-based frame
  * sampling, per-frame image embedding via the shared pixel chain, and
  * order-fixed mean pooling over sampled frames to one unit clip
  * vector. Narrow end to end — one task decodes its own rows, no
  * shuffle. */
object VideoPipeline {

  /** Split a raw concatenated-frames blob; trailing partial frame
    * dropped. The oracle-reproducible baseline codec boundary. */
  def splitFrames(bytes: Array[Byte], frameBytes: Int): Array[Array[Byte]] = {
    val n = if (bytes == null) 0 else bytes.length / frameBytes
    Array.tabulate(n)(i =>
      java.util.Arrays.copyOfRange(bytes, i * frameBytes, (i + 1) * frameBytes))
  }

  /** Keep every `stride`-th frame starting at 0 — the frame-sample step
    * (dense decode is wasteful; pipelines sample 1-4 fps). */
  def sampleFrames[T](frames: Array[T], stride: Int)(implicit ct: scala.reflect.ClassTag[T]): Array[T] =
    Array.tabulate((frames.length + stride - 1) / stride)(i => frames(i * stride))

  private def fourcc(s: String): Int = {
    require(s.length == 4)
    (s(0) & 0xff) | ((s(1) & 0xff) << 8) | ((s(2) & 0xff) << 16) | ((s(3) & 0xff) << 24)
  }

  /** Build a spec-shaped AVI (RIFF) container around per-frame payloads:
    * `RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf)) LIST('movi'
    * 00db/00dc...))`. `compressed=false` writes `00db` chunks (handler
    * `DIB `, biCompression 0 — payloads are raw tiles for
    * [[ImagePipeline.decodeRaw]]); `compressed=true` writes `00dc`
    * chunks (handler `MJPG` — payloads are whole encoded images for
    * [[ImagePipeline.decodeImage]]). Fixture-generation helper and the
    * inverse of [[demuxAvi]], not an operator. */
  def toAvi(frames: Array[Array[Byte]], width: Int, height: Int,
            compressed: Boolean): Array[Byte] = {
    val maxFrame = if (frames.isEmpty) 0 else frames.map(_.length).max
    def chunkLen(payload: Int): Int = 8 + payload + (payload & 1)
    val moviLen = 4 + frames.map(f => chunkLen(f.length)).sum
    val hdrlLen = 4 + chunkLen(56) + (8 + 4 + chunkLen(56) + chunkLen(40))
    val riffLen = 4 + chunkLen(hdrlLen) + chunkLen(moviLen)
    val buf = ByteBuffer.allocate(8 + riffLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(fourcc("RIFF")).putInt(riffLen).putInt(fourcc("AVI "))
    // LIST hdrl
    buf.putInt(fourcc("LIST")).putInt(hdrlLen).putInt(fourcc("hdrl"))
    buf.putInt(fourcc("avih")).putInt(56)
    buf.putInt(40000).putInt(0).putInt(0).putInt(0) // usec/frame, maxBps, pad, flags
    buf.putInt(frames.length).putInt(0).putInt(1).putInt(maxFrame)
    buf.putInt(width).putInt(height)
    buf.putInt(0).putInt(0).putInt(0).putInt(0) // reserved
    // LIST strl
    buf.putInt(fourcc("LIST")).putInt(4 + chunkLen(56) + chunkLen(40)).putInt(fourcc("strl"))
    buf.putInt(fourcc("strh")).putInt(56)
    buf.putInt(fourcc("vids")).putInt(fourcc(if (compressed) "MJPG" else "DIB "))
    buf.putInt(0).putShort(0).putShort(0).putInt(0) // flags, prio, lang, initFrames
    buf.putInt(1).putInt(25).putInt(0).putInt(frames.length) // scale, rate, start, length
    buf.putInt(maxFrame).putInt(-1).putInt(0) // bufSize, quality, sampleSize
    buf.putShort(0).putShort(0).putShort(width.toShort).putShort(height.toShort) // rcFrame
    buf.putInt(fourcc("strf")).putInt(40)
    buf.putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
    buf.putInt(if (compressed) fourcc("MJPG") else 0)
    buf.putInt(maxFrame).putInt(0).putInt(0).putInt(0).putInt(0)
    // LIST movi
    buf.putInt(fourcc("LIST")).putInt(moviLen).putInt(fourcc("movi"))
    frames.foreach { f =>
      buf.putInt(fourcc(if (compressed) "00dc" else "00db")).putInt(f.length).put(f)
      if ((f.length & 1) == 1) buf.put(0.toByte)
    }
    buf.array()
  }

  /** REAL RIFF/AVI demuxer: walks the chunk list (sizes little-endian,
    * chunks padded to even offsets), reads width/height/frame-count
    * from the `avih` header, and collects every stream-0 frame payload
    * from the `movi` list — `00db` → (payload, compressed=false),
    * `00dc` → (payload, compressed=true) — recursing into `rec `
    * interleave groups the way real muxers nest them. Tolerant of a
    * truncated trailing chunk (stops) and of a missing `idx1` index
    * (never needed — this is a full sequential scan). Returns
    * (width, height, frames) or None when the bytes are not an AVI. */
  def demuxAvi(bytes: Array[Byte]): Option[(Int, Int, Array[(Array[Byte], Boolean)])] = {
    if (bytes == null || bytes.length < 12) return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag(at: Int): String =
      if (at + 4 > bytes.length) ""
      else new String(bytes, at, 4, "US-ASCII")
    if (tag(0) != "RIFF" || tag(8) != "AVI ") return None
    var width = 0
    var height = 0
    val frames = scala.collection.mutable.ArrayBuffer.empty[(Array[Byte], Boolean)]
    def walk(from: Int, to: Int, inMovi: Boolean): Unit = {
      var pos = from
      while (pos + 8 <= to) {
        val id = tag(pos)
        val size = buf.getInt(pos + 4)
        if (size < 0) return
        // subtraction-form bound: `pos + 8 + size` overflows for sizes
        // near Int.MaxValue (same adversarial shape decodeWav guards)
        val truncated = size > to - pos - 8
        val end = if (truncated) to else pos + 8 + size
        if (id == "LIST" && size >= 4 && pos + 12 <= end) {
          // a truncated trailing LIST still yields its intact children
          val listType = tag(pos + 8)
          if (listType == "hdrl" || listType == "strl")
            walk(pos + 12, end, inMovi = false)
          else if (listType == "movi" || (inMovi && listType == "rec "))
            walk(pos + 12, end, inMovi = true)
        } else if (!truncated && id == "avih" && size >= 40) {
          width = buf.getInt(pos + 8 + 32)
          height = buf.getInt(pos + 8 + 36)
        } else if (!truncated && inMovi && (id == "00db" || id == "00dc")) {
          frames += ((java.util.Arrays.copyOfRange(bytes, pos + 8, end),
            id == "00dc"))
        }
        if (truncated) return // a cut leaf chunk is dropped, not served partial
        pos = end + (size & 1)
      }
    }
    // Long-form bound: the RIFF size field is u32 (legal up to 4 GB), so
    // `8 + getInt` overflows Int for declared sizes ≥ 2^31−8 and would
    // silently drop the whole file — read unsigned, clamp to the bytes
    walk(12, math.min(8L + (buf.getInt(4) & 0xffffffffL), bytes.length.toLong).toInt,
      inMovi = false)
    Some((width, height, frames.toArray))
  }

  /** Shared clip math: per-frame (channels, CHW pixels) → CLIP
    * rescale+normalize → quantize → projection, mean over frames in
    * order, renormalize to unit length. None when no frame decoded. */
  private def clipMeanOf(sampled: Array[(Int, Array[Int])], dim: Int): Option[Array[Double]] = {
    if (sampled.isEmpty) return None
    val acc = new Array[Double](dim)
    sampled.foreach { case (c, px) =>
      val norm = ImagePipeline.rescaleNormalize(px, c)
      val qs = norm.map(ImagePipeline.quantize)
      val e = ImagePipeline.projectPixels(qs, dim)
      var d = 0
      while (d < dim) { acc(d) += e(d); d += 1 }
    }
    var d = 0
    while (d < dim) { acc(d) /= sampled.length.toDouble; d += 1 }
    var ss = 0.0
    var j = 0
    while (j < dim) { ss += acc(j) * acc(j); j += 1 }
    val nv = math.sqrt(ss) + K.Eps
    var k = 0
    while (k < dim) { acc(k) /= nv; k += 1 }
    Some(acc)
  }

  /** Embed a raw-concatenation video column: split → sample → per-frame
    * pixel embedding (raw codec + CLIP normalize + projection, identical
    * to the image path) → mean over frames in frame order → renormalize.
    * Output (idCol, n_frames, n_sampled, embedding). Narrow. */
  def embedVideos(df: DataFrame, idCol: String, bytesCol: String,
                  frameBytes: Int = 192, stride: Int = 2, dim: Int = 16,
                  batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { group =>
          group.flatMap { case (id, bytes) =>
            val frames = splitFrames(bytes, frameBytes)
            val sampled = sampleFrames(frames, stride)
            clipMeanOf(sampled.map { fb =>
              val (_, _, c, px) = ImagePipeline.decodeRaw(fb)
              (c, px)
            }, dim).map(e => (id, frames.length.toLong, sampled.length.toLong, e))
          }
        }
      }
      .toDF(idCol, "n_frames", "n_sampled", "embedding")
  }

  /** Video-file ingest ([[ImagePipeline.readImages]]' moving-picture
    * twin): directory of container files → (path, bytes) via Spark's
    * binaryFile source, pushed path-glob/size filters pruning before
    * bytes are read. Feed the result to [[embedVideosAvi]]. */
  def readVideos(spark: org.apache.spark.sql.SparkSession, path: String,
                 glob: String = "*.avi"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(path)
      .select(col("path"), col("content"))

  /** Embed an AVI binary column: [[demuxAvi]] → stride sampling →
    * per-frame decode (`00db` raw tiles via [[ImagePipeline.decodeRaw]],
    * `00dc` compressed images via [[ImagePipeline.decodeImage]]) → the
    * same mean-pool chain as [[embedVideos]]. Rows that are not AVI and
    * `00dc` frames whose payload does not decode are dropped (one bad
    * row must not crash the task — same contract as the image path).
    * Output (idCol, n_frames, n_sampled, embedding). Narrow. */
  def embedVideosAvi(df: DataFrame, idCol: String, bytesCol: String,
                     stride: Int = 2, dim: Int = 16,
                     batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { group =>
          group.flatMap { case (id, bytes) =>
            demuxAvi(bytes).flatMap { case (_, _, frames) =>
              val sampled = sampleFrames(frames, stride)
              clipMeanOf(sampled.flatMap { case (payload, isCompressed) =>
                if (isCompressed)
                  ImagePipeline.decodeImage(payload).map { case (_, _, c, px) => (c, px) }
                else {
                  val (_, _, c, px) = ImagePipeline.decodeRaw(payload)
                  Some((c, px))
                }
              }, dim).map(e => (id, frames.length.toLong, sampled.length.toLong, e))
            }
          }
        }
      }
      .toDF(idCol, "n_frames", "n_sampled", "embedding")
  }
}
