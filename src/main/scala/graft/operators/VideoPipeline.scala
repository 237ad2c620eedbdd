package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.K

/** Video as an opaque binary column with typed metadata. Real video
  * codecs are not in this container, so the CONTAINER FORMAT here is a
  * documented raw one — a fixed-size concatenation of raw RGB frames
  * (frameBytes each) — and the codec boundary is the single function
  * [[splitFrames]]; an FFmpeg/JCodec decoder would replace it without
  * touching the operator. Everything else is real Spark plumbing:
  * stride-based frame sampling, per-frame image embedding via the shared
  * pixel chain, and order-fixed mean pooling over sampled frames to one
  * unit clip vector. */
object VideoPipeline {

  /** Split a raw concatenated-frames blob; trailing partial frame
    * dropped. THE stub boundary (a real demuxer slots in here). */
  def splitFrames(bytes: Array[Byte], frameBytes: Int): Array[Array[Byte]] = {
    val n = if (bytes == null) 0 else bytes.length / frameBytes
    Array.tabulate(n)(i =>
      java.util.Arrays.copyOfRange(bytes, i * frameBytes, (i + 1) * frameBytes))
  }

  /** Keep every `stride`-th frame starting at 0 — the frame-sample step
    * (dense decode is wasteful; pipelines sample 1-4 fps). */
  def sampleFrames(frames: Array[Array[Byte]], stride: Int): Array[Array[Byte]] =
    Array.tabulate((frames.length + stride - 1) / stride)(i => frames(i * stride))

  /** Embed a video binary column: split → sample → per-frame pixel
    * embedding (raw codec + CLIP normalize + projection, identical to
    * the image path) → mean over frames in frame order → renormalize.
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
            if (sampled.isEmpty) None
            else {
              val acc = new Array[Double](dim)
              sampled.foreach { fb =>
                val (_, _, c, px) = ImagePipeline.decodeRaw(fb)
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
              Some((id, frames.length.toLong, sampled.length.toLong, acc))
            }
          }
        }
      }
      .toDF(idCol, "n_frames", "n_sampled", "embedding")
  }
}
