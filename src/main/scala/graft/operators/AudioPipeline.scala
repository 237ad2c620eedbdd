package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.K

/** Audio as an opaque binary column — the audio member of the multimodal
  * family. Unlike the image codecs, PCM WAV needs no external library:
  * [[decodeWav]] is a REAL RIFF/PCM16 parser (pure JVM), and
  * [[pcm16le]] is the headerless raw variant whose byte→sample mapping
  * the DuckDB oracle reproduces exactly (the audio analogue of
  * [[ImagePipeline.decodeRaw]]).
  *
  * Feature extraction is the classic frame pipeline: fixed-length frames
  * (hop = frameLen here: non-overlapping), per-frame energy Σs² and
  * zero-crossing count — exact integer math — then the engine's integer
  * hash projection to a unit embedding. Everything is narrow
  * (per-row), so the operator scales like the text path. */
object AudioPipeline {

  /** Raw little-endian PCM16: byte pair (lo, hi) → signed sample.
    * ((lo | hi<<8) + 32768) % 65536 - 32768 == toShort, mirrored
    * term-for-term in the oracle. Odd trailing byte ignored. */
  def pcm16le(bytes: Array[Byte]): Array[Int] = {
    val n = bytes.length / 2
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      val raw = (bytes(2 * i) & 0xff) | ((bytes(2 * i + 1) & 0xff) << 8)
      out(i) = ((raw + 32768) % 65536) - 32768
      i += 1
    }
    out
  }

  /** REAL RIFF/WAVE parser for PCM16: walks the chunk list, reads the
    * fmt chunk (audioFormat must be 1 = PCM, bits must be 16) and the
    * data chunk. Returns (sampleRate, channels, interleaved samples);
    * None for anything malformed. */
  def decodeWav(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (bytes == null || bytes.length < 44) return None
    def u32(o: Int): Long =
      (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
        ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    def u16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def tag(o: Int): String = new String(bytes, o, 4, "US-ASCII")
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var pos = 12
    var rate = -1
    var channels = -1
    var data: Array[Int] = null
    while (pos + 8 <= bytes.length) {
      val id = tag(pos)
      val len = u32(pos + 4).toInt
      val body = pos + 8
      // negative len (u32 high bit) would stall or reverse the chunk
      // walk — malformed, refuse. Subtraction form: `body + len` could
      // wrap negative for len near Int.MaxValue and dodge an addition-
      // form bound check
      if (len < 0 || len > bytes.length - body) return None
      id match {
        case "fmt " =>
          if (len < 16) return None
          val fmt = u16(body)
          val bits = u16(body + 14)
          if (fmt != 1 || bits != 16) return None
          channels = u16(body + 2)
          rate = u32(body + 4).toInt
        case "data" =>
          data = pcm16le(java.util.Arrays.copyOfRange(bytes, body, body + len))
        case _ => // skip unknown chunks (LIST, fact, ...)
      }
      pos = body + len + (len & 1) // chunks are word-aligned
    }
    if (rate <= 0 || channels <= 0 || data == null) None
    else Some((rate, channels, data))
  }

  /** Serialize PCM16 samples into a minimal RIFF/WAVE file (the inverse
    * of [[decodeWav]]; used by specs and real producers alike). */
  def toWav(samples: Array[Int], sampleRate: Int, channels: Int = 1): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2).putShort((channels * 2).toShort).putShort(16)
    out.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(s => out.putShort(s.toShort))
    out.array()
  }

  /** Per-frame exact-integer features over non-overlapping frames of
    * `frameLen` samples (trailing partial frame dropped):
    * energy = Σ s² and zero-crossings = #{i : sign(s_i) ≠ sign(s_i+1)},
    * zeros counted as positive. */
  def frameFeatures(samples: Array[Int], frameLen: Int): Array[(Long, Long)] = {
    val nFrames = samples.length / frameLen
    val out = new Array[(Long, Long)](nFrames)
    var f = 0
    while (f < nFrames) {
      var energy = 0L
      var zc = 0L
      var i = 0
      while (i < frameLen) {
        val s = samples(f * frameLen + i).toLong
        energy += s * s
        if (i > 0) {
          val prev = samples(f * frameLen + i - 1)
          if ((prev >= 0) != (s >= 0)) zc += 1
        }
        i += 1
      }
      out(f) = (energy, zc)
      f += 1
    }
    out
  }

  /** Embed a raw-PCM16 binary column: frames → energy features →
    * integer hash projection to a unit `dim`-vector (the projector/
    * mean-scale/normalize chain shared with text and image — and with
    * the q36 oracle). Rows with no complete frame are dropped. */
  def embedPcm(df: DataFrame, idCol: String, bytesCol: String,
               frameLen: Int = 16, dim: Int = K.Dim,
               batchSize: Int = 256): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { group =>
          group.flatMap { case (id, bytes) =>
            val feats = frameFeatures(pcm16le(bytes), frameLen)
            if (feats.isEmpty) None
            else {
              val qs = feats.map { case (energy, _) => energy % K.M }
              Some((id, feats.length.toLong, ImagePipeline.projectPixels(qs, dim)))
            }
          }
        }
      }
      .toDF(idCol, "n_frames", "embedding")
  }

  /** Embed real WAV files: decode → (mono-mix NOT applied; channel-
    * interleaved samples frame as-is, documented) → same feature chain. */
  def embedWav(df: DataFrame, idCol: String, bytesCol: String,
               frameLen: Int = 256, dim: Int = K.Dim,
               batchSize: Int = 256): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { group =>
          group.flatMap { case (id, bytes) =>
            decodeWav(bytes).flatMap { case (rate, channels, samples) =>
              val feats = frameFeatures(samples, frameLen)
              if (feats.isEmpty) None
              else {
                val qs = feats.map { case (energy, _) => energy % K.M }
                Some((id, rate, channels, feats.length.toLong,
                  ImagePipeline.projectPixels(qs, dim)))
              }
            }
          }
        }
      }
      .toDF(idCol, "sample_rate", "channels", "n_frames", "embedding")
  }
}
