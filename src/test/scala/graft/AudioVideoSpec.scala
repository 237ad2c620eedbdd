package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{AudioPipeline, VideoPipeline}

/** Audio (real RIFF/PCM16 codec) and video (raw frame container)
  * multimodal plumbing. */
class AudioVideoSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  test("WAV round-trip: toWav → decodeWav recovers rate/channels/samples") {
    val samples = Array.tabulate(1000)(i => ((i * 37) % 4001) - 2000)
    val wav = AudioPipeline.toWav(samples, 16000, channels = 1)
    val Some((rate, ch, got)) = AudioPipeline.decodeWav(wav)
    assert(rate == 16000 && ch == 1)
    assert(got.toSeq == samples.toSeq)
    // negative samples survive the sign round-trip
    assert(got.min < 0)
    // malformed inputs refuse cleanly
    assert(AudioPipeline.decodeWav(Array[Byte](1, 2, 3)).isEmpty)
    assert(AudioPipeline.decodeWav("RIFFxxxxWAVE".getBytes ++ new Array[Byte](40)).isEmpty)
    // adversarial chunk length with the u32 high bit set (0xFFFFFFF8):
    // must return None, not loop forever or throw (regression)
    val evil = AudioPipeline.toWav(Array.fill(32)(5), 8000)
    val bb = java.nio.ByteBuffer.wrap(evil).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(12 + 4, 0xFFFFFFF8) // fmt chunk length field
    assert(AudioPipeline.decodeWav(evil).isEmpty)
    // positive chunk length near Int.MaxValue: `body + len` wraps
    // negative, so an addition-form bound check would pass and crash in
    // copyOfRange — the subtraction-form guard must return None
    val evil2 = AudioPipeline.toWav(Array.fill(32)(5), 8000)
    val bb2 = java.nio.ByteBuffer.wrap(evil2).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb2.putInt(12 + 4, Int.MaxValue - 4) // positive, but body + len < 0
    assert(AudioPipeline.decodeWav(evil2).isEmpty)
  }

  test("decodeWav skips unknown chunks (LIST before data)") {
    val samples = Array.tabulate(64)(i => i - 32)
    val base = AudioPipeline.toWav(samples, 8000)
    // splice a LIST chunk between fmt and data
    val fmtEnd = 12 + 8 + 16
    val list = "LIST".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
    val spliced = base.take(fmtEnd) ++ list ++ base.drop(fmtEnd)
    // fix RIFF size field (bytes 4-7, little-endian)
    val bb = java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, spliced.length - 8)
    val Some((rate, _, got)) = AudioPipeline.decodeWav(spliced)
    assert(rate == 8000 && got.toSeq == samples.toSeq)
  }

  test("frameFeatures: exact energy and zero-crossings") {
    val s = Array(3, -3, 3, -3, 0, 0, 1, 1)
    val feats = AudioPipeline.frameFeatures(s, 4)
    assert(feats.length == 2)
    assert(feats(0) == ((36L, 3L))) // 4×9 energy; alternating signs
    assert(feats(1) == ((2L, 0L))) // zeros count as positive → no crossings
  }

  test("embedWav over generated WAVs: unit vectors, determinism") {
    val rows = (0L until 4L).map { i =>
      val samples = Array.tabulate(2048)(j => (math.sin(j * 0.01 * (i + 1)) * 8000).toInt)
      (i, AudioPipeline.toWav(samples, 16000))
    }
    val df = rows.toDF("id", "wav")
    val out = AudioPipeline.embedWav(df, "id", "wav", frameLen = 256, dim = 16).collect()
    assert(out.length == 4)
    out.foreach { r =>
      assert(r.getInt(1) == 16000 && r.getInt(2) == 1 && r.getLong(3) == 8L)
      val v = r.getSeq[Double](4)
      assert(math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-9)
    }
    val again = AudioPipeline.embedWav(df, "id", "wav", frameLen = 256, dim = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](4)).toMap
    assert(out.map(r => r.getLong(0) -> r.getSeq[Double](4)).toMap == again)
  }

  test("AVI round-trip: toAvi → demuxAvi recovers dims and exact frame payloads") {
    val frames = Array.tabulate(5)(f => Array.tabulate(31 + f)(i => ((i * 7 + f) % 251).toByte))
    val avi = VideoPipeline.toAvi(frames, 8, 8, compressed = false)
    val Some((w, h, got)) = VideoPipeline.demuxAvi(avi)
    assert(w == 8 && h == 8 && got.length == 5)
    got.zip(frames).foreach { case ((payload, compressed), orig) =>
      assert(!compressed && payload.toSeq == orig.toSeq) // odd sizes pad outside the payload
    }
    // malformed inputs refuse cleanly
    assert(VideoPipeline.demuxAvi(Array[Byte](1, 2, 3)).isEmpty)
    assert(VideoPipeline.demuxAvi("RIFFxxxxWAVE".getBytes ++ new Array[Byte](40)).isEmpty)
    // truncation mid-frame: frames before the cut still demux
    val cut = java.util.Arrays.copyOf(avi, avi.length - 10)
    val Some((_, _, partial)) = VideoPipeline.demuxAvi(cut)
    assert(partial.length == 4)
    // adversarial chunk size with the u32 high bit set: stop, don't loop or throw
    val evil = VideoPipeline.toAvi(frames, 8, 8, compressed = false)
    val bb = java.nio.ByteBuffer.wrap(evil).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(16, 0xFFFFFFF8) // hdrl LIST size field
    VideoPipeline.demuxAvi(evil) // must terminate
    // adversarial RIFF size near u32 max: `8 + size` overflows Int — the
    // walk bound must clamp to the real byte length, not drop the file
    val big = VideoPipeline.toAvi(frames, 8, 8, compressed = false)
    java.nio.ByteBuffer.wrap(big).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(4, 0xFFFFFFF0) // declared RIFF size ≈ 4 GB
    val Some((bw, bh, bgot)) = VideoPipeline.demuxAvi(big)
    assert(bw == 8 && bh == 8 && bgot.length == 5)
  }

  test("AVI demux recurses into rec interleave groups") {
    val frames = Array.tabulate(3)(f => Array.fill(32)((f + 1).toByte))
    val base = VideoPipeline.toAvi(frames, 8, 8, compressed = false)
    // wrap the three 00db chunks (40 bytes each) in a LIST('rec ') group
    val moviPayloadAt = base.length - 3 * 40 // movi list data starts at 'movi' tag + frames
    val head = base.take(moviPayloadAt)
    val chunks = base.drop(moviPayloadAt)
    val rec = "LIST".getBytes("US-ASCII") ++ {
      val b = java.nio.ByteBuffer.allocate(4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putInt(4 + chunks.length); b.array()
    } ++ "rec ".getBytes("US-ASCII") ++ chunks
    val spliced = head ++ rec
    val bb = java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, spliced.length - 8) // RIFF size
    bb.putInt(moviPayloadAt - 8, 4 + rec.length) // movi LIST size field
    val Some((_, _, got)) = VideoPipeline.demuxAvi(spliced)
    assert(got.length == 3 && got(2)._1.toSeq == frames(2).toSeq)
  }

  test("AVI raw route ≡ raw-concatenation route (q48b's contract)") {
    val rows = (0L until 6L).map { i =>
      val bytes = Array.tabulate(32 * (i.toInt + 1) + 11)(j => ((j * 13 + i) % 251).toByte)
      (i, bytes)
    }
    val rawDf = rows.toDF("id", "vid")
    val aviDf = rows.map { case (i, b) =>
      (i, VideoPipeline.toAvi(VideoPipeline.splitFrames(b, 32), 8, 8, compressed = false))
    }.toDF("id", "avi")
    val raw = VideoPipeline.embedVideos(rawDf, "id", "vid", frameBytes = 32, stride = 2, dim = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getSeq[Double](3))).sortBy(_._1)
    val avi = VideoPipeline.embedVideosAvi(aviDf, "id", "avi", stride = 2, dim = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getSeq[Double](3))).sortBy(_._1)
    assert(raw.toSeq == avi.toSeq) // bit-for-bit, including n_frames/n_sampled
  }

  test("MJPEG route: real JPEG frames decode from bytes through the whole chain") {
    def jpegFrame(seed: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 8)
        img.setRGB(x, y, ((seed * 17 + y * 8 + x) % 256) * 0x010101)
      val out = new java.io.ByteArrayOutputStream()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
      javax.imageio.ImageIO.write(img, "jpg", ios)
      ios.close()
      out.toByteArray
    }
    val frames = Array.tabulate(4)(jpegFrame)
    val avi = VideoPipeline.toAvi(frames, 8, 8, compressed = true)
    val Some((_, _, got)) = VideoPipeline.demuxAvi(avi)
    assert(got.forall(_._2)) // 00dc chunks
    // each frame decodes from bytes via the shared javax.imageio path
    got.foreach { case (payload, _) =>
      val Some((w, h, c, px)) = graft.operators.ImagePipeline.decodeImage(payload)
      assert(w == 8 && h == 8 && c == 3 && px.length == 192)
    }
    val df = Seq((0L, avi), (1L, "not an avi".getBytes: Array[Byte])).toDF("id", "avi")
    val out = VideoPipeline.embedVideosAvi(df, "id", "avi", stride = 2, dim = 16).collect()
    assert(out.length == 1) // non-AVI row dropped, not crashed
    assert(out(0).getLong(1) == 4L && out(0).getLong(2) == 2L)
    val v = out(0).getSeq[Double](3)
    assert(math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-9)
  }

  test("AVI with lossless PNG frames: compressed route is pixel-exact") {
    val src = Array.tabulate(3)(f => Array.tabulate(32)(i => ((i * 5 + f * 3) % 251).toByte))
    val pngFrames = src.map(b => graft.operators.ImagePipeline.pngFixture(b))
    val avi = VideoPipeline.toAvi(pngFrames, 8, 8, compressed = true)
    val Some((_, _, got)) = VideoPipeline.demuxAvi(avi)
    got.zip(src).foreach { case ((payload, compressed), bytes) =>
      assert(compressed)
      val Some((_, _, _, px)) = graft.operators.ImagePipeline.decodeImage(payload)
      // pngFixture mapping: CHW pixel (c,y,x) = bytes[(3·(y·8+x)+c) % 32]
      for (c <- 0 until 3; y <- 0 until 8; x <- 0 until 8)
        assert(px(c * 64 + y * 8 + x) == (bytes((3 * (y * 8 + x) + c) % 32) & 0xff))
    }
  }

  test("video: frame split/sample shapes and clip embedding") {
    val frameBytes = 192
    val bytes = Array.tabulate(frameBytes * 7 + 50)(i => (i % 251).toByte)
    val frames = VideoPipeline.splitFrames(bytes, frameBytes)
    assert(frames.length == 7) // partial trailing frame dropped
    assert(VideoPipeline.sampleFrames(frames, 2).length == 4) // 0,2,4,6
    val df = Seq((0L, bytes), (1L, Array.emptyByteArray)).toDF("id", "vid")
    val out = VideoPipeline.embedVideos(df, "id", "vid", frameBytes, stride = 2, dim = 16)
      .collect()
    assert(out.length == 1) // empty video dropped
    assert(out(0).getLong(1) == 7L && out(0).getLong(2) == 4L)
    val v = out(0).getSeq[Double](3)
    assert(math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-9)
  }
}
