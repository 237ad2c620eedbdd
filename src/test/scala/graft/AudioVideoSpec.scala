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
