package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model.Safetensors

/** S9: offline safetensors container round-trip, little-endian layout,
  * validation errors, and the reference's consumption shapes. */
class SafetensorsSpec extends AnyFunSuite {

  private val fixture = Safetensors.write(
    Seq(
      ("weight", Seq(2, 3), Array(1.0f, -2.5f, 3.25f, 0.0f, 1e-7f, -1e7f)),
      ("bias", Seq(1), Array(0.5f))),
    metadata = Map("format" -> "pt"))

  test("write → parse round-trips names, dtypes, shapes, offsets, metadata") {
    val h = Safetensors.parseHeader(fixture)
    assert(h.tensors.keySet == Set("weight", "bias"))
    val w = h.tensor("weight")
    assert(w.dtype == "F32" && w.shape == Seq(2, 3) && w.begin == 0L && w.end == 24L)
    val b = h.tensor("bias")
    assert(b.begin == 24L && b.end == 28L)
    assert(h.metadata == Map("format" -> "pt"))
  }

  test("F32 data round-trips bit-exactly through little-endian bytes") {
    val h = Safetensors.parseHeader(fixture)
    val w = Safetensors.tensorF32(fixture, h, "weight")
    assert(w.toSeq == Seq(1.0f, -2.5f, 3.25f, 0.0f, 1e-7f, -1e7f))
    assert(Safetensors.tensorF32(fixture, h, "bias").toSeq == Seq(0.5f))
  }

  test("byte layout: u64 LE header length, then JSON, then LE f32 data") {
    val headerLen = java.nio.ByteBuffer.wrap(fixture, 0, 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
    val json = new String(fixture, 8, headerLen.toInt, "UTF-8")
    assert(json.startsWith("{") && json.contains("\"data_offsets\":[0,24]"))
    // first data float is 1.0f = 0x3F800000 → LE bytes 00 00 80 3F
    val d0 = (8 + headerLen).toInt
    assert((fixture(d0) & 0xff, fixture(d0 + 1) & 0xff,
      fixture(d0 + 2) & 0xff, fixture(d0 + 3) & 0xff) == ((0x00, 0x00, 0x80, 0x3f)))
  }

  test("malformed inputs fail at parse, not at first read") {
    intercept[IllegalArgumentException] {
      Safetensors.parseHeader(Array[Byte](1, 2, 3)) // truncated
    }
    intercept[IllegalArgumentException] {
      Safetensors.parseHeader(fixture.take(20)) // header longer than file
    }
    // offsets past the data region
    val bad = Safetensors.write(Seq(("w", Seq(2), Array(1f, 2f))))
    val clipped = bad.take(bad.length - 4)
    intercept[IllegalArgumentException] { Safetensors.parseHeader(clipped) }
  }

  test("missing tensor errors by name (bgem3_weights.rs expect shape)") {
    val h = Safetensors.parseHeader(fixture)
    val e = intercept[NoSuchElementException] {
      Safetensors.tensorF32(fixture, h, "nope")
    }
    assert(e.getMessage.contains("nope"))
  }

  private def fileOf(json: String, data: Array[Byte]): Array[Byte] = {
    val j = json.getBytes("UTF-8")
    val bb = java.nio.ByteBuffer.allocate(8 + j.length + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putLong(j.length.toLong); bb.put(j); bb.put(data); bb.array()
  }

  test("duplicate tensor names are rejected at parse") {
    val dup = fileOf(
      """{"w":{"dtype":"F32","shape":[1],"data_offsets":[0,4]},""" +
        """"w":{"dtype":"F32","shape":[1],"data_offsets":[4,8]}}""",
      new Array[Byte](8))
    val e = intercept[IllegalArgumentException] { Safetensors.parseHeader(dup) }
    assert(e.getMessage.contains("duplicate"))
  }

  test("overlapping tensor data ranges are rejected at parse") {
    val ovl = fileOf(
      """{"a":{"dtype":"F32","shape":[2],"data_offsets":[0,8]},""" +
        """"b":{"dtype":"F32","shape":[2],"data_offsets":[4,12]}}""",
      new Array[Byte](12))
    val e = intercept[IllegalArgumentException] { Safetensors.parseHeader(ovl) }
    assert(e.getMessage.contains("overlapping"))
  }

  test("sharded-checkpoint probe names (qwen3.rs:1040)") {
    assert(Safetensors.shardFileNames(3) == Seq(
      "model-00001-of-00003.safetensors",
      "model-00002-of-00003.safetensors",
      "model-00003-of-00003.safetensors"))
  }

  test("loadSparseLinear returns (flat weight, scalar bias)") {
    val (w, b) = Safetensors.loadSparseLinear(fixture)
    assert(w.length == 6 && b == 0.5f)
  }
}
