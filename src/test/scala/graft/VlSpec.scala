package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{ImagePipeline, VlPreprocess}

/** P13/P14: smart resize (ties-to-even, β-shrink/grow) and the
  * merge-block patch-token layout of the Qwen3-VL image front
  * (/root/reference/src/models/qwen3.rs:193-336). */
class VlSpec extends AnyFunSuite with SparkSessionTestWrapper {

  test("ties-to-even: 10/4 rounds DOWN to 2 (not naive round-half-up)") {
    // Python round() semantics: 2.5 → 2, 1.5 → 2, 3.5 → 4
    assert(VlPreprocess.roundTiesToEven(2.5) == 2L)
    assert(VlPreprocess.roundTiesToEven(1.5) == 2L)
    assert(VlPreprocess.roundTiesToEven(3.5) == 4L)
    assert(VlPreprocess.roundTiesToEven(2.4) == 2L)
    assert(VlPreprocess.roundTiesToEven(2.6) == 3L)
    // h=10, factor 4: 10/4 = 2.5 → 2 → h_bar 8 (half-up would give 12)
    assert(VlPreprocess.smartResize(10, 10, 4, 1L, 1000000L) == ((8, 8)))
  }

  test("smart resize branches: round, shrink past max, grow under min") {
    // round branch: 8×8 at factor 4 is already snapped
    assert(VlPreprocess.smartResize(8, 8, 4, 1L, 1000000L) == ((8, 8)))
    // shrink: 96×96 = 9216 px > 1024 → β = 3, 96/3/4 = 8 → 32×32
    assert(VlPreprocess.smartResize(96, 96, 4, 256L, 1024L) == ((32, 32)))
    // grow: 4×4 = 16 px < 256 → β = 4, ceil(16/4)·4 = 16 → 16×16
    assert(VlPreprocess.smartResize(4, 4, 4, 256L, 1024L) == ((16, 16)))
  }

  test("smart resize guards mirror the reference's errors") {
    intercept[IllegalArgumentException] {
      VlPreprocess.smartResize(0, 8, 4, 1L, 1000L)
    }
    intercept[IllegalArgumentException] {
      VlPreprocess.smartResize(1000, 4, 4, 1L, 10000000L) // aspect 250 > 200
    }
  }

  test("Column smartResizeCols raises on out-of-contract dims like the JVM mirror") {
    def run(h: Int, w: Int): Unit =
      spark.range(1)
        .select(VlPreprocess.smartResizeCols(lit(h), lit(w), 4, 256L, 1024L).as("sr"))
        .select(col("sr.h_bar")).collect()
    val e1 = intercept[Exception] { run(0, 8) }
    assert(e1.getMessage.contains("greater than zero") ||
      Option(e1.getCause).exists(_.getMessage.contains("greater than zero")))
    val e2 = intercept[Exception] { run(1000, 4) } // aspect 250 > 200
    assert(e2.getMessage.contains("<= 200") ||
      Option(e2.getCause).exists(_.getMessage.contains("<= 200")))
  }

  test("Column smartResizeCols ≡ the JVM mirror over a dim sweep") {
    val dims = spark.range(1, 400)
      .select((col("id") % 97 + 1).as("h"), ((col("id") * 13) % 111 + 1).as("w"))
    val got = dims
      .withColumn("sr", VlPreprocess.smartResizeCols(col("h"), col("w"), 4, 256L, 1024L))
      .select(col("h"), col("w"), col("sr.h_bar"), col("sr.w_bar"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (eh, ew) = VlPreprocess.smartResize(
        r.getLong(0).toInt, r.getLong(1).toInt, 4, 256L, 1024L)
      assert((r.getLong(2), r.getLong(3)) == ((eh.toLong, ew.toLong)),
        s"h=${r.getLong(0)} w=${r.getLong(1)}")
    }
  }

  test("q69b config exercises all three branches on the fixture ids") {
    val hit = (0 until 500).map { id =>
      val h = id % 97 + 1; val w = (id * 7) % 103 + 1
      val hb0 = math.max(VlPreprocess.roundTiesToEven(h / 4.0) * 4, 4L)
      val wb0 = math.max(VlPreprocess.roundTiesToEven(w / 4.0) * 4, 4L)
      if (hb0 * wb0 > 1024L) "shrink" else if (hb0 * wb0 < 256L) "grow" else "round"
    }.toSet
    assert(hit == Set("shrink", "grow", "round"))
  }

  test("patch tokens: merge-block order maps back to source pixels") {
    import spark.implicits._
    val bytes = Array.tabulate(192)(i => ((i * 37 + 11) % 251).toByte)
    val png = ImagePipeline.pngFixture(bytes)
    val df = Seq((1L, png)).toDF("doc_id", "png")
    val rows = VlPreprocess.patchTokens(df, "doc_id", "png")
      .collect()
      .map(r => ((r.getLong(1), r.getLong(2)), r.getDouble(3)))
      .toMap
    assert(rows.size == 16 * 12) // 4×4 grid, 12 values per patch
    // reference loop (qwen3.rs:298-326) over the fixture's byte↔pixel map
    val mean = ImagePipeline.ClipMean; val std = ImagePipeline.ClipStd
    var tok = 0
    for (ghb <- 0 until 2; gwb <- 0 until 2; mh <- 0 until 2; mw <- 0 until 2) {
      val gh = ghb * 2 + mh; val gw = gwb * 2 + mw
      var idx = 0
      for (c <- 0 until 3; ph <- 0 until 2; pw <- 0 until 2) {
        val y = gh * 2 + ph; val x = gw * 2 + pw
        val px = bytes((3 * (y * 8 + x) + c) % bytes.length) & 0xff
        val v = px.toDouble * ImagePipeline.Rescale
        val expect = (v - mean(c)) / std(c)
        assert(rows((tok.toLong, idx.toLong)) == expect, s"tok $tok idx $idx")
        idx += 1
      }
      tok += 1
    }
  }

  test("windowed attention: a patch outside the window cannot influence it") {
    // 192 bytes map 1:1 onto the 8×8×3 fixture pixels (no wraparound).
    // Perturb only window 3's pixels (merge block ghb=1, gwb=1 → y,x ∈
    // 4..7): merged tokens 0..2 must be BIT-identical, token 3 must
    // change — attention is structurally confined to the window
    // (qwen3_vl.rs:288-300 iterates cu_seqlens chunks; no cross term).
    import spark.implicits._
    val a = Array.tabulate(192)(i => ((i * 37 + 11) % 251).toByte)
    val b = a.clone()
    for (y <- 4 until 8; x <- 4 until 8; c <- 0 until 3)
      b(3 * (y * 8 + x) + c) = ((a(3 * (y * 8 + x) + c) + 101) % 251).toByte
    def merged(bytes: Array[Byte]): Map[(Long, Long), Double] =
      graft.operators.VlPreprocess.windowedMergeTokens(
        Seq((1L, ImagePipeline.pngFixture(bytes))).toDF("doc_id", "png"), "doc_id", "png")
        .collect().map(r => ((r.getLong(1), r.getLong(2)), r.getDouble(3))).toMap
    val ma = merged(a)
    val mb = merged(b)
    for (tok <- 0L until 3L; d <- 0L until 16L)
      assert(ma((tok, d)) == mb((tok, d)), s"window $tok leaked (dim $d)")
    assert((0L until 16L).exists(d => ma((3L, d)) != mb((3L, d))),
      "perturbing window 3's pixels must change its own merged token")
  }

  test("PatchMerger is position-indexed: permuted values change the output") {
    // swap two same-channel pixels inside one patch: a mean-pool would
    // collapse them, the merger's j-indexed projection must not
    import spark.implicits._
    val a = Array.tabulate(192)(i => ((i * 37 + 11) % 251).toByte)
    val b = a.clone()
    val i0 = 3 * (0 * 8 + 0) + 0 // pixel (0,0) R — patch 0, pw=0
    val i1 = 3 * (0 * 8 + 1) + 0 // pixel (0,1) R — patch 0, pw=1
    b(i0) = a(i1); b(i1) = a(i0)
    assert(a.toSeq != b.toSeq)
    def merged(bytes: Array[Byte]) =
      graft.operators.VlPreprocess.windowedMergeTokens(
        Seq((1L, ImagePipeline.pngFixture(bytes))).toDF("doc_id", "png"), "doc_id", "png")
        .filter(col("tok") === 0).orderBy(col("dim"))
        .collect().map(_.getDouble(3)).toSeq
    assert(merged(a) != merged(b))
  }

  test("fusion: vision tokens splice over the pad span in position order") {
    import spark.implicits._
    val toks = Seq((7L, Array(10L, 20L, 999L, 999L, 999L, 30L)))
      .toDF("doc_id", "tids")
    val vis = Seq((7L, 0L, 0.5), (7L, 1L, 0.6), (7L, 2L, 0.7)).toDF("doc_id", "tok", "val")
    val got = graft.operators.VlPreprocess
      .fuseImageSpans(toks, "doc_id", "tids", vis, "tok", "val", 999L)
      .orderBy(col("pos"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double])))
    assert(got.length == 6)
    // image positions 2..4 take vision values 0.5, 0.6, 0.7 in order
    assert(got(2) == ((2L, 1L, Some(0.5))))
    assert(got(3) == ((3L, 1L, Some(0.6))))
    assert(got(4) == ((4L, 1L, Some(0.7))))
    // text positions keep deterministic text-cell values
    assert(got(0)._2 == 0L && got(0)._3.isDefined)
    assert(got(5)._2 == 0L && got(5)._3.isDefined)
  }

  test("fusion: a pad span longer than the vision supply surfaces as null") {
    // the reference errors on unconsumed/missing embeddings
    // (qwen3.rs:1416-1420); relationally the mismatch must be VISIBLE
    // (null), never silently dropped
    import spark.implicits._
    val toks = Seq((7L, Array(10L, 999L, 999L))).toDF("doc_id", "tids")
    val vis = Seq((7L, 0L, 0.5)).toDF("doc_id", "tok", "val") // only 1 of 2
    val got = graft.operators.VlPreprocess
      .fuseImageSpans(toks, "doc_id", "tids", vis, "tok", "val", 999L)
      .orderBy(col("pos")).collect()
    assert(got.length == 3)
    assert(!got(1).isNullAt(3) && got(1).getDouble(3) == 0.5)
    assert(got(2).isNullAt(3), "missing vision token must surface as null")
  }

  test("MRoPE position ids ≡ the reference loop (qwen3.rs:430-466)") {
    import spark.implicits._
    // direct port of build_image_position_ids for one row, grid (t,h,w)
    def reference(visibleLen: Int, start: Int, gridT: Int, llmH: Int, llmW: Int):
        Seq[(Long, Long, Long)] = {
      val out = Array.fill(visibleLen)((0L, 0L, 0L))
      for (pos <- 0 until start) out(pos) = (pos.toLong, pos.toLong, pos.toLong)
      var seqPos = start
      for (t <- 0 until gridT; h <- 0 until llmH; w <- 0 until llmW) {
        out(seqPos) = ((start + t).toLong, (start + h).toLong, (start + w).toLong)
        seqPos += 1
      }
      val end = start + gridT * llmH * llmW
      val prefixMax = math.max(start - 1, 0)
      val imageMax = start + math.max(gridT, math.max(llmH, llmW)) - 1
      val stIdx = math.max(prefixMax, imageMax) + 1
      for (off <- 0 until (visibleLen - end))
        out(end + off) = ((stIdx + off).toLong, (stIdx + off).toLong, (stIdx + off).toLong)
      out.toSeq
    }
    // several span starts (including 0) and tail lengths
    for ((start, len) <- Seq((0, 6), (1, 8), (3, 12), (5, 9))) {
      val df = spark.range(0, len)
        .select(col("id").as("pos"), lit(start.toLong).as("k"))
        .withColumn("pid", graft.operators.VlPreprocess.mropePositionIds(
          col("pos"), col("k"), 1, 2, 2))
        .orderBy(col("pos"))
        .select(col("pid.pid_t"), col("pid.pid_h"), col("pid.pid_w"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq
      assert(df == reference(len, start, 1, 2, 2), s"start=$start len=$len")
    }
  }

  test("pos-embed interpolation: exact at table points, bilinear between") {
    import graft.functions.K
    def table(idx: Long, d: Long): Double =
      ((idx * K.A3 + (4096L + d) * K.B3 + K.C3) % K.M3).toDouble / K.M3.toDouble * 2.0 - 1.0
    // grid 8×8 on a side-8 table: linspace step is exactly 1, so every
    // patch lands ON a table point — interpolation must return the cell
    val exact = spark.range(0, 64)
      .select((col("id") / 8).cast("long").as("gh"), (col("id") % 8).as("gw"))
      .withColumn("v", graft.operators.VlPreprocess.posEmbedInterp(
        col("gh"), col("gw"), lit(8L), lit(8L), 8, lit(0L)))
      .collect()
    exact.foreach { r =>
      val expect = table(r.getLong(0) * 8 + r.getLong(1), 0L)
      assert(r.getDouble(2) == expect, s"(${r.getLong(0)},${r.getLong(1)})")
    }
    // grid 2×2: patches at the table corners (linspace 0, 7)
    val corners = spark.range(0, 1)
      .select(graft.operators.VlPreprocess.posEmbedInterp(
        lit(1L), lit(1L), lit(2L), lit(2L), 8, lit(1L)).as("v"))
      .head().getDouble(0)
    assert(corners == table(7L * 8 + 7L, 1L))
    // grid 3×3 center: midpoint 3.5 between rows/cols 3 and 4 — the
    // even bilinear blend of the four corners
    val mid = spark.range(0, 1)
      .select(graft.operators.VlPreprocess.posEmbedInterp(
        lit(1L), lit(1L), lit(3L), lit(3L), 8, lit(0L)).as("v"))
      .head().getDouble(0)
    val blend = 0.25 * table(3 * 8 + 3, 0) + 0.25 * table(3 * 8 + 4, 0) +
      0.25 * table(4 * 8 + 3, 0) + 0.25 * table(4 * 8 + 4, 0)
    assert(math.abs(mid - blend) < 1e-12)
  }

  test("deepstack merger: same layout, different stream from the main merger") {
    import spark.implicits._
    val df = Seq((1L, ImagePipeline.pngFixture(
      Array.tabulate(192)(i => ((i * 37 + 11) % 251).toByte)))).toDF("doc_id", "png")
    def toMap(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => ((r.getLong(1), r.getLong(2)), r.getDouble(3))).toMap
    val vl = graft.operators.VlPreprocess
    val main = toMap(vl.windowedMergeTokens(df, "doc_id", "png"))
    val deep = toMap(vl.deepstackMergeTokens(df, "doc_id", "png"))
    // identical token/dim layout (4 merged tokens × 16 dims)...
    assert(main.keySet == deep.keySet && main.size == 64)
    // ...but each distinguishing knob matters INDEPENDENTLY: dropping
    // attention alone, or switching the projection slice alone, must
    // already change the stream (so a regression in either is caught)
    val rawSameSlice = toMap(vl.windowedMergeTokens(df, "doc_id", "png",
      attend = false, cellBase = 0L))
    val attendedDeepSlice = toMap(vl.windowedMergeTokens(df, "doc_id", "png",
      attend = true, cellBase = vl.DeepstackCellBase))
    assert(main != rawSameSlice, "attention must matter")
    assert(main != attendedDeepSlice, "the projection slice must matter")
    assert(deep != rawSameSlice && deep != attendedDeepSlice)
    (0L until 4L).foreach { tok =>
      def norm(m: Map[(Long, Long), Double]) =
        math.sqrt((0L until 16L).map(d => m((tok, d)) * m((tok, d))).sum)
      assert(math.abs(norm(main) - 1.0) < 1e-9)
      assert(math.abs(norm(deep) - 1.0) < 1e-9)
    }
    // the one-pass fused stream ≡ main + deep, bit for bit
    val fused = toMap(vl.mergedWithDeepstack(df, "doc_id", "png"))
    assert(fused.keySet == main.keySet)
    fused.foreach { case (k, v) => assert(v == main(k) + deep(k), s"$k") }
  }

  test("deepstack slice guard rejects an overlapping outDim") {
    import spark.implicits._
    val df = Seq((1L, ImagePipeline.pngFixture(Array[Byte](1, 2, 3)))).toDF("doc_id", "png")
    intercept[IllegalArgumentException] {
      // 48 vals × 256 dims = 12288 cells > 8192: the main slice would
      // bleed into the deepstack slice
      graft.operators.VlPreprocess.mergedWithDeepstack(df, "doc_id", "png", outDim = 256)
    }
  }

  test("patch plan is narrow: no exchange") {
    import spark.implicits._
    val df = Seq((1L, ImagePipeline.pngFixture(Array[Byte](1, 2, 3)))).toDF("doc_id", "png")
    val plan = VlPreprocess.patchTokens(df, "doc_id", "png")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }
}
