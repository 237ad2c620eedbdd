package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** P13/P14: the Qwen3-VL image front — smart resize and patch
  * extraction (/root/reference/src/models/qwen3.rs:193-336) — as
  * deterministic, oracle-exact Spark operators.
  *
  *  - **Smart resize** (qwen3.rs:207-244): snap both dims to multiples
  *    of `factor` with Python-round (ties-to-even, qwen3.rs:193-205)
  *    semantics, then if the snapped area overflows `maxPixels` shrink
  *    both dims by β = √(area/max) (floor to factor), or if it
  *    underflows `minPixels` grow by β = √(min/area) (ceil to factor).
  *    Implemented BOTH as a plain-Scala mirror (for the image path) and
  *    as a pure Column expression tree (codegen'd, for relational use) —
  *    the two are spec-asserted identical, and the Column form is what
  *    the q69b gate checks against DuckDB.
  *  - **Patch extraction** (qwen3.rs:282-336): resize to the smart dims
  *    (Catmull-Rom, the Preprocess kernel), then emit patch tokens in
  *    the reference's merge-block order — blocks of merge×merge patches
  *    row-major, patches within a block row-major — each patch flattened
  *    (channel, temporal, py, px) with CLIP rescale+normalize values.
  *    A narrow typed flatMap: no shuffle, decode stays at the documented
  *    opaque boundary.
  */
object VlPreprocess {

  /** Python `round()` ties-to-even (qwen3.rs:193-205). */
  def roundTiesToEven(value: Double): Long = {
    val f = math.floor(value)
    val frac = value - f
    if (frac < 0.5) f.toLong
    else if (frac > 0.5) f.toLong + 1L
    else if (f.toLong % 2 == 0) f.toLong
    else f.toLong + 1L
  }

  /** smart_resize (qwen3.rs:207-244): (hBar, wBar), both multiples of
    * `factor`. Errors mirror the reference's. */
  def smartResize(height: Int, width: Int, factor: Int,
                  minPixels: Long, maxPixels: Long): (Int, Int) = {
    require(height > 0 && width > 0, "Image dimensions must be greater than zero")
    val aspect = math.max(height, width).toDouble / math.min(height, width).toDouble
    require(aspect <= 200.0, "Absolute aspect ratio must be <= 200")
    var hBar = math.max(roundTiesToEven(height.toDouble / factor.toDouble) * factor, factor.toLong)
    var wBar = math.max(roundTiesToEven(width.toDouble / factor.toDouble) * factor, factor.toLong)
    val area = (height.toLong * width.toLong).toDouble
    if (hBar * wBar > maxPixels) {
      val beta = math.sqrt(area / maxPixels.toDouble)
      hBar = math.max(math.floor(height.toDouble / beta / factor.toDouble).toLong * factor, factor.toLong)
      wBar = math.max(math.floor(width.toDouble / beta / factor.toDouble).toLong * factor, factor.toLong)
    } else if (hBar * wBar < minPixels) {
      val beta = math.sqrt(minPixels.toDouble / area)
      hBar = math.max(math.ceil(height.toDouble * beta / factor.toDouble).toLong * factor, factor.toLong)
      wBar = math.max(math.ceil(width.toDouble * beta / factor.toDouble).toLong * factor, factor.toLong)
    }
    (hBar.toInt, wBar.toInt)
  }

  /** Column form of [[roundTiesToEven]] — Spark `floor` on doubles
    * yields longs, matching the JVM mirror exactly. */
  private def rte(x: Column): Column = {
    val f = floor(x)
    val frac = x - f
    when(frac < lit(0.5), f)
      .when(frac > lit(0.5), f + lit(1L))
      .otherwise(when(f % lit(2L) === lit(0L), f).otherwise(f + lit(1L)))
  }

  /** Column form of [[smartResize]]: a struct(h_bar, w_bar) expression
    * over integer dim columns — pure codegen'd arithmetic, the identical
    * IEEE-754 tree the DuckDB oracle evaluates. The reference's
    * preconditions (positive dims, aspect ≤ 200, qwen3.rs:207-244) are
    * enforced per-row: an out-of-contract row raises instead of silently
    * yielding NaN dims through the divide inside sqrt. */
  def smartResizeCols(h: Column, w: Column, factor: Int,
                      minPixels: Long, maxPixels: Long): Column = {
    // mirror of the JVM mirror's two requires; raise_error is NullType,
    // cast to long so it can sit in the otherwise branch of a long field
    val aspectOk =
      greatest(h, w).cast("double") / least(h, w).cast("double") <= lit(200.0)
    def guarded(c: Column): Column =
      when(h <= lit(0) || w <= lit(0),
        raise_error(concat(lit("Image dimensions must be greater than zero: "),
          h.cast("string"), lit("x"), w.cast("string"))).cast("long"))
        .when(!aspectOk,
          raise_error(lit("Absolute aspect ratio must be <= 200")).cast("long"))
        .otherwise(c)
    val fL = lit(factor.toLong)
    val fD = lit(factor.toDouble)
    val hBar0 = greatest(rte(h.cast("double") / fD) * fL, fL)
    val wBar0 = greatest(rte(w.cast("double") / fD) * fL, fL)
    val area = (h.cast("long") * w.cast("long")).cast("double")
    val betaShrink = sqrt(area / lit(maxPixels.toDouble))
    val hShrink = greatest(floor(h.cast("double") / betaShrink / fD) * fL, fL)
    val wShrink = greatest(floor(w.cast("double") / betaShrink / fD) * fL, fL)
    val betaGrow = sqrt(lit(minPixels.toDouble) / area)
    val hGrow = greatest(ceil(h.cast("double") * betaGrow / fD) * fL, fL)
    val wGrow = greatest(ceil(w.cast("double") * betaGrow / fD) * fL, fL)
    val over = hBar0 * wBar0 > lit(maxPixels)
    val under = hBar0 * wBar0 < lit(minPixels)
    struct(
      guarded(when(over, hShrink).when(under, hGrow).otherwise(hBar0)).as("h_bar"),
      guarded(when(over, wShrink).when(under, wGrow).otherwise(wBar0)).as("w_bar"))
  }

  /** I6/I7 skeleton: windowed attention + PatchMerger over the patch
    * tokens — the Qwen3-VL vision tower's two structural contracts
    * (/root/reference/src/models/qwen3_vl.rs), deterministic and
    * oracle-exact:
    *
    *  - **Windowed attention** (qwen3_vl.rs:264-318 `VisionAttention` +
    *    :684-698 `build_cu_seqlens`): attention runs per `cu_seqlens`
    *    chunk — a patch attends ONLY within its window; there is no
    *    cross-window term at all (structural isolation, not a mask), and
    *    no causal mask inside a window (bidirectional). Here the windows
    *    are the merge blocks: [[patchTokens]] emits patches in
    *    merge-block order precisely so that one window = merge²
    *    CONSECUTIVE tokens.
    *  - **PatchMerger** (qwen3_vl.rs:365-420): consecutive
    *    spatial_merge_unit (= merge²) tokens concatenate into one
    *    merged hidden vector and project to the LLM width; a sequence
    *    not divisible by the unit is an error (qwen3_vl.rs:407-411).
    *    The projection here is the kernel's integer hash cell with a
    *    position-DEPENDENT index (j·outDim + d): unlike a pooled bag,
    *    permuting the concatenated values changes the output — the
    *    property a linear layer has and mean-pooling lacks.
    *
    * Attention scores and merger sums are exact integers (patch values
    * quantize via [[ImagePipeline.quantize]]); per-patch attended values
    * re-quantize after the single rational division — so the q71 gate
    * recomputes the whole tower relationally in DuckDB, bit-for-bit.
    * Output: (idCol, tok, dim, val) — one row per merged-token dim;
    * `tok` counts merge blocks in block order. */
  def windowedMergeTokens(df: DataFrame, idCol: String, bytesCol: String,
                          patchSize: Int = 2, mergeSize: Int = 2, outDim: Int = 16,
                          minPixels: Long = 1L, maxPixels: Long = 10000000L,
                          mean: Array[Double] = ImagePipeline.ClipMean,
                          std: Array[Double] = ImagePipeline.ClipStd,
                          attend: Boolean = true, cellBase: Long = 0L,
                          // Some(flat [outDim·nVals] integer bank) →
                          // LEARNED merger: out = l2norm(W·hq), the real
                          // PatchMerger MLP (graft.backend.MergerBank);
                          // None → position-indexed hash projection
                          mergerBank: Option[IndexedSeq[Long]] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val factor = patchSize * mergeSize
    val unit = mergeSize * mergeSize
    if (cellBase == DeepstackCellBase)
      require(unit.toLong * (3 * patchSize * patchSize) * outDim <= DeepstackCellBase,
        s"outDim $outDim overlaps the deepstack projection slice at base $DeepstackCellBase")
    mergerBank.foreach(w => require(w.length == outDim * unit * 3 * patchSize * patchSize,
      s"merger bank of ${w.length} != $outDim x ${unit * 3 * patchSize * patchSize}"))
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        ImagePipeline.decodeImage(bytes).toSeq.flatMap { case (w, h, _, px) =>
          val (hBar, wBar) = smartResize(h, w, factor, minPixels, maxPixels)
          val img0 = Preprocess.Img(w, h, px)
          val img = if (hBar == h && wBar == w) img0
                    else Preprocess.resizeExact(img0, wBar, hBar)
          val patchDim = 3 * patchSize * patchSize
          // quantized patch values in merge-block order (= window order)
          val qs = mergeOrderedPatchValues(img, patchSize, mergeSize, mean, std)
            .map(_.map(ImagePipeline.quantize))
          val nTok = qs.length
          // the merger's divisibility bail (qwen3_vl.rs:407-411)
          require(nTok % unit == 0,
            s"Sequence length $nTok is not divisible by spatial merge unit $unit")
          // per window: bidirectional attention among its unit patches,
          // then concat + position-indexed projection to outDim
          val rows = new scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Double)](
            (nTok / unit) * outDim)
          var wdx = 0
          while (wdx < nTok / unit) {
            val hq = if (attend) attendedWindow(qs, wdx * unit, unit, patchDim)
                     else rawWindow(qs, wdx * unit, unit, patchDim)
            val out = projectNormalized(hq, outDim, cellBase, mergerBank)
            var d = 0
            while (d < outDim) {
              rows += ((id, wdx.toLong, d.toLong, out(d)))
              d += 1
            }
            wdx += 1
          }
          rows
        }
      }
      .toDF(idCol, "tok", "dim", "val")
  }

  /** The deepstack merger cell-index base — a disjoint slice of the
    * projection index space, so deepstack features come from a DIFFERENT
    * "linear layer" than the main merger (distinct weights per merger,
    * qwen3_vl.rs deepstack_mergers). Disjointness is guarded at the
    * operator level: nVals·outDim must fit below this base. */
  val DeepstackCellBase = 8192L

  import graft.functions.K

  /** Attended, re-quantized window-local hidden values hq[j],
    * j = p·patchDim + i over the window's concatenated patches (the
    * vision block route). */
  private def attendedWindow(qs: Array[Array[Long]], base: Int,
                             unit: Int, patchDim: Int): Array[Long] = {
    val hq = new Array[Long](unit * patchDim)
    var p = 0
    while (p < unit) {
      var den = 0L
      val sRow = new Array[Long](unit)
      var q = 0
      while (q < unit) {
        var s = 0L
        var i = 0
        while (i < patchDim) { s += qs(base + p)(i) * qs(base + q)(i); i += 1 }
        sRow(q) = (s % K.M3) + 1L
        den += sRow(q)
        q += 1
      }
      var i = 0
      while (i < patchDim) {
        var num = 0L
        var q2 = 0
        while (q2 < unit) { num += sRow(q2) * qs(base + q2)(i); q2 += 1 }
        hq(p * patchDim + i) =
          math.floor((num.toDouble / den.toDouble) * 1000.0 + 0.5).toLong
        i += 1
      }
      p += 1
    }
    hq
  }

  /** The deepstack ("postshuffle norm") window values: the merger
    * consumes the window's RAW concatenated patch values — no attention
    * pass (qwen3_vl.rs:374-386, 716-722). */
  private def rawWindow(qs: Array[Array[Long]], base: Int,
                        unit: Int, patchDim: Int): Array[Long] = {
    val nVals = unit * patchDim
    val hq = new Array[Long](nVals)
    var j = 0
    while (j < nVals) { hq(j) = qs(base + j / patchDim)(j % patchDim); j += 1 }
    hq
  }

  /** Merger projection: position-indexed integer cells, exact sums,
    * mean-scaled into (−1, 1), l2-normalized. */
  private def projectNormalized(hq: Array[Long], outDim: Int, cellBase: Long,
                                mergerBank: Option[IndexedSeq[Long]] = None): Array[Double] = {
    val nVals = hq.length
    val out = new Array[Double](outDim)
    var d = 0
    while (d < outDim) {
      var sum = 0L
      var j = 0
      mergerBank match {
        case Some(w) =>
          // the learned MLP row: exact int64 dot; the 1/Scale is a
          // common factor the l2 normalize divides out
          while (j < nVals) { sum += w(d * nVals + j) * hq(j); j += 1 }
          out(d) = sum.toDouble
        case None =>
          while (j < nVals) {
            sum += (hq(j) * K.A + (cellBase + j.toLong * outDim + d) * K.B + K.C) % K.M
            j += 1
          }
          out(d) = (sum.toDouble / nVals.toDouble / K.M.toDouble) * 2.0 - 1.0
      }
      d += 1
    }
    var ss = 0.0
    var j = 0
    while (j < outDim) { ss += out(j) * out(j); j += 1 }
    val nv = math.sqrt(ss) + K.Eps
    var k = 0
    while (k < outDim) { out(k) = out(k) / nv; k += 1 }
    out
  }

  /** One-pass fused vision stream for deepstack injection: per merged
    * token, the main (attended) merger value PLUS the deepstack (raw)
    * merger value — both from the SAME decoded/quantized qs pass, so the
    * image decodes once and no join is needed (the two-scan
    * windowedMergeTokens ⋈ deepstackMergeTokens formulation doubles
    * decode CPU and adds an exchange; value-identity with it is
    * spec-pinned). Output (idCol, tok, dim, val). */
  def mergedWithDeepstack(df: DataFrame, idCol: String, bytesCol: String,
                          patchSize: Int = 2, mergeSize: Int = 2, outDim: Int = 16,
                          minPixels: Long = 1L, maxPixels: Long = 10000000L,
                          mean: Array[Double] = ImagePipeline.ClipMean,
                          std: Array[Double] = ImagePipeline.ClipStd,
                          // learned PatchMerger matrices: the main
                          // merger and the deepstack layer's OWN
                          // merger (`deepstack_merger_list.{i}`,
                          // qwen3_vl.rs:476-480) — each replaces its
                          // hash-projection slice
                          mergerBank: Option[IndexedSeq[Long]] = None,
                          deepstackBank: Option[IndexedSeq[Long]] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val factor = patchSize * mergeSize
    val unit = mergeSize * mergeSize
    Seq(mergerBank, deepstackBank).flatten.foreach(w =>
      require(w.length == outDim * unit * 3 * patchSize * patchSize,
        s"merger bank of ${w.length} != $outDim x ${unit * 3 * patchSize * patchSize}"))
    require(unit.toLong * (3 * patchSize * patchSize) * outDim <= DeepstackCellBase,
      s"outDim $outDim overlaps the deepstack projection slice at base $DeepstackCellBase")
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        ImagePipeline.decodeImage(bytes).toSeq.flatMap { case (w, h, _, px) =>
          val (hBar, wBar) = smartResize(h, w, factor, minPixels, maxPixels)
          val img0 = Preprocess.Img(w, h, px)
          val img = if (hBar == h && wBar == w) img0
                    else Preprocess.resizeExact(img0, wBar, hBar)
          val patchDim = 3 * patchSize * patchSize
          val qs = mergeOrderedPatchValues(img, patchSize, mergeSize, mean, std)
            .map(_.map(ImagePipeline.quantize))
          val nTok = qs.length
          require(nTok % unit == 0,
            s"Sequence length $nTok is not divisible by spatial merge unit $unit")
          val rows = new scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Double)](
            (nTok / unit) * outDim)
          var wdx = 0
          while (wdx < nTok / unit) {
            val main = projectNormalized(
              attendedWindow(qs, wdx * unit, unit, patchDim), outDim, 0L, mergerBank)
            val deep = projectNormalized(
              rawWindow(qs, wdx * unit, unit, patchDim), outDim, DeepstackCellBase, deepstackBank)
            var d = 0
            while (d < outDim) {
              rows += ((id, wdx.toLong, d.toLong, main(d) + deep(d)))
              d += 1
            }
            wdx += 1
          }
          rows
        }
      }
      .toDF(idCol, "tok", "dim", "val")
  }

  /** I6 deepstack feature merger (qwen3_vl.rs:374-386 postshuffle-norm
    * PatchMerger, collected at designated layers :716-722): same
    * merge-block grouping and projection as [[windowedMergeTokens]], but
    * over the window's RAW (pre-attention) patch values and through a
    * different projection slice — the per-layer feature stream that
    * ADDS onto the LLM hidden states at image positions
    * (qwen3.rs:1421-1448). */
  def deepstackMergeTokens(df: DataFrame, idCol: String, bytesCol: String,
                           patchSize: Int = 2, mergeSize: Int = 2, outDim: Int = 16,
                           minPixels: Long = 1L, maxPixels: Long = 10000000L,
                           mean: Array[Double] = ImagePipeline.ClipMean,
                           std: Array[Double] = ImagePipeline.ClipStd): DataFrame =
    windowedMergeTokens(df, idCol, bytesCol, patchSize, mergeSize, outDim,
      minPixels, maxPixels, mean, std, attend = false, cellBase = DeepstackCellBase)

  /** I7 (parity-sliceable part): multimodal fusion — splice vision
    * tokens into the image-pad spans of a text token sequence
    * (/root/reference/src/models/qwen3.rs:176-191 `find_token_spans`,
    * :1397-1418 `slice_assign` injection). The reference walks image-pad
    * runs per batch row, consuming vision embeddings in POSITION ORDER
    * from a running offset; here the same consumption order falls out of
    * a row_number over (doc, is-image) ordered by position, so multiple
    * spans per doc splice correctly too. Text positions keep their own
    * embedding value; image positions take the doc's next vision value —
    * a LEFT join, so an over-long span (more pad positions than vision
    * tokens, the reference's "Unconsumed image embeddings" error class)
    * surfaces as nulls rather than silently dropping.
    *
    * One shuffle by doc id (the fusion inherently co-locates a doc's
    * text and vision tokens); vision side is |docs|·nTok rows —
    * join-key-partitioned, never broadcast-dependent. Output:
    * (idCol, carryCols…, pos, is_image, val) — `carryCols` names
    * doc-level columns of `tokens` to thread through unchanged (the
    * q78 composition carries the span start for MRoPE). */
  def fuseImageSpans(tokens: DataFrame, idCol: String, tidsCol: String,
                     vision: DataFrame, vTokCol: String, vValCol: String,
                     imgTokenId: Long,
                     carryCols: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.{K, Kernel}
    val exploded = tokens
      .select((Seq(col(idCol)) ++ carryCols.map(col) ++
        Seq(posexplode(col(tidsCol)).as(Seq("pos", "__t")))): _*)
      .withColumn("is_image", (col("__t") === lit(imgTokenId)).cast("long"))
    val w = Window.partitionBy(col(idCol), col("is_image")).orderBy(col("pos"))
    val withIdx = exploded.withColumn("__img_idx", row_number().over(w) - 1)
    val textVal = Kernel.cell(col("__t"), lit(0)).cast("double") /
      lit(K.M.toDouble) * lit(2.0) - lit(1.0)
    val visionSel = vision.select(col(idCol).as("__vid"),
      col(vTokCol).cast("long").as("__vtok"), col(vValCol).as("__vval"))
    withIdx.join(visionSel,
        col(idCol) === col("__vid") &&
          col("is_image") === lit(1L) && col("__img_idx") === col("__vtok"),
        "left")
      .select((Seq(col(idCol)) ++ carryCols.map(col) ++ Seq(
        col("pos").cast("long").as("pos"), col("is_image"),
        when(col("is_image") === lit(1L), col("__vval")).otherwise(textVal).as("val"))): _*)
  }

  /** I7: 3-D MRoPE position ids
    * (/root/reference/src/models/qwen3.rs:366-467
    * `build_image_position_ids`) as a pure Column expression over
    * (position, span start) with a static LLM grid:
    *
    *  - before the image span, all three dims equal the position;
    *  - inside it, the j-th image token (j = pos − start) gets
    *    (start + t, start + h, start + w) from the nested
    *    t-outer/h/w-inner grid walk (qwen3.rs:439-449);
    *  - after it, ids resume from max(prefix max, image max) + 1
    *    (qwen3.rs:456-458) — so text after an image continues from the
    *    LARGEST id the image consumed in any dimension, not from the
    *    span's raw length.
    *
    * All integer arithmetic — the q73 gate is exact by construction. */
  def mropePositionIds(pos: Column, spanStart: Column,
                       gridT: Int, llmH: Int, llmW: Int): Column = {
    val imageLen = gridT * llmH * llmW
    val local = pos - spanStart
    val inPrefix = pos < spanStart
    val inImage = !inPrefix && pos < spanStart + lit(imageLen.toLong)
    // st_idx = max(start−1 (saturating), start + max(T,H,W) − 1) + 1
    val maxDim = math.max(gridT, math.max(llmH, llmW))
    val stIdx = greatest(greatest(spanStart - lit(1L), lit(0L)),
      spanStart + lit(maxDim.toLong - 1L)) + lit(1L)
    val tail = stIdx + (pos - (spanStart + lit(imageLen.toLong)))
    def dim(imageVal: Column): Column =
      when(inPrefix, pos).when(inImage, imageVal).otherwise(tail)
    // local ≥ 0 inside the image branch, so floor(a/b) ≡ integer division
    struct(
      dim(spanStart + floor(local / lit((llmH * llmW).toDouble))).as("pid_t"),
      dim(spanStart + floor(local / lit(llmW.toDouble)) % lit(llmH.toLong)).as("pid_h"),
      dim(spanStart + local % lit(llmW.toLong)).as("pid_w"))
  }

  /** I6: bilinear position-embedding interpolation
    * (/root/reference/src/models/qwen3_vl.rs:515-631
    * `linspace_points` + `fast_pos_embed_interpolate`) as a pure Column
    * expression: the patch at grid cell (gh, gw) of a gridH×gridW image
    * samples the side×side embedding table at linspace point
    * (gh·(side−1)/(gridH−1), ·), blending the four surrounding table
    * rows with bilinear weights (1−dh)(1−dw) … dh·dw in the reference's
    * corner order (00, 01, 10, 11). The table itself is the
    * deterministic M3-stream cell (index range 4096+) scaled into
    * (−1, 1) — a learned `Embedding` would slot in identically. All
    * doubles follow one fixed expression tree, mirrored in the q74
    * oracle. */
  def posEmbedInterp(gh: Column, gw: Column, gridH: Column, gridW: Column,
                     side: Int, d: Column): Column = {
    import graft.functions.K
    val maxV = lit((side - 1).toDouble)
    def pts(i: Column, steps: Column): Column =
      when(steps === lit(1L), lit(0.0))
        .otherwise(i.cast("double") * (maxV / (steps - lit(1L)).cast("double")))
    val hv = pts(gh, gridH)
    val wv = pts(gw, gridW)
    val hf = floor(hv)
    val hc = least(ceil(hv), lit((side - 1).toLong))
    val wf = floor(wv)
    val wc = least(ceil(wv), lit((side - 1).toLong))
    val dh = hv - hf.cast("double")
    val dw = wv - wf.cast("double")
    def p(idx: Column): Column =
      ((idx * lit(K.A3) + (lit(4096L) + d) * lit(K.B3) + lit(K.C3)) % lit(K.M3))
        .cast("double") / lit(K.M3.toDouble) * lit(2.0) - lit(1.0)
    val s = lit(side.toLong)
    (lit(1.0) - dh) * (lit(1.0) - dw) * p(hf * s + wf) +
      (lit(1.0) - dh) * dw * p(hf * s + wc) +
      dh * (lit(1.0) - dw) * p(hc * s + wf) +
      dh * dw * p(hc * s + wc)
  }

  /** Patch extraction (qwen3.rs:282-336): decode → smart resize →
    * flatten merge-ordered patch tokens. Output one row per patch value:
    * (idCol, tok, idx, val) where `tok` is the patch-token index in the
    * reference's merge-block order, `idx` the position inside the
    * flattened (channel, temporal, py, px) patch, and `val` the CLIP
    * rescaled+normalized pixel. Rows whose bytes don't decode are
    * dropped (the reference's per-image decode error surface). */
  def patchTokens(df: DataFrame, idCol: String, bytesCol: String,
                  patchSize: Int = 2, mergeSize: Int = 2, temporalPatch: Int = 1,
                  minPixels: Long = 1L, maxPixels: Long = 10000000L,
                  mean: Array[Double] = ImagePipeline.ClipMean,
                  std: Array[Double] = ImagePipeline.ClipStd): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val factor = patchSize * mergeSize
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        ImagePipeline.decodeImage(bytes).toSeq.flatMap { case (w, h, _, px) =>
          val (hBar, wBar) = smartResize(h, w, factor, minPixels, maxPixels)
          val img0 = Preprocess.Img(w, h, px)
          val img = if (hBar == h && wBar == w) img0
                    else Preprocess.resizeExact(img0, wBar, hBar)
          // hBar/wBar are factor multiples, so grid divides by merge
          val vals = mergeOrderedPatchValues(img, patchSize, mergeSize, mean, std)
          val pp = patchSize * patchSize
          val rows = new scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Double)](
            vals.length * 3 * temporalPatch * pp)
          var tok = 0
          while (tok < vals.length) {
            // idx walks (channel, temporal, py, px); the temporal axis
            // repeats the spatial values (grid_t = 1 source)
            var c = 0
            while (c < 3) {
              var tp = 0
              while (tp < temporalPatch) {
                var k = 0
                while (k < pp) {
                  rows += ((id, tok.toLong,
                    ((c * temporalPatch + tp) * pp + k).toLong, vals(tok)(c * pp + k)))
                  k += 1
                }
                tp += 1
              }
              c += 1
            }
            tok += 1
          }
          rows
        }
      }
      .toDF(idCol, "tok", "idx", "val")
  }

  /** Normalized CLIP values of every patch of `img`, in the reference's
    * merge-block token order (qwen3_vl patch layout): result(tok)(i)
    * with i over (channel, py, px). The intricate merge-order index walk
    * lives HERE once — [[patchTokens]] expands the temporal axis over
    * it, [[windowedMergeTokens]] quantizes it. */
  private def mergeOrderedPatchValues(img: Preprocess.Img, patchSize: Int, mergeSize: Int,
                                      mean: Array[Double], std: Array[Double]): Array[Array[Double]] = {
    val gridH = img.h / patchSize
    val gridW = img.w / patchSize
    val patchDim = 3 * patchSize * patchSize
    val out = Array.ofDim[Double](gridH * gridW, patchDim)
    var tok = 0
    var ghb = 0
    while (ghb < gridH / mergeSize) {
      var gwb = 0
      while (gwb < gridW / mergeSize) {
        var mh = 0
        while (mh < mergeSize) {
          var mw = 0
          while (mw < mergeSize) {
            val gh = ghb * mergeSize + mh
            val gw = gwb * mergeSize + mw
            var i = 0
            var c = 0
            while (c < 3) {
              var ph = 0
              while (ph < patchSize) {
                var pw = 0
                while (pw < patchSize) {
                  val v = img(c, gh * patchSize + ph, gw * patchSize + pw).toDouble *
                    ImagePipeline.Rescale
                  out(tok)(i) = (v - mean(c)) / std(c)
                  i += 1
                  pw += 1
                }
                ph += 1
              }
              c += 1
            }
            tok += 1
            mw += 1
          }
          mh += 1
        }
        gwb += 1
      }
      ghb += 1
    }
    out
  }
}
