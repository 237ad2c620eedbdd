package graft.operators

/** Image preprocessing chain — the Spark-side re-expression of the
  * reference's `Compose` pipeline and its `preprocessor_config.json`
  * dialects (/root/reference/src/image_embedding/utils.rs:29-167,
  * 169-377): ConvertToRGB → [Resize] → [CenterCrop] → tensorize →
  * [Rescale] → [Normalize].
  *
  * Pixels ride as CHW `Array[Int]` (0..255) until tensorize, then
  * doubles. Resize is Catmull-Rom (the reference's `FilterType::
  * CatmullRom`), separable horizontal-then-vertical with f32-style
  * accumulation, rounded+clamped back to u8 per pass like the Rust
  * `image` crate. Where the reference swaps width/height when building
  * `Resize` from an `(height, width)` config (harmless for the square
  * sizes every registry model uses), this implementation keeps the axes
  * straight and documents the divergence here. */
object Preprocess {

  /** Decoded RGB image: CHW int pixels (0..255), 3 channels. */
  final case class Img(w: Int, h: Int, px: Array[Int]) {
    require(px.length == 3 * w * h, s"CHW pixel count ${px.length} != 3*$w*$h")
    @inline def apply(c: Int, y: Int, x: Int): Int = px(c * h * w + y * w + x)
  }

  /** Catmull-Rom kernel (B=0, C=0.5 Mitchell family; support 2). */
  def catmullRom(xIn: Double): Double = {
    val x = math.abs(xIn)
    if (x < 1.0) 1.5 * x * x * x - 2.5 * x * x + 1.0
    else if (x < 2.0) -0.5 * x * x * x + 2.5 * x * x - 4.0 * x + 2.0
    else 0.0
  }

  /** One separable resampling pass along a row/column of length srcN →
    * dstN. `get(i)` reads source sample i; returns resampled doubles. */
  private def resample1d(srcN: Int, dstN: Int, get: Int => Double): Array[Double] = {
    val out = new Array[Double](dstN)
    val ratio = srcN.toDouble / dstN.toDouble
    val scale = math.max(ratio, 1.0)
    val support = 2.0 * scale
    var o = 0
    while (o < dstN) {
      val center = (o + 0.5) * ratio
      val lo = math.max(0, math.floor(center - support).toInt)
      val hi = math.min(srcN - 1, math.ceil(center + support).toInt)
      var sum = 0.0
      var wsum = 0.0
      var i = lo
      while (i <= hi) {
        val w = catmullRom((center - (i + 0.5)) / scale)
        sum += w * get(i)
        wsum += w
        i += 1
      }
      out(o) = if (wsum == 0.0) get(math.min(srcN - 1, math.max(0, center.toInt))) else sum / wsum
      o += 1
    }
    out
  }

  @inline private def clamp8(v: Double): Int =
    math.max(0, math.min(255, math.round(v).toInt))

  /** `resize_exact` analogue (utils.rs:43-54): stretch to exactly
    * (outW, outH), Catmull-Rom, per-channel, horizontal then vertical. */
  def resizeExact(img: Img, outW: Int, outH: Int): Img = {
    val out = new Array[Int](3 * outW * outH)
    var c = 0
    while (c < 3) {
      // horizontal pass: (h × w) → (h × outW), double precision held
      val horiz = new Array[Double](img.h * outW)
      var y = 0
      while (y < img.h) {
        val row = resample1d(img.w, outW, x => img(c, y, x).toDouble)
        System.arraycopy(row, 0, horiz, y * outW, outW)
        y += 1
      }
      // vertical pass: (h × outW) → (outH × outW), round+clamp to u8
      var x = 0
      while (x < outW) {
        val colOut = resample1d(img.h, outH, yy => horiz(yy * outW + x))
        var yo = 0
        while (yo < outH) {
          out(c * outH * outW + yo * outW + x) = clamp8(colOut(yo))
          yo += 1
        }
        x += 1
      }
      c += 1
    }
    Img(outW, outH, out)
  }

  /** CenterCrop analogue (utils.rs:56-99): crop to (cropW, cropH) around
    * the center; if the image is smaller on a dimension, the result is
    * zero-padded around the (possibly partially cropped) image. */
  def centerCrop(img: Img, cropW: Int, cropH: Int): Img = {
    if (img.w >= cropW && img.h >= cropH) {
      val x0 = (img.w - cropW) / 2
      val y0 = (img.h - cropH) / 2
      val out = new Array[Int](3 * cropW * cropH)
      var c = 0
      while (c < 3) {
        var y = 0
        while (y < cropH) {
          var x = 0
          while (x < cropW) {
            out(c * cropH * cropW + y * cropW + x) = img(c, y0 + y, x0 + x)
            x += 1
          }
          y += 1
        }
        c += 1
      }
      Img(cropW, cropH, out)
    } else {
      // crop the oversized dimension first (never both here), then pad
      val mid =
        if (img.w > cropW) centerCrop(img, cropW, img.h)
        else if (img.h > cropH) centerCrop(img, img.w, cropH)
        else img
      val out = new Array[Int](3 * cropW * cropH) // zero canvas
      val offX = (cropW - mid.w) / 2
      val offY = (cropH - mid.h) / 2
      var c = 0
      while (c < 3) {
        var y = 0
        while (y < mid.h) {
          var x = 0
          while (x < mid.w) {
            out(c * cropH * cropW + (y + offY) * cropW + (x + offX)) = mid(c, y, x)
            x += 1
          }
          y += 1
        }
        c += 1
      }
      Img(cropW, cropH, out)
    }
  }

  /** Pipeline steps after decode. Geometry steps run on int pixels;
    * tensorize to doubles happens implicitly before Rescale/Normalize. */
  sealed trait Step
  final case class Resize(w: Int, h: Int) extends Step
  final case class CenterCrop(w: Int, h: Int) extends Step
  final case class Rescale(factor: Double) extends Step
  final case class Normalize(mean: Array[Double], std: Array[Double]) extends Step

  /** The `Compose` chain: geometry on ints, then one fused scalar pass
    * (x*scale - mean[c]) / std[c] over CHW doubles. */
  final case class Compose(steps: Seq[Step]) extends Serializable {
    def apply(img0: Img): (Img, Array[Double]) = {
      var img = img0
      var scale = 1.0
      var mean: Array[Double] = Array(0.0, 0.0, 0.0)
      var std: Array[Double] = Array(1.0, 1.0, 1.0)
      steps.foreach {
        case Resize(w, h) => img = resizeExact(img, w, h)
        case CenterCrop(w, h) => img = centerCrop(img, w, h)
        case Rescale(f) => scale = f
        case Normalize(m, s) => mean = m; std = s
      }
      val per = img.w * img.h
      val out = new Array[Double](3 * per)
      var c = 0
      while (c < 3) {
        var i = 0
        while (i < per) {
          out(c * per + i) = (img.px(c * per + i).toDouble * scale - mean(c)) / std(c)
          i += 1
        }
        c += 1
      }
      (img, out)
    }
  }

  object Compose {
    import org.json4s._
    import org.json4s.jackson.JsonMethods

    private def sizePair(v: JValue): Option[(Int, Int)] = v match {
      case JObject(fields) =>
        val m = fields.toMap
        (m.get("shortest_edge"), m.get("height"), m.get("width")) match {
          case (Some(JInt(e)), _, _) => Some((e.toInt, e.toInt))
          case (_, Some(JInt(h)), Some(JInt(w))) => Some((w.toInt, h.toInt))
          case _ => None
        }
      case JInt(n) => Some((n.toInt, n.toInt))
      case _ => None
    }

    private def bool(v: JValue, default: Boolean): Boolean = v match {
      case JBool(b) => b
      case _ => default
    }

    private def doubles(v: JValue): Option[Array[Double]] = v match {
      case JArray(xs) =>
        val ds = xs.collect { case JInt(i) => i.toDouble; case JDouble(d) => d }
        if (ds.length == xs.length) Some(ds.toArray) else None
      case _ => None
    }

    /** `preprocessor_config.json` parser — the three dialects of
      * load_preprocessor (utils.rs:200-377): CLIPImageProcessor,
      * ConvNextFeatureExtractor, BitImageProcessor. */
    def fromJson(json: String): Compose = {
      val cfg = JsonMethods.parse(json)
      val steps = scala.collection.mutable.ArrayBuffer.empty[Step]
      val mode = cfg \ "image_processor_type" match {
        case JString(s) => s
        case _ => "CLIPImageProcessor"
      }
      mode match {
        case "CLIPImageProcessor" | "BitImageProcessor" =>
          if (bool(cfg \ "do_resize", default = false)) {
            val (w, h) = sizePair(cfg \ "size").getOrElse(
              throw new IllegalArgumentException(
                "size must contain shortest_edge or height+width"))
            steps += Resize(w, h)
          }
          if (bool(cfg \ "do_center_crop", default = false)) {
            val (w, h) = sizePair(cfg \ "crop_size").getOrElse(
              throw new IllegalArgumentException("invalid crop_size"))
            steps += CenterCrop(w, h)
          }
        case "ConvNextFeatureExtractor" =>
          val edge = cfg \ "size" \ "shortest_edge" match {
            case JInt(e) => e.toInt
            case _ => throw new IllegalArgumentException(
              "size dictionary must contain shortest_edge")
          }
          val cropPct = cfg \ "crop_pct" match {
            case JDouble(p) => p
            case _ => 0.875
          }
          if (edge < 384) {
            val r = (edge.toDouble / cropPct).toInt
            steps += Resize(r, r)
            steps += CenterCrop(edge, edge)
          } else {
            steps += Resize(edge, edge)
          }
        case other =>
          throw new IllegalArgumentException(s"Preprocessor $other is not supported")
      }
      if (bool(cfg \ "do_rescale", default = true)) {
        val f = cfg \ "rescale_factor" match {
          case JDouble(d) => d
          case _ => 1.0 / 255.0
        }
        steps += Rescale(f)
      }
      if (bool(cfg \ "do_normalize", default = false)) {
        val m = doubles(cfg \ "image_mean").getOrElse(
          throw new IllegalArgumentException("image_mean must be contained"))
        val s = doubles(cfg \ "image_std").getOrElse(
          throw new IllegalArgumentException("image_std must be contained"))
        steps += Normalize(m, s)
      }
      Compose(steps.toSeq)
    }

    /** CLIP ViT-B/32-style default chain (224 shortest edge, 224 crop,
      * 1/255 rescale, CLIP mean/std). */
    val clipDefault: Compose = Compose(Seq(
      Resize(224, 224), CenterCrop(224, 224), Rescale(1.0 / 255.0),
      Normalize(ImagePipeline.ClipMean, ImagePipeline.ClipStd)))
  }
}
