package graft.pipeline

/** Pure-Scala image kernels for the segmentation pipeline (SURVEY.md §7.6): Canny
  * (gaussian → sobel → non-max suppression → hysteresis), binary morphology with an
  * elliptical structuring element (dilate/erode → CLOSE), and windowed median blur.
  *
  * OpenCV itself is unavailable offline, so these re-implement the *operations* from
  * scratch (cv.Canny / cv.morphologyEx at /root/reference/image_segmentation/
  * image_masking.py:38-81) with an explicitly defined border convention — reflect-101
  * for convolutions (OpenCV's default), in-bounds-only for morphology — validated by
  * planted fixtures rather than against OpenCV bytes (SURVEY.md §7 hard parts).
  *
  * Images are single-channel row-major Array[Double] of size width×height, indexed
  * (x·h + y) to match the cell-image layout.
  */
object ImageKernels {

  /** The reference casts intensities with numpy astype('uint8'), which WRAPS modulo
    * 256 (image_masking.py:85: values up to ~1000 wrap, not clamp). Replicated. */
  def toUint8(v: Double): Int = {
    val l = v.toLong & 0xFFL
    l.toInt
  }

  @inline private def reflect101(i: Int, n: Int): Int = {
    // OpenCV BORDER_REFLECT_101: gfedcb|abcdefgh|gfedcba
    var x = i
    if (n == 1) return 0
    while (x < 0 || x >= n) {
      if (x < 0) x = -x
      if (x >= n) x = 2 * n - 2 - x
    }
    x
  }

  /** 5×5 Gaussian (σ = 1.4, the classical Canny smoother), reflect-101 borders. */
  def gaussianBlur5(img: Array[Double], w: Int, h: Int): Array[Double] = {
    val sigma = 1.4
    val k = Array.tabulate(5, 5) { (i, j) =>
      val dx = i - 2.0; val dy = j - 2.0
      math.exp(-(dx * dx + dy * dy) / (2 * sigma * sigma))
    }
    val norm = k.map(_.sum).sum
    val out = new Array[Double](w * h)
    var x = 0
    while (x < w) {
      var y = 0
      while (y < h) {
        var s = 0.0
        var i = -2
        while (i <= 2) {
          var j = -2
          while (j <= 2) {
            s += k(i + 2)(j + 2) * img(reflect101(x + i, w) * h + reflect101(y + j, h))
            j += 1
          }
          i += 1
        }
        out(x * h + y) = s / norm
        y += 1
      }
      x += 1
    }
    out
  }

  /** Sobel gradients: returns (gx, gy), reflect-101 borders. */
  def sobel(img: Array[Double], w: Int, h: Int): (Array[Double], Array[Double]) = {
    val gx = new Array[Double](w * h)
    val gy = new Array[Double](w * h)
    val kx = Array(Array(-1.0, 0.0, 1.0), Array(-2.0, 0.0, 2.0), Array(-1.0, 0.0, 1.0))
    val ky = Array(Array(-1.0, -2.0, -1.0), Array(0.0, 0.0, 0.0), Array(1.0, 2.0, 1.0))
    var x = 0
    while (x < w) {
      var y = 0
      while (y < h) {
        var sx = 0.0; var sy = 0.0
        var i = -1
        while (i <= 1) {
          var j = -1
          while (j <= 1) {
            val v = img(reflect101(x + i, w) * h + reflect101(y + j, h))
            sx += kx(i + 1)(j + 1) * v
            sy += ky(i + 1)(j + 1) * v
            j += 1
          }
          i += 1
        }
        gx(x * h + y) = sx
        gy(x * h + y) = sy
        y += 1
      }
      x += 1
    }
    (gx, gy)
  }

  /** Threshold-INDEPENDENT half of Canny: gaussian → sobel → non-max-suppressed
    * gradient magnitudes. Grid search re-runs Canny over the same image for every
    * (t1, t2) combo; factoring this out lets the expensive half run once per image
    * while only [[hysteresis]] varies with the thresholds. */
  def cannyNms(image: Array[Double], w: Int, h: Int): Array[Double] = {
    val smoothed = gaussianBlur5(image, w, h)
    val (gx, gy) = sobel(smoothed, w, h)
    val mag = new Array[Double](w * h)
    var i = 0
    while (i < w * h) { mag(i) = math.hypot(gx(i), gy(i)); i += 1 }

    // non-max suppression along the quantized gradient direction
    val nms = new Array[Double](w * h)
    var x = 0
    while (x < w) {
      var y = 0
      while (y < h) {
        val idx = x * h + y
        val m = mag(idx)
        if (m > 0) {
          val ang = math.atan2(gy(idx), gx(idx))
          val deg = (math.toDegrees(ang) + 180) % 180
          val (dx, dy) =
            if (deg < 22.5 || deg >= 157.5) (1, 0)
            else if (deg < 67.5) (1, 1)
            else if (deg < 112.5) (0, 1)
            else (-1, 1)
          val n1 = at(mag, w, h, x + dx, y + dy)
          val n2 = at(mag, w, h, x - dx, y - dy)
          nms(idx) = if (m >= n1 && m >= n2) m else 0.0
        }
        y += 1
      }
      x += 1
    }
    nms
  }

  /** Hysteresis thresholding: strong pixels (≥ hi) seed a BFS through weak pixels
    * (≥ lo), 8-connected. */
  def hysteresis(nms: Array[Double], w: Int, h: Int, lo: Double, hi: Double): Array[Boolean] = {
    val out = new Array[Boolean](w * h)
    val stack = new java.util.ArrayDeque[Int]()
    var i = 0
    while (i < w * h) {
      if (nms(i) >= hi && !out(i)) { out(i) = true; stack.push(i) }
      i += 1
    }
    while (!stack.isEmpty) {
      val idx = stack.pop()
      val cx = idx / h; val cy = idx % h
      var dx = -1
      while (dx <= 1) {
        var dy = -1
        while (dy <= 1) {
          val nx = cx + dx; val ny = cy + dy
          if (nx >= 0 && nx < w && ny >= 0 && ny < h) {
            val nidx = nx * h + ny
            if (!out(nidx) && nms(nidx) >= lo) { out(nidx) = true; stack.push(nidx) }
          }
          dy += 1
        }
        dx += 1
      }
    }
    out
  }

  /** Canny edge detection. threshold1/threshold2 follow OpenCV: low = min, high =
    * max of the two. Returns a boolean edge map. */
  def canny(image: Array[Double], w: Int, h: Int,
            threshold1: Double, threshold2: Double): Array[Boolean] =
    hysteresis(cannyNms(image, w, h), w, h,
      math.min(threshold1, threshold2), math.max(threshold1, threshold2))

  @inline private def at(a: Array[Double], w: Int, h: Int, x: Int, y: Int): Double =
    if (x < 0 || x >= w || y < 0 || y >= h) 0.0 else a(x * h + y)

  /** Elliptical structuring element offsets for a (kw × kh) kernel: pixels inside
    * the inscribed ellipse, anchored at the center (our convention; OpenCV's
    * MORPH_ELLIPSE rasterization differs in single border pixels for even sizes). */
  def ellipseOffsets(kw: Int, kh: Int): Array[(Int, Int)] = {
    val cx = (kw - 1) / 2.0; val cy = (kh - 1) / 2.0
    val rx = math.max(kw / 2.0, 0.5); val ry = math.max(kh / 2.0, 0.5)
    val buf = Array.newBuilder[(Int, Int)]
    for (i <- 0 until kw; j <- 0 until kh) {
      val dx = (i - cx) / rx; val dy = (j - cy) / ry
      if (dx * dx + dy * dy <= 1.0 + 1e-9)
        buf += ((i - (kw / 2)) -> (j - (kh / 2)))
    }
    buf.result()
  }

  /** Binary dilation: output set if ANY covered in-bounds pixel is set. */
  def dilate(mask: Array[Boolean], w: Int, h: Int, se: Array[(Int, Int)]): Array[Boolean] = {
    val out = new Array[Boolean](w * h)
    var x = 0
    while (x < w) {
      var y = 0
      while (y < h) {
        var hit = false
        var k = 0
        while (k < se.length && !hit) {
          val (dx, dy) = se(k)
          val nx = x + dx; val ny = y + dy
          if (nx >= 0 && nx < w && ny >= 0 && ny < h && mask(nx * h + ny)) hit = true
          k += 1
        }
        out(x * h + y) = hit
        y += 1
      }
      x += 1
    }
    out
  }

  /** Binary erosion: output set if ALL covered in-bounds pixels are set (out-of-
    * bounds ignored — our border convention, documented and fixture-tested). */
  def erode(mask: Array[Boolean], w: Int, h: Int, se: Array[(Int, Int)]): Array[Boolean] = {
    val out = new Array[Boolean](w * h)
    var x = 0
    while (x < w) {
      var y = 0
      while (y < h) {
        var all = true
        var k = 0
        while (k < se.length && all) {
          val (dx, dy) = se(k)
          val nx = x + dx; val ny = y + dy
          if (nx >= 0 && nx < w && ny >= 0 && ny < h && !mask(nx * h + ny)) all = false
          k += 1
        }
        out(x * h + y) = all
        y += 1
      }
      x += 1
    }
    out
  }

  /** Morphological CLOSE = dilate then erode. The reference's `apply_opening`
    * actually performs CLOSE (image_masking.py:41 — SURVEY.md §4 quirk 5); we keep
    * the semantics and the honest name. */
  def close(mask: Array[Boolean], w: Int, h: Int, kw: Int, kh: Int): Array[Boolean] = {
    val se = ellipseOffsets(kw, kh)
    erode(dilate(mask, w, h, se), w, h, se)
  }

  /** Windowed median blur (k × k, odd k), clamp borders — the notebook's exploratory
    * cv.medianBlur(cell, 5) (image_masking.ipynb cell 29, SURVEY.md M2). */
  def medianBlur(img: Array[Double], w: Int, h: Int, k: Int): Array[Double] = {
    require(k % 2 == 1, "median kernel must be odd")
    val r = k / 2
    val out = new Array[Double](w * h)
    val buf = new Array[Double](k * k)
    var x = 0
    while (x < w) {
      var y = 0
      while (y < h) {
        var n = 0
        var i = -r
        while (i <= r) {
          var j = -r
          while (j <= r) {
            val nx = math.max(0, math.min(w - 1, x + i))
            val ny = math.max(0, math.min(h - 1, y + j))
            buf(n) = img(nx * h + ny); n += 1
            j += 1
          }
          i += 1
        }
        val sorted = buf.take(n).sorted
        out(x * h + y) = sorted(n / 2)
        y += 1
      }
      x += 1
    }
    out
  }

  /** canny_masking (image_masking.py:78-81): Canny on the uint8-wrapped image, then
    * elliptical CLOSE, as a boolean mask. */
  def cannyMask(image: Array[Double], w: Int, h: Int,
                t1: Double, t2: Double, kw: Int, kh: Int): Array[Boolean] = {
    val u8 = image.map(v => toUint8(v).toDouble)
    close(canny(u8, w, h, t1, t2), w, h, kw, kh)
  }
}
