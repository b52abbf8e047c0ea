package graft.pipeline

/** Per-image, per-channel scalar features F1–F4 — faithful Scala renderings of
  * /root/reference/feature extraction.py:
  *
  *  - area (calc_area:80-83): count of mask-true pixels per channel.
  *  - perimeter (calc_perimeter:68-77 + neighbour_count:54-65): for every cell pixel,
  *    the number of its in-bounds 4-neighbors that are background. Out-of-bounds
  *    sides contribute NOTHING (the reference's `x > 0` guards) — a border cell pixel
  *    adds no perimeter on the image edge. Replicated exactly.
  *  - circularity (calc_circularity:44-51): 4πA/P², 0 when P == 0.
  *  - mean_intensity (calc_mean_intensity:38-41 over the masked array built at :88):
  *    numpy masked-array semantics — mask TRUE means EXCLUDED, so this is the mean
  *    over NON-cell pixels. Counterintuitive but it is what the reference computes;
  *    replicated exactly (SURVEY.md §2a F4).
  *
  * All pure functions over the flat arrays — unit-tested against hand-computed
  * micro-fixtures (FeatureSpec) and independently re-derived in the parity test.
  */
object Features {

  val names: Seq[String] = Seq("area", "perimeter", "circularity", "mean_intensity")

  def area(ci: CellImage): Array[Double] = {
    val out = new Array[Double](ci.nChannels)
    var c = 0
    while (c < ci.nChannels) {
      var n = 0
      var i = c * ci.width * ci.height
      val end = i + ci.width * ci.height
      while (i < end) { if (ci.mask(i)) n += 1; i += 1 }
      out(c) = n.toDouble
      c += 1
    }
    out
  }

  def perimeter(ci: CellImage): Array[Double] = {
    val w = ci.width; val h = ci.height
    val out = new Array[Double](ci.nChannels)
    var c = 0
    while (c < ci.nChannels) {
      var p = 0
      var x = 0
      while (x < w) {
        var y = 0
        while (y < h) {
          if (ci.maskAt(c, x, y)) {
            if (x > 0 && !ci.maskAt(c, x - 1, y)) p += 1
            if (x < w - 1 && !ci.maskAt(c, x + 1, y)) p += 1
            if (y > 0 && !ci.maskAt(c, x, y - 1)) p += 1
            if (y < h - 1 && !ci.maskAt(c, x, y + 1)) p += 1
          }
          y += 1
        }
        x += 1
      }
      out(c) = p.toDouble
      c += 1
    }
    out
  }

  def circularity(area: Array[Double], perimeter: Array[Double]): Array[Double] =
    area.lazyZip(perimeter).map { (a, p) =>
      if (p > 0) 4.0 * math.Pi * a / (p * p) else 0.0
    }.toArray

  def meanIntensity(ci: CellImage): Array[Double] = {
    val out = new Array[Double](ci.nChannels)
    var c = 0
    while (c < ci.nChannels) {
      var sum = 0.0
      var n = 0
      var i = c * ci.width * ci.height
      val end = i + ci.width * ci.height
      while (i < end) {
        if (!ci.mask(i)) { sum += ci.data(i); n += 1 } // mask=true EXCLUDED (np.ma)
        i += 1
      }
      out(c) = if (n > 0) sum / n else 0.0
      c += 1
    }
    out
  }

  /** calculate_features (feature extraction.py:86-98): one (name, per-channel values)
    * row per feature, in the reference's insertion order. */
  def extract(ci: CellImage): Seq[CellFeatures] = {
    val a = area(ci)
    val p = perimeter(ci)
    Seq(
      CellFeatures(ci.fileId, ci.imageIdx, "area", a),
      CellFeatures(ci.fileId, ci.imageIdx, "perimeter", p),
      CellFeatures(ci.fileId, ci.imageIdx, "circularity", circularity(a, p)),
      CellFeatures(ci.fileId, ci.imageIdx, "mean_intensity", meanIntensity(ci)))
  }
}

/** Long-form feature row: the typed twin of the reference's `(name, [values])` pairs. */
final case class CellFeatures(
    fileId: String,
    imageIdx: Long,
    featureName: String,
    values: Array[Double])
