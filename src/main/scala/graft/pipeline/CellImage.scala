package graft.pipeline

import org.apache.spark.sql.{Dataset, SparkSession}

/** One multi-channel cell image — the row produced by the reference's "scifio" source
  * (schema pinned by usage at /root/reference/feature extraction.py:87-88 and
  * image_segmentation/image_masking.py:28-36; SURVEY.md §1.1).
  *
  * `data` / `mask` are flat, length = channels × width × height, row-major
  * (channel, x, y): index c·w·h + x·h + y — matching the reference's
  * `np.reshape(row.data, (C, width, height))`.
  */
final case class CellImage(
    fileId: String,
    imageIdx: Long,
    width: Int,
    height: Int,
    nChannels: Int,
    data: Array[Double],
    mask: Array[Boolean]) {

  @inline def at(c: Int, x: Int, y: Int): Double = data(c * width * height + x * height + y)
  @inline def maskAt(c: Int, x: Int, y: Int): Boolean = mask(c * width * height + x * height + y)
}

/** Deterministic synthetic cell-image fixtures (FIXTURES.md §B). The real `.cif`
  * input is a git-LFS pointer with no bytes (/root/reference/data/test.cif:1-3), so
  * fixtures replicate the source *contract*: filled-ellipse cells with per-channel
  * intensity profiles, a planted outlier population, and ground-truth masks.
  *
  * Pure functions of (fileId, imageIdx) — no RNG object state — so any partitioning
  * of the generation job yields identical rows.
  */
object CellImageFixtures {

  /** Cheap deterministic hash → [0, 1). */
  private def u(seed: Long): Double = {
    var h = seed * 0x9E3779B97F4A7C15L
    h ^= h >>> 32; h *= 0xBF58476D1CE4E5B9L; h ^= h >>> 29
    (h >>> 11).toDouble / (1L << 53).toDouble
  }

  /** One synthetic image: elliptical cell; per-channel base intensity rises with the
    * channel index; every 10th image is a planted outlier (double-size cell, shifted
    * intensity) so outlier-filter counts are predictable. */
  def make(fileId: String, fileNo: Int, imageIdx: Long, channels: Int,
           w: Int = 32, h: Int = 32): CellImage = {
    val seed = fileNo.toLong * 100000L + imageIdx
    val outlier = imageIdx % 10 == 9
    val cx = w / 2.0 + (u(seed) - 0.5) * 4
    val cy = h / 2.0 + (u(seed + 1) - 0.5) * 4
    val rx = (if (outlier) 12.0 else 6.0) + u(seed + 2) * 2
    val ry = (if (outlier) 10.0 else 5.0) + u(seed + 3) * 2
    val data = new Array[Double](channels * w * h)
    val mask = new Array[Boolean](channels * w * h)
    var c = 0
    while (c < channels) {
      val base = 100.0 * (c + 1) + (if (outlier) 400.0 else 0.0)
      var x = 0
      while (x < w) {
        var y = 0
        while (y < h) {
          val i = c * w * h + x * h + y
          val dx = (x - cx) / rx
          val dy = (y - cy) / ry
          val inside = dx * dx + dy * dy <= 1.0
          mask(i) = inside
          val noise = (u(seed * 31 + i) - 0.5) * 20.0
          data(i) = (if (inside) base + 200.0 else base * 0.25) + noise
          y += 1
        }
        x += 1
      }
      c += 1
    }
    CellImage(fileId, imageIdx, w, h, channels, data, mask)
  }

  /** The "shapes" fixture: nFiles × imagesPerFile images (FIXTURES.md §B.2). */
  def shapes(spark: SparkSession, nFiles: Int = 2, imagesPerFile: Int = 50,
             channels: Int = 9, w: Int = 32, h: Int = 32): Dataset[CellImage] = {
    import spark.implicits._
    val keys = for {
      f <- 0 until nFiles
      i <- 0 until imagesPerFile
    } yield (f, i.toLong)
    // generate on executors: only (file, idx) keys are shipped, images materialize
    // in parallel — the pattern that scales to any fixture size
    spark.createDataset(keys)
      .repartition(spark.sparkContext.defaultParallelism)
      .map { case (f, i) => make(s"file_$f", f, i, channels, w, h) }
  }
}
