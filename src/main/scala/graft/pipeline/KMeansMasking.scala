package graft.pipeline

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{DataFrame, SparkSession}

/** KMeans pixel-clustering segmentation (M8/S13/S14 — image_masking.ipynb cells
  * 7-18, image_to_df at image_segmentation/image_masking.py:31-33): per-pixel feature
  * vectors [10·intensity, x, y] (the ×10 intensity scaling is the reference's),
  * k=2 / seed=1 / maxIter=10 / weighCol, foreground = cluster with the brighter
  * centroid, then the same elliptical CLOSE as the Canny path.
  */
object KMeansMasking {

  /** image_to_df: one row per pixel, features = [10·p, x, y], weight 1.0. */
  def pixelDf(spark: SparkSession, image: Array[Double], w: Int, h: Int): DataFrame = {
    import spark.implicits._
    val rows = for (x <- 0 until w; y <- 0 until h)
      yield (Vectors.dense(10.0 * image(x * h + y), x.toDouble, y.toDouble), 1.0)
    rows.toDF("features", "weighCol")
  }

  /** Cluster one channel's pixels into fg/bg; returns the boolean mask (pre-CLOSE)
    * and — when `withSilhouette` — the squared-Euclidean silhouette of the
    * 2-clustering (S15: the reference imports ClusteringEvaluator at
    * image_segmentation/image_masking.py:5 but never invokes it; evaluated here to
    * close that row). The silhouette job only runs when requested, and a
    * degenerate fit (every pixel in one cluster, e.g. a uniform channel — where
    * the evaluator requires >1 cluster) reports 0.0 instead of throwing, so
    * masking never fails on inputs that used to mask fine. */
  private def cluster(spark: SparkSession, image: Array[Double], w: Int, h: Int,
                      withSilhouette: Boolean): (Array[Boolean], Double) = {
    val df = pixelDf(spark, image, w, h)
    val km = new KMeans().setK(2).setSeed(1).setMaxIter(10).setWeightCol("weighCol")
    val model = km.fit(df)
    // foreground = cluster whose centroid intensity (feature 0) is larger
    val fg = if (model.clusterCenters(0)(0) >= model.clusterCenters(1)(0)) 0 else 1
    val predDf = model.transform(df)
    val sil =
      if (!withSilhouette) 0.0
      else scala.util.Try(
        new org.apache.spark.ml.evaluation.ClusteringEvaluator()
          .setMetricName("silhouette").evaluate(predDf)).getOrElse(0.0)
    val pred = predDf.select("prediction").collect().map(_.getInt(0))
    val out = new Array[Boolean](w * h)
    var i = 0
    while (i < out.length) { out(i) = pred(i) == fg; i += 1 }
    (out, sil)
  }

  def maskWithSilhouette(spark: SparkSession, image: Array[Double],
                         w: Int, h: Int): (Array[Boolean], Double) =
    cluster(spark, image, w, h, withSilhouette = true)

  def mask(spark: SparkSession, image: Array[Double], w: Int, h: Int): Array[Boolean] =
    cluster(spark, image, w, h, withSilhouette = false)._1

  /** Full notebook flow for one channel: KMeans mask → elliptical CLOSE → score
    * against the ground-truth mask; also reports the clustering silhouette (S15)
    * unless the caller opts out (maskAndScore — no wasted evaluation job). */
  def maskScoreSilhouette(spark: SparkSession, ci: CellImage, channel: Int,
                          kw: Int = 8, kh: Int = 8,
                          withSilhouette: Boolean = true): (Array[Boolean], Double, Double) = {
    val plane = ci.width * ci.height
    val img = java.util.Arrays.copyOfRange(ci.data, channel * plane, (channel + 1) * plane)
    val (raw, sil) = cluster(spark, img, ci.width, ci.height, withSilhouette)
    val closed = ImageKernels.close(raw, ci.width, ci.height, kw, kh)
    val gt = java.util.Arrays.copyOfRange(ci.mask, channel * plane, (channel + 1) * plane)
    (closed, Scoring.balancedAccuracy(closed, gt), sil)
  }

  def maskAndScore(spark: SparkSession, ci: CellImage, channel: Int,
                   kw: Int = 8, kh: Int = 8): (Array[Boolean], Double) = {
    val (m, score, _) = maskScoreSilhouette(spark, ci, channel, kw, kh, withSilhouette = false)
    (m, score)
  }
}
