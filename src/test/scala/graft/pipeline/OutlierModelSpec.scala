package graft.pipeline

import graft.SparkSpec
import graft.functions.MeanVar

/** Voting predicate semantics (outlier_detection.py:41-53), JSON round-trip in the
  * reference's model shape, and end-to-end train parity with an independent
  * in-memory reimplementation (SURVEY.md §5.6). */
class OutlierModelSpec extends SparkSpec {

  private val model = OutlierModel(Map(
    "area" -> IndexedSeq(MeanVar(10, 100.0, 16.0)), // sd 4 -> bound 2, band (98, 102)
    "perimeter" -> IndexedSeq(MeanVar(10, 40.0, 4.0)))) // sd 2 -> bound 1, band (39, 41)

  private def feats(area: Double, per: Double) = Seq(
    CellFeatures("f", 0, "area", Array(area)),
    CellFeatures("f", 0, "perimeter", Array(per)))

  test("strictly-inside values vote inlier; kept iff votes < 0") {
    assert(model.isNoOutlier(feats(100.0, 40.0))) // votes -2
    assert(!model.isNoOutlier(feats(100.0, 45.0))) // -1 +1 = 0, NOT < 0 -> filtered
    assert(!model.isNoOutlier(feats(110.0, 45.0))) // +2
  }

  test("boundary value votes outlier (strict inequality, as in the reference)") {
    assert(!model.isNoOutlier(feats(102.0, 40.0))) // area exactly on bound: +1; net 0
  }

  test("JSON round-trip preserves the reference model shape") {
    val json = model.toJson
    assert(json.contains("\"area\"") && json.contains("\"mean\": 100.0"))
    val back = OutlierModel.fromJson(json)
    assert(back.stats("area").head.mean == 100.0)
    assert(back.stats("area").head.variance == 16.0)
    assert(back.stats("perimeter").head.variance == 4.0)
  }

  test("reference outlier_model.json parses (9 channels x 4 features)") {
    val src = scala.io.Source.fromFile("/root/reference/outlier_model.json")
    val json = try src.mkString finally src.close()
    val m = OutlierModel.fromJson(json)
    assert(m.stats.keySet == Set("area", "circularity", "mean_intensity", "perimeter"))
    assert(m.stats("area").length == 9)
    assert(math.abs(m.stats("area").head.mean - 1578.7629586488058) < 1e-9)
  }

  test("distributed train equals independent in-memory statistics") {
    import spark.implicits._
    val images = (0 until 40).map(i => CellImageFixtures.make("f0", 0, i.toLong, channels = 2))
    val feats = images.flatMap(Features.extract)
    val ds = spark.createDataset(feats).repartition(7) // odd partitioning on purpose
    val trained = OutlierModel.train(ds)

    // independent reimplementation: plain two-pass per (feature, channel)
    for (name <- Features.names; c <- 0 until 2) {
      val vals = feats.filter(_.featureName == name).map(_.values(c))
      val mean = vals.sum / vals.length
      val varS = vals.map(v => (v - mean) * (v - mean)).sum / (vals.length - 1)
      val got = trained.stats(name)(c)
      assert(math.abs(got.mean - mean) / math.max(1.0, math.abs(mean)) < 1e-9,
        s"$name/$c mean")
      assert(math.abs(got.variance - varS) / math.max(1.0, varS) < 1e-9,
        s"$name/$c variance")
      assert(got.n == vals.length)
    }
  }

  test("planted outliers are filtered (every 10th image is oversized+bright)") {
    import spark.implicits._
    val images = spark.createDataset(
      (0 until 100).map(i => CellImageFixtures.make("f0", 0, i.toLong, channels = 3)))
    val features = images.flatMap(Features.extract _)
    val m = OutlierModel.train(features)
    val bc = spark.sparkContext.broadcast(m)
    val kept = images.filter((ci: CellImage) => bc.value.isNoOutlier(Features.extract(ci))).collect()
    // all planted outliers (idx % 10 == 9) must be gone
    assert(kept.forall(_.imageIdx % 10 != 9))
    assert(kept.nonEmpty)
  }
}
