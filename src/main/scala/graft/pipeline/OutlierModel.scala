package graft.pipeline

import graft.functions.MeanVar
import org.apache.spark.sql.Dataset

/** Per-(feature, channel) mean/variance statistics + voting outlier filter — the
  * reference's OutlierModel (/root/reference/outlier_detection.py).
  *
  * Train is the reference's `combineByKey` partial/final aggregation
  * (outlier_detection.py:57) re-expressed as a typed groupByKey over the Welford
  * aggregator: Spark plans the same createCombiner/mergeValue (partition-local) and
  * mergeCombiners (shuffle reduce) split itself, with ≤4 keys crossing the wire.
  * The corrected Chan merge is used (the reference's is mis-transcribed — SURVEY.md
  * §4 quirk 1), so trained statistics equal exact two-pass variance.
  *
  * Predict replicates is_no_outlier (outlier_detection.py:41-53) exactly: per
  * (feature, channel), vote −1 if the value lies STRICTLY inside mean ± 0.5·√variance
  * else +1 (boundary ⇒ outlier vote); the image is kept iff votes < 0.
  */
final case class OutlierModel(stats: Map[String, IndexedSeq[MeanVar]]) {

  def isNoOutlier(features: Seq[CellFeatures]): Boolean = {
    var votes = 0
    features.foreach { f =>
      val chans = stats(f.featureName)
      var c = 0
      while (c < f.values.length) {
        val st = chans(c)
        val bound = 0.5 * math.sqrt(st.variance)
        if (st.mean - bound < f.values(c) && f.values(c) < st.mean + bound) votes -= 1
        else votes += 1
        c += 1
      }
    }
    votes < 0
  }

  /** JSON in the reference's on-disk shape: {feature: [{mean, variance}, ...]}
    * (outlier_model.json; write at outlier_detection.py:27-35). */
  def toJson: String = {
    val feats = stats.toSeq.sortBy(_._1).map { case (name, chans) =>
      val arr = chans.map(mv =>
        s"""{"mean": ${mv.mean}, "variance": ${mv.variance}}""").mkString("[", ", ", "]")
      s""""$name": $arr"""
    }
    feats.mkString("{", ", ", "}")
  }
}

object OutlierModel {

  /** Distributed training via the typed Welford aggregator: partial per-channel
    * states fold map-side inside each partition, and only ≤4 (feature-name → state)
    * rows cross the shuffle — the exact partial/final split of the reference's
    * combineByKey, but planned by Spark. A mapGroups would instead shuffle every
    * feature row to 4 tasks; with 4 keys that is a guaranteed skew bottleneck. */
  def train(features: Dataset[CellFeatures]): OutlierModel = {
    val spark = features.sparkSession
    import spark.implicits._
    val agg = new graft.functions.WelfordArrayAgg().toColumn
    val perFeature = features
      .groupByKey(_.featureName)
      .mapValues(_.values.toSeq)
      .agg(agg)
      .collect()
    OutlierModel(perFeature.map { case (name, mvs) => name -> mvs.toIndexedSeq }.toMap)
  }

  def fromJson(json: String): OutlierModel = {
    // minimal parser for the reference's flat model shape — no external json lib
    val featPat = """"([a-z_]+)":\s*\[((?:[^\]]*))\]""".r
    val statPat = """\{\s*"mean":\s*([-0-9.eE]+),\s*"variance":\s*([-0-9.eE]+)\s*\}""".r
    val stats = featPat.findAllMatchIn(json).map { m =>
      val chans = statPat.findAllMatchIn(m.group(2)).map { sm =>
        MeanVar(0L, sm.group(1).toDouble, sm.group(2).toDouble)
      }.toIndexedSeq
      m.group(1) -> chans
    }.toMap
    OutlierModel(stats)
  }
}
