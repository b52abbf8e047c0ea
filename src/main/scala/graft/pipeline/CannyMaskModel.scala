package graft.pipeline

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

/** Pixel-mask scoring (image_masking.py:45-73).
  *
  * The reference's confusion counts SWAP the FP/FN labels versus convention
  * (gt ∧ ¬pred is counted as "FP", ¬gt ∧ pred as "FN" — lines 53-59, SURVEY.md §4
  * quirk 4). Its "balanced accuracy" is therefore (precision + NPV)/2, not
  * (TPR+TNR)/2. We keep that exact arithmetic for model selection — so trained
  * parameters match the reference's choices — under the honest name
  * [[referenceScore]], and also provide the textbook [[balancedAccuracy]].
  */
object Scoring {

  /** (tp, gtOnly, tn, predOnly): tp = gt∧pred, gtOnly = gt∧¬pred (the reference's
    * "FP"), tn = ¬gt∧¬pred, predOnly = ¬gt∧pred (the reference's "FN"). */
  def confusion(pred: Array[Boolean], gt: Array[Boolean]): (Long, Long, Long, Long) = {
    var tp = 0L; var gtOnly = 0L; var tn = 0L; var predOnly = 0L
    var i = 0
    while (i < pred.length) {
      if (gt(i) && pred(i)) tp += 1
      else if (gt(i) && !pred(i)) gtOnly += 1
      else if (!gt(i) && !pred(i)) tn += 1
      else predOnly += 1
      i += 1
    }
    (tp, gtOnly, tn, predOnly)
  }

  /** The reference's model-selection metric: with its swapped labels,
    * tpr' = TP/(TP + predOnly) and tnr' = TN/(TN + gtOnly), default 1 on empty
    * denominators, averaged. */
  def referenceScore(pred: Array[Boolean], gt: Array[Boolean]): Double = {
    val (tp, gtOnly, tn, predOnly) = confusion(pred, gt)
    val tpr = if (tp + predOnly > 0) tp.toDouble / (tp + predOnly) else 1.0
    val tnr = if (tn + gtOnly > 0) tn.toDouble / (tn + gtOnly) else 1.0
    (tpr + tnr) / 2
  }

  /** Textbook balanced accuracy: (TP/(TP+FN) + TN/(TN+FP))/2 with the same
    * empty-denominator default. */
  def balancedAccuracy(pred: Array[Boolean], gt: Array[Boolean]): Double = {
    val (tp, fn, tn, fp) = confusion(pred, gt)
    val tpr = if (tp + fn > 0) tp.toDouble / (tp + fn) else 1.0
    val tnr = if (tn + fp > 0) tn.toDouble / (tn + fp) else 1.0
    (tpr + tnr) / 2
  }

  /** Plain accuracy (image_masking.py:71-73). */
  def accuracy(pred: Array[Boolean], gt: Array[Boolean]): Double = {
    val (tp, a, tn, b) = confusion(pred, gt)
    (tp + tn).toDouble / (tp + a + tn + b)
  }
}

/** Per-channel Canny parameters (threshold1, threshold2, kernel w×h). */
final case class CannyParams(threshold1: Int, threshold2: Int, kw: Int, kh: Int)

/** Canny grid-search masking model (CannyEdgeMaskingModel, image_masking.py:103-167).
  *
  * The reference trains with a driver-side triple loop launching THREE Spark jobs per
  * parameter combination over the cached cells (map → map → aggregate,
  * image_masking.py:116-137) — at a 21×21×5 grid that is 6,615 jobs, which is why the
  * notebook fell back to collecting 30 cells to the driver (SURVEY.md §3.3). [[train]]
  * instead scores the ENTIRE grid in ONE distributed pass: each partition computes
  * per-(combo, channel) partial score sums locally (the grid rides the closure), and
  * a single |grid|×|channels|-row aggregation picks the argmax — same selection
  * semantics (strictly-greater, first-combo-wins in grid iteration order).
  */
final case class CannyMaskModel(parameters: IndexedSeq[CannyParams]) {

  def nChannels: Int = parameters.length

  /** calculate_masks (image_masking.py:83-90): per-channel Canny+CLOSE, concatenated
    * to one flat boolean mask in channel order. */
  def predictMasks(ci: CellImage): Array[Boolean] = {
    val plane = ci.width * ci.height
    val out = new Array[Boolean](ci.nChannels * plane)
    var c = 0
    while (c < ci.nChannels) {
      val p = parameters(c)
      val channel = java.util.Arrays.copyOfRange(ci.data, c * plane, (c + 1) * plane)
      val m = ImageKernels.cannyMask(channel, ci.width, ci.height,
        p.threshold1, p.threshold2, p.kw, p.kh)
      System.arraycopy(m, 0, out, c * plane, plane)
      c += 1
    }
    out
  }

  /** The reference's predict builds the mapped RDD but never executes or returns it
    * (image_masking.py:166-167 — SURVEY.md S11 bug). Ours returns the dataset. */
  def predict(images: Dataset[CellImage]): Dataset[(String, Long, Array[Boolean])] = {
    val spark = images.sparkSession
    import spark.implicits._
    val self = this
    images.map(ci => (ci.fileId, ci.imageIdx, self.predictMasks(ci)))
  }

  /** JSON in the reference's on-disk shape:
    * {"0": {"threshold1": .., "threshold2": .., "opening_shape": [8, 8]}, ...}. */
  def toJson: String =
    parameters.zipWithIndex.map { case (p, c) =>
      s""""$c": {"threshold1": ${p.threshold1}, "threshold2": ${p.threshold2}, "opening_shape": [${p.kw}, ${p.kh}]}"""
    }.mkString("{", ", ", "}")
}

object CannyMaskModel {

  def default(nChannels: Int): CannyMaskModel =
    CannyMaskModel(IndexedSeq.fill(nChannels)(CannyParams(50, 100, 8, 8)))

  def fromJson(json: String): CannyMaskModel = {
    val pat =
      """"(\d+)":\s*\{\s*"threshold1":\s*(\d+),\s*"threshold2":\s*(\d+),\s*"opening_shape":\s*\[(\d+),\s*(\d+)\]\s*\}""".r
    val params = pat.findAllMatchIn(json)
      .map(m => m.group(1).toInt ->
        CannyParams(m.group(2).toInt, m.group(3).toInt, m.group(4).toInt, m.group(5).toInt))
      .toSeq.sortBy(_._1).map(_._2)
    CannyMaskModel(params.toIndexedSeq)
  }

  /** Single-job distributed grid search (see class doc). Selection per channel:
    * argmax of mean reference-score, ties resolved to the earliest combo in
    * (t1, t2, shape) iteration order — exactly the reference's strictly-greater
    * update (image_masking.py:133-136). */
  def train(images: Dataset[CellImage],
            threshold1Range: Seq[Int], threshold2Range: Seq[Int],
            shapeRange: Seq[(Int, Int)]): (CannyMaskModel, IndexedSeq[Double]) = {
    val spark = images.sparkSession
    import spark.implicits._
    val grid: IndexedSeq[(Int, CannyParams)] = (for {
      t1 <- threshold1Range
      t2 <- threshold2Range
      (kw, kh) <- shapeRange
    } yield CannyParams(t1, t2, kw, kh)).zipWithIndex.map(_.swap).toIndexedSeq

    // one pass: every (image, combo, channel) score; combos ride the closure, so the
    // only shuffle is the tiny (comboIdx, channel) partial-avg aggregation. The
    // threshold-independent Canny half (gaussian/sobel/NMS) is computed ONCE per
    // (image, channel) and shared across all |grid| combos — only hysteresis + CLOSE
    // vary with the parameters.
    val scores = images.flatMap { ci =>
      val plane = ci.width * ci.height
      (0 until ci.nChannels).iterator.flatMap { c =>
        val channel = java.util.Arrays.copyOfRange(ci.data, c * plane, (c + 1) * plane)
        val u8 = channel.map(v => ImageKernels.toUint8(v).toDouble)
        val nms = ImageKernels.cannyNms(u8, ci.width, ci.height)
        val gt = java.util.Arrays.copyOfRange(ci.mask, c * plane, (c + 1) * plane)
        grid.iterator.map { case (idx, p) =>
          val lo = math.min(p.threshold1, p.threshold2).toDouble
          val hi = math.max(p.threshold1, p.threshold2).toDouble
          val edges = ImageKernels.hysteresis(nms, ci.width, ci.height, lo, hi)
          val pred = ImageKernels.close(edges, ci.width, ci.height, p.kw, p.kh)
          (idx, c, Scoring.referenceScore(pred, gt))
        }
      }
    }.toDF("comboIdx", "channel", "score")

    val avg = scores.groupBy(col("comboIdx"), col("channel"))
      .agg(org.apache.spark.sql.functions.avg(col("score")).as("meanScore"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap

    require(avg.nonEmpty, "grid search over an empty image dataset")
    val nChannels = avg.keys.map(_._2).max + 1
    val best = (0 until nChannels).map { c =>
      // seed with the first combo (the reference seeds best=0/None and would NPE if
      // every combo scored 0 — a bug we do not replicate); strictly-greater updates
      // preserve its first-combo-wins tie behavior
      var bestParams = grid.head._2
      var bestAcc = avg((grid.head._1, c))
      grid.drop(1).foreach { case (idx, p) =>
        val a = avg((idx, c))
        if (a > bestAcc) { bestAcc = a; bestParams = p }
      }
      (bestParams, bestAcc)
    }
    (CannyMaskModel(best.map(_._1).toIndexedSeq), best.map(_._2).toIndexedSeq)
  }
}
