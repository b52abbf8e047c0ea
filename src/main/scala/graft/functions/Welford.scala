package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Streaming mean/variance state (Welford's online algorithm). */
final case class WelfordBuf(n: Long, mean: Double, m2: Double)

/** Finished statistics: sample variance (n-1 denominator, matching SQL var_samp). */
final case class MeanVar(n: Long, mean: Double, variance: Double)

/** Distributed mean/variance with Welford update + Chan parallel merge — the Scala
  * rendering of the reference's `combineByKey(feature_to_c, features_merge_c,
  * merge_feature_cs)` (/root/reference/outlier_detection.py:57-101): createCombiner +
  * mergeValue are [[update]] running inside each partition (partial aggregation),
  * mergeCombiners is [[merge]] in the reduce — exactly the split Spark plans for an
  * Aggregator.
  *
  * The reference's merge mis-transcribes Chan's formula (`pow(n1*(m1-m), 2)` instead
  * of `n1*(m1-m)**2`, outlier_detection.py:98 — SURVEY.md §4 quirk 1); we implement
  * the correct form and cross-check against SQL `var_samp` (q45 + WelfordSpec).
  */
object Welford {
  val zero: WelfordBuf = WelfordBuf(0L, 0.0, 0.0)

  def update(b: WelfordBuf, x: Double): WelfordBuf = {
    val n = b.n + 1
    val delta = x - b.mean
    val mean = b.mean + delta / n
    WelfordBuf(n, mean, b.m2 + delta * (x - mean))
  }

  def merge(a: WelfordBuf, b: WelfordBuf): WelfordBuf =
    if (a.n == 0) b
    else if (b.n == 0) a
    else {
      val n = a.n + b.n
      val delta = b.mean - a.mean
      WelfordBuf(n, a.mean + delta * b.n / n,
        a.m2 + b.m2 + delta * delta * (a.n.toDouble * b.n.toDouble) / n)
    }

  def finish(b: WelfordBuf): MeanVar =
    MeanVar(b.n, b.mean, if (b.n > 1) b.m2 / (b.n - 1) else 0.0)
}

/** Scalar Welford aggregator: usable typed (`ds.groupByKey.agg(new WelfordAgg().toColumn)`)
  * or untyped via `functions.udaf(new WelfordAgg)`. */
class WelfordAgg extends Aggregator[Double, WelfordBuf, MeanVar] {
  override def zero: WelfordBuf = Welford.zero
  override def reduce(b: WelfordBuf, x: Double): WelfordBuf = Welford.update(b, x)
  override def merge(a: WelfordBuf, b: WelfordBuf): WelfordBuf = Welford.merge(a, b)
  override def finish(b: WelfordBuf): MeanVar = Welford.finish(b)
  override def bufferEncoder: Encoder[WelfordBuf] = Encoders.product[WelfordBuf]
  override def outputEncoder: Encoder[MeanVar] = Encoders.product[MeanVar]
}

/** Element-wise Welford over fixed-length arrays — one state per channel, the shape
  * of the reference's per-channel statistics (outlier_detection.py:64-65: one
  * `[n, mean, var]` combiner per channel). */
class WelfordArrayAgg extends Aggregator[Seq[Double], Seq[WelfordBuf], Seq[MeanVar]] {
  override def zero: Seq[WelfordBuf] = Seq.empty
  override def reduce(b: Seq[WelfordBuf], xs: Seq[Double]): Seq[WelfordBuf] = {
    val base = if (b.isEmpty) Seq.fill(xs.length)(Welford.zero) else b
    require(base.length == xs.length,
      s"ragged channel arrays: state has ${base.length} channels, row has ${xs.length}")
    base.lazyZip(xs).map(Welford.update)
  }
  override def merge(a: Seq[WelfordBuf], b: Seq[WelfordBuf]): Seq[WelfordBuf] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      require(a.length == b.length,
        s"ragged channel arrays: merging ${a.length} with ${b.length} channels")
      a.lazyZip(b).map(Welford.merge)
    }
  override def finish(b: Seq[WelfordBuf]): Seq[MeanVar] = b.map(Welford.finish)
  override def bufferEncoder: Encoder[Seq[WelfordBuf]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[WelfordBuf]]()
  override def outputEncoder: Encoder[Seq[MeanVar]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[MeanVar]]()
}
