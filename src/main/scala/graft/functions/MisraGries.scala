package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters sketch as a Spark `Aggregator` — the mergeable
  * frequent-items summary (Misra & Gries 1982; merge rule per Agarwal et al.,
  * "Mergeable Summaries", PODS 2012).
  *
  * State is at most `k` (item, counter) pairs per partial aggregate. The
  * guarantee that makes it usable at 100 TB: after any sequence of reduces and
  * merges, every item whose true frequency exceeds n/k is present in the
  * summary (counters under-estimate by at most n/k). So the sketch yields a
  * small CANDIDATE superset in one pass with map-side partial aggregation, and
  * an exact recheck — a candidates-broadcast semi join + count — restores a
  * deterministic, partitioning-independent result (q124). The sketch alone is
  * order-dependent; only the rechecked set is declared.
  *
  * This is the same partial/merge/finish contract as the reference's
  * combineByKey statistics (outlier_detection.py:57-101), applied to frequency
  * summaries instead of moments.
  */
final class MisraGries(k: Int)
    extends Aggregator[String, Map[String, Long], Seq[String]] {
  require(k > 0)

  override def zero: Map[String, Long] = Map.empty

  /** Classic MG step: hit → increment; room → insert; full → decrement all
    * (dropping zeros), which charges one occurrence of each tracked item and
    * the new item against the error budget. */
  override def reduce(buf: Map[String, Long], item: String): Map[String, Long] =
    buf.get(item) match {
      case Some(c) => buf.updated(item, c + 1)
      case None if buf.size < k => buf.updated(item, 1L)
      case None =>
        buf.flatMap { case (i, c) => if (c > 1) Some(i -> (c - 1)) else None }
    }

  /** Mergeable-summaries rule: add counters pointwise, then if more than k
    * survive, subtract the (k+1)-th largest counter from all and keep the
    * strictly positive — the merged summary keeps the n/k guarantee. */
  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (m, (i, c)) =>
      m.updated(i, m.getOrElse(i, 0L) + c)
    }
    if (sum.size <= k) sum
    else {
      val cut = sum.valuesIterator.toArray.sorted(Ordering[Long].reverse).apply(k)
      sum.flatMap { case (i, c) => if (c > cut) Some(i -> (c - cut)) else None }
    }
  }

  /** Candidate items, sorted for a deterministic array (the declared query
    * re-checks them exactly, so order is cosmetic). */
  override def finish(buf: Map[String, Long]): Seq[String] =
    buf.keysIterator.toSeq.sorted

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()

  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}
