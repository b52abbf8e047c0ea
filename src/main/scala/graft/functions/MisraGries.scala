package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
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
  * The buffer is a MUTABLE `java.util.HashMap` mutated in place: `reduce` runs
  * once per input row, so an immutable per-row rebuild (the round-5 shape) is
  * pure GC churn at stream scale. Spark's Aggregator contract explicitly
  * permits mutating and returning the buffer; the buffer only serializes at
  * partial/merge boundaries (≤ k entries, kryo), never per row.
  *
  * This is the same partial/merge/finish contract as the reference's
  * combineByKey statistics (outlier_detection.py:57-101), applied to frequency
  * summaries instead of moments.
  */
final class MisraGries(k: Int)
    extends Aggregator[String, java.util.HashMap[String, java.lang.Long], Seq[String]] {
  require(k > 0)

  type Buf = java.util.HashMap[String, java.lang.Long]

  override def zero: Buf = new java.util.HashMap[String, java.lang.Long](k * 2)

  /** Classic MG step: hit → increment; room → insert; full → decrement all
    * (dropping zeros), which charges one occurrence of each tracked item and
    * the new item against the error budget. In-place: one hash probe on the
    * hot (hit) path, no allocation. */
  override def reduce(buf: Buf, item: String): Buf = {
    val c = buf.get(item)
    if (c != null) buf.put(item, c + 1L)
    else if (buf.size < k) buf.put(item, 1L)
    else {
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val v = e.getValue - 1L
        if (v <= 0L) it.remove() else e.setValue(v)
      }
    }
    buf
  }

  /** Mergeable-summaries rule: add counters pointwise, then if more than k
    * survive, subtract the (k+1)-th largest counter from all and keep the
    * strictly positive — the merged summary keeps the n/k guarantee. */
  override def merge(a: Buf, b: Buf): Buf = {
    val bit = b.entrySet().iterator()
    while (bit.hasNext) {
      val e = bit.next()
      val prev = a.get(e.getKey)
      a.put(e.getKey, if (prev == null) e.getValue else java.lang.Long.valueOf(prev + e.getValue))
    }
    if (a.size > k) {
      val vals = new Array[Long](a.size)
      var i = 0
      val vit = a.values().iterator()
      while (vit.hasNext) { vals(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val cut = vals(vals.length - 1 - k) // the (k+1)-th largest counter
      val ait = a.entrySet().iterator()
      while (ait.hasNext) {
        val e = ait.next()
        val v = e.getValue - cut
        if (v <= 0L) ait.remove() else e.setValue(v)
      }
    }
    a
  }

  /** Candidate items, sorted for a deterministic array (the declared query
    * re-checks them exactly, so order is cosmetic). */
  override def finish(buf: Buf): Seq[String] = {
    val arr = buf.keySet().toArray(new Array[String](buf.size))
    java.util.Arrays.sort(arr.asInstanceOf[Array[AnyRef]])
    arr.toSeq
  }

  /** Kryo: the buffer is an opaque ≤ k-entry map that only crosses the wire at
    * partial-aggregate boundaries — binary encoding is exactly right here. */
  override def bufferEncoder: Encoder[Buf] =
    Encoders.kryo[java.util.HashMap[String, java.lang.Long]]

  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}
