package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable bounded top-k: the aggregation-shaped alternative to the window
  * `row_number() <= k` idiom (q17/q106). State is at most `k` (score, id) pairs
  * per partial aggregate, kept sorted best-first with the deterministic total
  * order (score DESC, id ASC).
  *
  * Why it matters at 100 TB: the window form shuffles and sorts EVERY row of a
  * group to keep k of them; this form partial-aggregates map-side, so only
  * (groups × k) pairs cross the wire, and on the hot path (a row worse than the
  * current k-th) `reduce` is a single comparison with ZERO allocation. Same
  * partial/merge/finish contract as [[Welford]] and [[MisraGries]] — the third
  * member of the mergeable-summaries family, except this one is EXACT: top-k
  * under a total order is itself a mergeable semigroup, no recheck needed.
  *
  * The result is partitioning-independent because the order is total (ids are
  * unique), so the declared query hash-matches a ROW_NUMBER oracle.
  */
final class TopK(k: Int)
    extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {
  require(k > 0)

  /** score DESC, id ASC — a total order (ids unique by contract). */
  private def better(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Seq[(Long, Long)] = Vector.empty

  override def reduce(buf: Seq[(Long, Long)], row: (Long, Long)): Seq[(Long, Long)] =
    if (buf.size >= k && !better(row, buf.last)) buf // hot path: no allocation
    else insert(buf, row)

  private def insert(buf: Seq[(Long, Long)], row: (Long, Long)): Seq[(Long, Long)] = {
    val i = buf.indexWhere(b => better(row, b)) match {
      case -1 => buf.size
      case j  => j
    }
    (buf.take(i) :+ row) ++ buf.drop(i).take(k - i - 1)
  }

  /** Merge two sorted summaries: k-bounded merge of sorted runs. */
  override def merge(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] = {
    val out = Vector.newBuilder[(Long, Long)]
    var (i, j, n) = (0, 0, 0)
    while (n < k && (i < a.size || j < b.size)) {
      val takeA = j >= b.size || (i < a.size && better(a(i), b(j)))
      if (takeA) { out += a(i); i += 1 } else { out += b(j); j += 1 }
      n += 1
    }
    out.result()
  }

  override def finish(buf: Seq[(Long, Long)]): Seq[(Long, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()

  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
}
