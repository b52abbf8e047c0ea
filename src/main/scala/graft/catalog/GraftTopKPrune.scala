package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types._

/** TOP-K SEGMENT PRUNING — `ORDER BY x DESC LIMIT k` over a graft table
  * reads only the segments that can possibly contain the top k rows:
  *
  * Every committed segment publishes exact zone stats (rows, per-column
  * min/max/nulls). For the sort column x, a segment with min m and n
  * non-null rows GUARANTEES n values ≥ m. Sorting segments by min
  * descending and accumulating those guarantees until they cover k yields a
  * sound threshold τ: at least k values in the table are ≥ τ, so the k-th
  * largest value is ≥ τ and NO row with x < τ can be in the top k. The rule
  * injects `x >= τ` under the Sort; the ordinary pushdown then zone-prunes
  * every segment whose max < τ — plan-time, zero IO.
  *
  * At 100 TB this is "give me the k best-scoring documents" — the daily
  * training-data curation query — reading the handful of segments whose
  * score range reaches the cut, instead of the whole corpus; on a
  * z-ordered/clustered score column the cut is a few cells.
  *
  * Soundness gates (all conservative — when in doubt, scan everything):
  *   - DESCENDING order with NULLS LAST only (Spark's DESC default): nulls
  *     can never be in the top k when ≥ k non-null values exist, which τ's
  *     construction proves, so dropping them with the filter is safe.
  *     (ASC's default is NULLS FIRST — nulls belong at the top; refused.)
  *   - the accumulated non-null guarantee must reach k, else no rewrite;
  *   - statless segments contribute nothing to τ (they can only make it
  *     smaller) and are never pruned by the injected filter;
  *   - DELETE VECTORS void the row-count guarantees (stats count vectored
  *     rows) — any DV on the current snapshot disables the rule;
  *   - integral/date/timestamp sort columns only (the zone long domain);
  *   - the sort child must be the bare relation (or an attribute-only
  *     Project): a user WHERE may invalidate row counts the same way DVs
  *     do, so filtered top-k keeps the plain plan. */
private[graft] final class GraftTopKPrune(session: SparkSession)
  extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUpWithSubqueries {
    case lim @ Limit(IntegerLiteral(k), s @ Sort(order, true, child, _)) if k > 0 =>
      rewrite(k, order, child) match {
        case Some(newChild) => Limit(Literal(k), s.copy(child = newChild))
        case None => lim
      }
  }

  private def rewrite(k: Int, order: Seq[SortOrder],
                      child: LogicalPlan): Option[LogicalPlan] = {
    val leading = order.headOption match {
      case Some(SortOrder(a: AttributeReference, Descending, NullsLast, _)) => a
      case _ => return None
    }
    // bare relation or attribute-only Project; anything else (Filter, join,
    // aggregate) changes the row counts the guarantee is built from
    val (rel, table, project) = child match {
      case rel @ DataSourceV2Relation(t: GraftTable, _, Some(_: GraftCatalog), Some(_), opts, tt)
          if opts.isEmpty && tt.isEmpty && !t.pinned =>
        (rel, t, None)
      case p @ Project(list, rel @ DataSourceV2Relation(t: GraftTable, _,
          Some(_: GraftCatalog), Some(_), opts, tt))
          if list.forall(_.isInstanceOf[AttributeReference]) &&
            opts.isEmpty && tt.isEmpty && !t.pinned =>
        (rel, t, Some(p))
      case _ => return None
    }
    if (!rel.output.exists(_.exprId == leading.exprId)) return None
    val dt = leading.dataType
    val integral = dt match {
      case ByteType | ShortType | IntegerType | LongType | DateType | TimestampType => true
      case _ => false
    }
    if (!integral) return None

    val meta = table.metaAtLoad
    val segs = meta.snapshots.getOrElse(meta.current, Nil)
    if (segs.isEmpty) return None
    // delete vectors void the row-count guarantees (stats include vectored rows)
    if (GraftDv.forSegments(meta, meta.current, segs).nonEmpty) return None

    // (min, guaranteed non-null count) per stats-bearing segment
    val guarantees = segs.flatMap { s =>
      for {
        enc <- meta.zstats.get(s)
        st <- scala.util.Try(SegmentStats.decode(enc)).toOption
        c <- st.cols.get(leading.name)
        mn <- c.min.flatMap(v => scala.util.Try(v.toLong).toOption)
      } yield (mn, st.rows - c.nulls)
    }
    var cum = 0L
    var tau = Long.MinValue
    for ((mn, nn) <- guarantees.sortBy(-_._1) if cum < k) {
      cum += math.max(0L, nn)
      tau = mn
    }
    if (cum < k || tau == Long.MinValue) return None

    val lit = dt match {
      case ByteType               => Literal(tau.toByte, dt)
      case ShortType              => Literal(tau.toShort, dt)
      case IntegerType | DateType => Literal(tau.toInt, dt)
      case _                      => Literal(tau, dt)
    }
    logInfo(s"graft: top-$k over ${table.name()} ORDER BY ${leading.name} DESC " +
      s"prunes to segments reaching >= $tau (zone-stat guarantee)")
    val filtered = Filter(GreaterThanOrEqual(leading, lit), rel)
    Some(project match {
      case Some(p) => p.copy(child = filtered)
      case None    => filtered
    })
  }
}
