package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types._

/** TOP-K SEGMENT PRUNING — `ORDER BY x DESC LIMIT k` (and its ASC NULLS
  * LAST mirror) over a graft table reads only the segments that can
  * possibly contain the top (bottom) k rows:
  *
  * Every committed segment publishes exact zone stats (rows, per-column
  * min/max/nulls). For the sort column x, a segment with min m and n
  * non-null rows GUARANTEES n values ≥ m. Sorting segments by min
  * descending and accumulating those guarantees until they cover k yields a
  * sound threshold τ: at least k values in the table are ≥ τ, so the k-th
  * largest value is ≥ τ and NO row with x < τ can be in the top k. The rule
  * injects `x >= τ` under the Sort; the ordinary pushdown then zone-prunes
  * every segment whose max < τ — plan-time, zero IO. The ASC NULLS LAST
  * mirror runs the same construction on MAX bounds: a segment with max M
  * and n non-null rows guarantees n values ≤ M; accumulating maxes
  * ascending gives τ with ≥ k values ≤ τ, injecting `x <= τ`.
  *
  * WHERE composition (r19): a WHERE whose every conjunct is a range
  * predicate on the SORT COLUMN itself (or `IsNotNull(x)`) tightens rather
  * than voids the guarantee. The conjuncts fold to one inclusive interval
  * [lo, hi]; a segment whose whole value range lies INSIDE the interval
  * keeps every non-null row through the filter, so its (bound, n)
  * guarantee holds for the SURVIVING rows. τ accumulates over those
  * fully-contained segments only, and the injected bound composes with the
  * user filter (which stays in place untouched). "Best k since date X" /
  * "cheapest k above floor Y" prune like plain top-k. A filter touching
  * any OTHER column still falls back — it changes row counts the guarantee
  * can't see.
  *
  * At 100 TB this is "give me the k best-scoring documents" — the daily
  * training-data curation query — reading the handful of segments whose
  * score range reaches the cut, instead of the whole corpus; on a
  * z-ordered/clustered score column the cut is a few cells.
  *
  * Soundness gates (all conservative — when in doubt, scan everything):
  *   - NULLS LAST only (DESC's default; ASC must spell it explicitly —
  *     ASC's NULLS FIRST default puts nulls at the top, where τ cannot
  *     speak for them): once ≥ k non-null values provably make the cut,
  *     nulls can never displace them, so the injected filter dropping
  *     nulls is safe;
  *   - the accumulated non-null guarantee must reach k, else no rewrite;
  *   - statless segments contribute nothing to τ (they can only make it
  *     weaker) and are never zone-pruned by the injected filter;
  *   - DELETE VECTORS weaken rather than void (r19): stats count vectored
  *     rows, so each dv's footer-only TOTAL row count subtracts from every
  *     segment it touches before the guarantee accumulates — top-k keeps
  *     pruning on a continuously-updated MOR corpus, with τ conservatively
  *     shallower; > 16 dv dirs fall back to the full scan;
  *   - integral/date/timestamp sort columns only (the zone long domain);
  *   - the derived bound must STRICTLY tighten the interval, so the
  *     fixed-point optimizer converges after one injection (re-deriving τ
  *     under its own filter reproduces τ, which is not an improvement). */
private[graft] final class GraftTopKPrune(session: SparkSession)
  extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUpWithSubqueries {
    case lim @ Limit(IntegerLiteral(k), s @ Sort(order, true, child, _)) if k > 0 =>
      rewrite(k, order, child) match {
        case Some(newChild) => Limit(Literal(k), s.copy(child = newChild))
        case None => lim
      }
  }

  private def litLong(l: Literal): Option[Long] = l.value match {
    case b: Byte  => Some(b.toLong)
    case s: Short => Some(s.toLong)
    case i: Int   => Some(i.toLong)
    case j: Long  => Some(j)
    case _        => None
  }

  /** Fold filter conjuncts into one inclusive long interval over `attr`;
    * None = some conjunct is not a range predicate on attr (fall back). */
  private def interval(conds: Seq[Expression], attr: AttributeReference)
    : Option[(Long, Long)] = {
    var lo = Long.MinValue
    var hi = Long.MaxValue
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other     => Seq(other)
    }
    conds.flatMap(conjuncts).foreach {
      case IsNotNull(a: AttributeReference) if a.exprId == attr.exprId =>
      // nulls are excluded from the guarantee (rows - nulls) already
      case GreaterThanOrEqual(a: AttributeReference, l: Literal) if a.exprId == attr.exprId =>
        lo = math.max(lo, litLong(l).getOrElse(return None))
      case LessThanOrEqual(l: Literal, a: AttributeReference) if a.exprId == attr.exprId =>
        lo = math.max(lo, litLong(l).getOrElse(return None))
      case GreaterThan(a: AttributeReference, l: Literal) if a.exprId == attr.exprId =>
        val v = litLong(l).getOrElse(return None)
        if (v == Long.MaxValue) return None
        lo = math.max(lo, v + 1)
      case LessThan(l: Literal, a: AttributeReference) if a.exprId == attr.exprId =>
        val v = litLong(l).getOrElse(return None)
        if (v == Long.MaxValue) return None
        lo = math.max(lo, v + 1)
      case LessThanOrEqual(a: AttributeReference, l: Literal) if a.exprId == attr.exprId =>
        hi = math.min(hi, litLong(l).getOrElse(return None))
      case GreaterThanOrEqual(l: Literal, a: AttributeReference) if a.exprId == attr.exprId =>
        hi = math.min(hi, litLong(l).getOrElse(return None))
      case LessThan(a: AttributeReference, l: Literal) if a.exprId == attr.exprId =>
        val v = litLong(l).getOrElse(return None)
        if (v == Long.MinValue) return None
        hi = math.min(hi, v - 1)
      case GreaterThan(l: Literal, a: AttributeReference) if a.exprId == attr.exprId =>
        val v = litLong(l).getOrElse(return None)
        if (v == Long.MinValue) return None
        hi = math.min(hi, v - 1)
      case EqualTo(a: AttributeReference, l: Literal) if a.exprId == attr.exprId =>
        val v = litLong(l).getOrElse(return None)
        lo = math.max(lo, v); hi = math.min(hi, v)
      case EqualTo(l: Literal, a: AttributeReference) if a.exprId == attr.exprId =>
        val v = litLong(l).getOrElse(return None)
        lo = math.max(lo, v); hi = math.min(hi, v)
      case _ => return None
    }
    Some((lo, hi))
  }

  private def rewrite(k: Int, order: Seq[SortOrder],
                      child: LogicalPlan): Option[LogicalPlan] = {
    val (leading, descending) = order.headOption match {
      case Some(SortOrder(a: AttributeReference, Descending, NullsLast, _)) => (a, true)
      // ASC's default is NULLS FIRST (nulls belong at the top, out of τ's
      // reach) — only an EXPLICIT NULLS LAST opts into the mirror
      case Some(SortOrder(a: AttributeReference, Ascending, NullsLast, _)) => (a, false)
      case _ => return None
    }
    // peel attribute-only Projects and Filters down to the relation,
    // collecting filter predicates (validated against the sort column below)
    def peel(p: LogicalPlan, conds: Seq[Expression])
      : Option[(DataSourceV2Relation, GraftTable, Seq[Expression])] = p match {
      case Filter(cond, c) => peel(c, conds :+ cond)
      case Project(list, c) if list.forall(_.isInstanceOf[AttributeReference]) =>
        peel(c, conds)
      case rel @ DataSourceV2Relation(t: GraftTable, _, Some(_: GraftCatalog), Some(_), opts, tt)
          if opts.isEmpty && tt.isEmpty && !t.pinned =>
        Some((rel, t, conds))
      case _ => None
    }
    val (rel, table, conds) = peel(child, Nil).getOrElse(return None)
    if (!rel.output.exists(_.exprId == leading.exprId)) return None
    val dt = leading.dataType
    val integral = dt match {
      case ByteType | ShortType | IntegerType | LongType | DateType | TimestampType => true
      case _ => false
    }
    if (!integral) return None
    // every filter conjunct must be a range predicate on the SORT column
    // (any other predicate invalidates the row-count guarantees)
    val (lo, hi) = interval(conds, leading).getOrElse(return None)
    if (lo > hi) return None // unsatisfiable filter: leave the plan alone

    val meta = table.metaAtLoad
    val segs = meta.snapshots.getOrElse(meta.current, Nil)
    if (segs.isEmpty) return None
    // delete vectors WEAKEN the row-count guarantees instead of voiding the
    // rewrite (r19): each dv dir's TOTAL row count (parquet footers only,
    // zero data IO) subtracts from EVERY segment it touches — a vector
    // spanning several segments over-subtracts, which only shrinks τ's
    // reach, never unsounds it (and nulls among deleted rows likewise).
    // Bounded: > 16 dv dirs (an uncompacted delete storm) keeps the old
    // full-scan fallback rather than paying per-plan footer reads.
    val dvs = GraftDv.forSegments(meta, meta.current, segs)
    val dvPenalty: Map[String, Long] =
      if (dvs.isEmpty) Map.empty
      else {
        val dirs = dvs.values.flatten.toSeq.distinct
        if (dirs.size > 16) return None
        val counts = dirs.map(d => d -> GraftDv.rowCountUpperBound(table.dir, d)).toMap
        if (counts.values.exists(_ < 0)) return None
        dvs.map { case (seg, ds) => seg -> ds.map(counts).sum }
      }

    // (min, max, guaranteed non-null LIVE count) per stats-bearing segment;
    // only segments FULLY INSIDE the filter interval keep all their
    // non-null rows through the filter, so only they may vouch for τ
    val guarantees = segs.flatMap { s =>
      for {
        enc <- meta.zstats.get(s)
        st <- scala.util.Try(SegmentStats.decode(enc)).toOption
        c <- st.cols.get(leading.name)
        mn <- c.min.flatMap(v => scala.util.Try(v.toLong).toOption)
        mx <- c.max.flatMap(v => scala.util.Try(v.toLong).toOption)
        if lo <= mn && mx <= hi
      } yield (mn, mx, st.rows - c.nulls - dvPenalty.getOrElse(s, 0L))
    }
    val ranked =
      if (descending) guarantees.sortBy(_._1)(Ordering[Long].reverse)
      else guarantees.sortBy(_._2)
    var cum = 0L
    var tau: Option[Long] = None
    for ((mn, mx, nn) <- ranked if cum < k) {
      cum += math.max(0L, nn)
      tau = Some(if (descending) mn else mx)
    }
    val t = tau.filter(_ => cum >= k).getOrElse(return None)
    // strict improvement over the existing interval, or the fixed-point
    // optimizer would re-derive the same bound forever
    if (descending && t <= lo) return None
    if (!descending && t >= hi) return None

    val lit = dt match {
      case ByteType               => Literal(t.toByte, dt)
      case ShortType              => Literal(t.toShort, dt)
      case IntegerType | DateType => Literal(t.toInt, dt)
      case _                      => Literal(t, dt)
    }
    val dir = if (descending) "DESC" else "ASC NULLS LAST"
    val cut = if (descending) ">=" else "<="
    logInfo(s"graft: top-$k over ${table.name()} ORDER BY ${leading.name} $dir " +
      s"prunes to segments reaching $cut $t (zone-stat guarantee)")
    val cmp: Expression =
      if (descending) GreaterThanOrEqual(leading, lit)
      else LessThanOrEqual(leading, lit)
    // inject the bound directly above the relation; the user's own filter
    // (if any) stays exactly where it was
    Some(child.transformUp {
      case r: DataSourceV2Relation if r eq rel => Filter(cmp, rel)
    })
  }
}
