package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Band (interval) join optimization — the one operator family where Catalyst's
  * default plan genuinely fails at scale.
  *
  * A join whose condition is a pure range band
  * {{{ left.p >= right.lo AND left.p <= right.hi }}}
  * has no equi conjunct, so Spark plans BroadcastNestedLoopJoin (or
  * CartesianProduct): O(|L|·|R|) comparisons. At 100 TB that plan never finishes.
  * The standard fix (Flink's interval join, Databricks' range-join optimization)
  * is time-bucketing:
  *
  *   - point side:     add `bucket = floorDiv(p, W)` — one bucket per row;
  *   - interval side:  explode `sequence(floorDiv(lo, W), floorDiv(hi, W))` — one
  *                     row per covered bucket (intervals spanning k buckets fan out
  *                     k ways, k ≈ band/W + 1);
  *   - join on bucket equality AND the original condition.
  *
  * Every qualifying pair (lo ≤ p ≤ hi) meets in exactly one bucket — the point's —
  * because the point contributes a single bucket and the interval's exploded buckets
  * are distinct, so no dedup is needed and the rewrite is exact. The equi key turns
  * the plan into a shuffled hash / sort-merge join: O(|L| + k·|R|) with a single
  * pair of exchanges, which scales linearly and partitions like any other keyed join.
  *
  * Correctness does not depend on the bucket width W (only performance does): the
  * bucket function is monotone in the value, so lo ≤ p ≤ hi implies
  * bucket(lo) ≤ bucket(p) ≤ bucket(hi) and the sequence always covers the point's
  * bucket. Monotonicity is guaranteed by computing EVERY bucket through one code
  * path per type family: exact long floor-division of unix micros for timestamps,
  * round-to-nearest double division + floor for numerics (double division by a
  * positive constant is monotone non-decreasing even with rounding).
  *
  * Fires only when the join would otherwise be nested-loop: a deterministic
  * condition containing NO cross-side equality (anything Spark can already
  * hash-join is left alone). Inner and cross joins rewrite unconditionally;
  * left-semi, left-anti, and left-outer band joins ("events not inside any
  * maintenance window") rewrite when the point is on the preserved side and the
  * band is statically bounded — see [[build]] for why those two restrictions are
  * load-bearing. Guards: null points/bounds bucket to null /
  * empty sequences and drop, matching the naive join's null-comparison semantics;
  * an inverted band (lo > hi) yields an empty sequence, not a Sequence runtime
  * error. Interval rows bucketing cannot represent faithfully — NaN or infinite
  * bounds, bands wider than maxFanout buckets — are split into a guarded
  * nested-loop fallback branch and unioned back (see [[build]]), so the rewrite
  * stays exact on the full IEEE domain and can never explode a sequence.
  *
  * Config (read at optimization time; malformed values fall back to defaults
  * rather than poisoning the optimizer for every query):
  *   - `spark.graft.intervalJoin.enabled`      (default true)
  *   - `spark.graft.intervalJoin.bucketWidth`  (seconds for timestamp/date
  *     bands, plain value units for numeric bands). UNSET by default: a
  *     fixed-width band (`hi = lo + C`) auto-derives W = C — at most 2 buckets
  *     per interval row — and other shapes fall back to 3600. A width far
  *     smaller than the band fans the interval side out; far larger degrades
  *     toward per-bucket cartesian. Width affects speed only, never results.
  *   - `spark.graft.intervalJoin.maxFanout`    (default 4096) — bands spanning at
  *     least this many buckets take the nested-loop fallback instead of exploding.
  *
  * The reference never needed this (its joins are all keyed — e.g. the outlier
  * pipeline groups by feature name, /root/reference/outlier_detection.py:57), but
  * SURVEY.md §2b declares range joins as part of the engine contract and this is
  * the piece Spark lacks whole-plan support for.
  */
object IntervalJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val EnabledKey   = "spark.graft.intervalJoin.enabled"
  val WidthKey     = "spark.graft.intervalJoin.bucketWidth"
  val MaxFanoutKey = "spark.graft.intervalJoin.maxFanout"
  /** Escape hatch for the retry-stability guard below: set true to let the
    * id-tagged semi/anti/full-outer rewrites fire even when the tagged side's
    * per-partition row order is not provably reproducible under task retry
    * (acceptable when shuffle-fetch failures and speculation are rare/disabled). */
  val UnstableTagsKey = "spark.graft.intervalJoin.allowUnstableTags"

  /** Marks the split plan's nested-loop fallback join: it is a pure band join by
    * construction, so without the tag the fixed-point batch would re-rewrite it
    * every iteration and never converge. */
  private val fallbackTag =
    new org.apache.spark.sql.catalyst.trees.TreeNodeTag[Unit]("graft.intervalJoin.fallback")

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // Defensive conf parsing: a malformed value must not make the optimizer throw
    // for every query in the session — fall back to defaults instead.
    val enabled = scala.util.Try(
      conf.getConfString(EnabledKey, "true").toBoolean).getOrElse(true)
    if (!enabled) return plan
    // None = unset or invalid -> auto-derive from the band when fixed-width,
    // else the 3600 default
    val widthOpt = scala.util.Try(conf.getConfString(WidthKey, "").toDouble)
      .toOption.filter(w => w > 0 && !w.isInfinite && !w.isNaN)
    // Clamp well under Int.MaxValue: a huge conf value would disarm the span
    // guard and let sequence() attempt >2^31 elements at runtime.
    val maxFanout = scala.util.Try(conf.getConfString(MaxFanoutKey, "4096").toDouble)
      .toOption.filter(k => k > 0).map(k => math.min(k, 1e8)).getOrElse(4096.0)
    plan.transformUp {
      case j @ Join(_, _, jt, Some(cond), _)
          if supportedJoinType(jt) && cond.deterministic &&
            j.getTagValue(fallbackTag).isEmpty =>
        rewrite(j, widthOpt, maxFanout).getOrElse(j)
    }
  }

  /** Inner/cross rewrite unconditionally (with fallback when needed); semi, anti,
    * left-outer, and right-outer rewrite only in the restricted shapes [[build]]
    * documents. */
  private def supportedJoinType(jt: org.apache.spark.sql.catalyst.plans.JoinType): Boolean =
    jt match {
      case Inner | Cross => true
      case org.apache.spark.sql.catalyst.plans.LeftSemi   => true
      case org.apache.spark.sql.catalyst.plans.LeftAnti   => true
      case org.apache.spark.sql.catalyst.plans.LeftOuter  => true
      case org.apache.spark.sql.catalyst.plans.RightOuter => true
      case org.apache.spark.sql.catalyst.plans.FullOuter  => true
      case _             => false
    }

  /** true = expression references only the left child (constants anchor nothing). */
  private def refSide(e: Expression, j: Join): Option[Boolean] =
    if (e.references.isEmpty) None
    else if (e.references.subsetOf(j.left.outputSet)) Some(true)
    else if (e.references.subsetOf(j.right.outputSet)) Some(false)
    else None

  private def crossSideEquality(a: Expression, b: Expression, j: Join): Boolean =
    (refSide(a, j), refSide(b, j)) match {
      case (Some(sa), Some(sb)) => sa != sb
      case _                    => false
    }

  /** Type family of a band: decides the bucket arithmetic and the width unit —
    * seconds for timestamps, days for dates, plain value units for numerics. */
  private sealed trait Family
  private case object TsFamily extends Family
  private case object DateFamily extends Family
  private case object NumFamily extends Family

  private def familyOf(t: DataType): Option[Family] = t match {
    case TimestampType  => Some(TsFamily)
    case DateType       => Some(DateFamily)
    case _: NumericType => Some(NumFamily)
    case _              => None
  }

  private def bucketable(t: DataType): Boolean = familyOf(t).isDefined

  private def sameFamily(a: DataType, b: DataType): Boolean =
    (familyOf(a), familyOf(b)) match {
      case (Some(fa), Some(fb)) => fa == fb
      case _                    => false
    }

  /** point, pointOnLeft, bound (opposite side), bound-is-lower. */
  private type BandBound = (Expression, Boolean, Expression, Boolean)

  private def rewrite(
      j: Join, widthOpt: Option[Double], maxFanout: Double): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(j.condition.get)
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b)       => crossSideEquality(a, b, j)
      case EqualNullSafe(a, b) => crossSideEquality(a, b, j)
      case _                   => false
    }
    if (hasEqui) return None

    val bounds: Seq[BandBound] = conjuncts.flatMap {
      case cmp: BinaryComparison =>
        val oriented: Seq[(Expression, Expression, Boolean)] = cmp match {
          // (point, bound, isLower): p > b / p >= b bounds p below; flip for the
          // other operand. Strictness is irrelevant for bucketing (the bucket
          // range is a superset; the original condition still filters).
          case GreaterThan(a, b)        => Seq((a, b, true), (b, a, false))
          case GreaterThanOrEqual(a, b) => Seq((a, b, true), (b, a, false))
          case LessThan(a, b)           => Seq((a, b, false), (b, a, true))
          case LessThanOrEqual(a, b)    => Seq((a, b, false), (b, a, true))
          case _                        => Nil
        }
        oriented.flatMap { case (p, bound, isLower) =>
          (refSide(p, j), refSide(bound, j)) match {
            case (Some(ps), Some(bs))
                if ps != bs && bucketable(p.dataType) &&
                  sameFamily(p.dataType, bound.dataType) =>
              Some((p, ps, bound, isLower)): Option[BandBound]
            case _ => None
          }
        }
      case _ => Nil
    }

    // A band = one point expression bounded below AND above from the other side.
    // build() can decline a group (semi/anti/outer shape limits), so try every
    // band group rather than committing to the first one. Groups are sorted by a
    // stable key: HashMap iteration order would make the chosen bucket key (and
    // the plan's performance) JVM/run-dependent when two groups qualify.
    bounds.groupBy { case (p, ps, _, _) => (p.canonicalized, ps) }
      .toSeq
      .sortBy { case ((p, ps), _) => (p.toString, ps) }
      .iterator
      .map(_._2)
      .filter(bs => bs.exists(_._4) && bs.exists(!_._4))
      .map { bs =>
        val (point, pointOnLeft, _, _) = bs.head
        val lo = bs.find(_._4).get._3
        val hi = bs.find(!_._4).get._3
        val family = familyOf(point.dataType).get
        val offUnits = fixedOffsetUnits(lo, hi, family)
        // No conf width? A fixed-width band is its own best width: W = C gives a
        // fan-out of at most 2 buckets per interval row. Width never affects
        // results (monotonicity argument above), so auto-deriving is safe.
        val width = widthOpt.getOrElse(defaultWidth(offUnits, family))
        build(j, point, pointOnLeft, lo, hi, width, maxFanout, family, offUnits)
      }
      .collectFirst { case Some(plan) => plan }
  }

  /** Conf-equivalent width (seconds for ts/date, value units for numerics) derived
    * from a fixed band offset; 3600 when the band shape is not statically known. */
  private def defaultWidth(offUnits: Option[Double], family: Family): Double =
    family match {
      case TsFamily   => offUnits.map(u => math.max(1.0, u / 1e6)).getOrElse(3600.0)
      case DateFamily => offUnits.map(d => math.max(86400.0, d * 86400.0)).getOrElse(3600.0)
      case NumFamily  => offUnits.filter(_ > 0).getOrElse(3600.0)
    }

  /** Exact floor division of longs: (a - pmod(a, w)) / w — correct for negative
    * values (pre-1970 timestamps), unlike truncating integer division. */
  private def floorDivLong(a: Expression, w: Long): Expression = {
    val wl = Literal(w)
    new IntegralDivide(new Subtract(a, new Pmod(a, wl)), wl)
  }

  /** Magnitude of a FIXED band offset — `hi = lo + C` (or `lo = hi - C`) with a
    * foldable C — in the family's width unit: micros for timestamps, days for
    * dates, plain value units for numerics. None when the band shape is not
    * base-plus-constant. Shapes: Add/Subtract carry numeric units, DateAdd/DateSub
    * whole days, the interval-add classes micros (or a day-carrying
    * CalendarInterval). */
  private def fixedOffsetUnits(
      lo: Expression, hi: Expression, family: Family): Option[Double] = {
    // Try-wrapped: a foldable offset that THROWS on evaluation (e.g. ANSI
    // arithmetic overflow in the constant) must degrade to None (non-static
    // band, fallback branch kept) rather than crash optimization of the query.
    def safeEval(e: Expression): Option[Any] = scala.util.Try(e.eval(null)).toOption
    def evalMicrosOrUnits(e: Expression): Option[Double] = safeEval(e).flatMap {
      case micros: java.lang.Long => Some(math.abs(micros.doubleValue()))
      case n: java.lang.Number    => Some(math.abs(n.doubleValue()))
      case ci: org.apache.spark.unsafe.types.CalendarInterval if ci.months == 0 =>
        Some(math.abs(ci.days * 86400e6 + ci.microseconds))
      case _ => None
    }
    def evalNum(e: Expression): Option[Double] = safeEval(e).flatMap {
      case n: java.lang.Number => Some(math.abs(n.doubleValue()))
      case _                   => None
    }
    def offsetUnits(b: BinaryExpression): Option[Double] =
      (b.getClass.getSimpleName, family) match {
        case ("Add" | "Subtract", NumFamily)     => evalNum(b.right)
        case ("DateAdd" | "DateSub", DateFamily) => evalNum(b.right) // days
        case ("TimestampAddInterval" | "TimeAddInterval" | "DatetimeSub", TsFamily) =>
          evalMicrosOrUnits(b.right)
        case ("DateAddInterval" | "DatetimeSub", DateFamily) =>
          evalMicrosOrUnits(b.right).map(_ / 86400e6) // micros -> days
        case _ => None
      }
    def offsetMagnitude(base: Expression, derived: Expression): Option[Double] =
      derived match {
        case d if d.semanticEquals(base) => Some(0.0)  // point band
        case b: BinaryExpression if b.left.semanticEquals(base) && b.right.foldable =>
          offsetUnits(b)
        case _ => None
      }
    offsetMagnitude(lo, hi).orElse(offsetMagnitude(hi, lo))
  }

  /** RETRY-STABILITY of monotonically_increasing_id tags (the semi/anti/full-outer
    * point-on-right paths collapse exploded copies by grouping on such an id).
    *
    * The hazard: the id is partitionIndex<<33 + rowPositionInPartition. If the
    * id-assigning map stage is PARTIALLY re-run after a shuffle-fetch failure
    * while some reduce partitions already fetched the old output, re-assigned ids
    * can differ and copies of one interval row split across two ids — duplicate
    * semi rows, spurious anti rows, extra full-outer null-extensions. Spark's
    * INDETERMINATE-stage rollback does NOT protect this: ProjectExec calls
    * mapPartitionsWithIndexInternal with the default isOrderSensitive=false
    * (verified against the spark-sql 4.1.2 bytecode — it passes $default$2/3),
    * so a nondeterministic projection above a shuffle is not tracked as
    * indeterminate (the long-standing SPARK-38388 class of issues).
    *
    * The ids are stable, however, whenever the tagged subtree reproduces each
    * partition's rows IN ORDER on retry: task N re-reads the same file splits /
    * local rows and re-derives the same positions. That holds for scan-rooted
    * subtrees of order-preserving, deterministic operators — the overwhelmingly
    * common band-join shape. This predicate is that conservative whitelist; the
    * id-tagged rewrites fire only when it holds (or the user sets
    * [[UnstableTagsKey]]), and otherwise decline so the join stays on Spark's
    * naive-but-exact nested-loop plan. */
  private def retryStableOrder(p: LogicalPlan): Boolean = p match {
    case Project(exprs, child)  => exprs.forall(_.deterministic) && retryStableOrder(child)
    case Filter(cond, child)    => cond.deterministic && retryStableOrder(child)
    case g: Generate            => g.generator.deterministic && retryStableOrder(g.child)
    case u: Union               => u.children.forall(retryStableOrder)
    // per-partition seeded sampling: same partition + same input order on retry
    case s: Sample              => retryStableOrder(s.child)
    case e: Expand =>
      e.projections.forall(_.forall(_.deterministic)) && retryStableOrder(e.child)
    case _: LocalRelation       => true
    case _: Range               => true // slice contents are a pure function of the range
    case l: LeafNode =>
      // File-based and v2 relations: splits are planned once on the driver, so a
      // retried task re-reads the same files in the same order. Anything else
      // (LogicalRDD over an arbitrary upstream RDD, streaming relations) is
      // conservatively unstable.
      l.getClass.getSimpleName match {
        case "LogicalRelation" | "DataSourceV2Relation" |
             "DataSourceV2ScanRelation" | "HiveTableRelation" | "OneRowRelation" => true
        case _ => false
      }
    case _ => false // joins/aggregates/windows/sorts/limits/repartitions shuffle
  }

  private def idTagsSafe(side: LogicalPlan): Boolean =
    scala.util.Try(conf.getConfString(UnstableTagsKey, "false").toBoolean)
      .getOrElse(false) || retryStableOrder(side)

  /** True when the band is fixed-width AND fits in maxFanout buckets. Such bands
    * need no nested-loop fallback: the explode is bounded by construction, and
    * IEEE specials degenerate consistently because both bounds derive from one
    * base value (lo NaN ⇒ hi NaN ⇒ both bucket to 0 and the re-checked original
    * condition decides; ±∞ + C stays ±∞ ⇒ a one-bucket sequence at the clamped
    * extreme). Mixed-specials bands (hi NaN while lo finite) cannot arise from a
    * fixed offset, and those are exactly the ones that break monotonicity.
    * Fractional bound types keep the fallback even so: a finite base near
    * Double.MaxValue can overflow to +Inf when the offset is added, giving a
    * finite start bucket and a Long.MaxValue stop bucket with no span guard.
    * Integral/timestamp arithmetic either cannot overflow silently or throws
    * identically in both plans (ANSI), so the proof holds there. */
  private def staticallyBounded(
      offUnits: Option[Double], lo: Expression, hi: Expression,
      width: Double, maxFanout: Double, family: Family): Boolean = {
    val fractional = Seq(lo.dataType, hi.dataType).exists {
      case FloatType | DoubleType => true
      case _                      => false
    }
    if (fractional) return false
    val widthUnits = family match {
      case TsFamily   => width * 1e6
      case DateFamily => widthDays(width).toDouble
      case NumFamily  => width
    }
    offUnits.exists(c => c.isFinite && c / widthUnits + 2 <= maxFanout)
  }

  /** Width in whole days for date bands: the conf is in seconds, floor-rounded up
    * to at least one day so a sub-day width still buckets sanely. */
  private def widthDays(width: Double): Long =
    math.max(1L, math.round(width / 86400.0))

  /** Build the split plan:
    *
    * {{{
    * Union
    * ├─ Project(j.output)                       -- bucketed branch (the common case)
    * │   └─ Join(bucket_p = bucket ∧ cond)
    * │       ├─ Project(point side + bucket_p)
    * │       └─ Generate(explode(buckets), Filter(NOT fallback?, interval side))
    * └─ Join(cond)                              -- nested-loop fallback (rare rows)
    *     ├─ point side
    *     └─ Filter(fallback?, interval side)
    * }}}
    *
    * `fallback?` routes an interval row to the nested-loop branch when bucketing
    * cannot represent it faithfully or affordably:
    *  - a NaN bound — Spark orders NaN above every value in comparisons, but
    *    `Floor` collapses NaN to bucket 0, breaking the monotonicity the exactness
    *    argument needs;
    *  - an infinite bound, or any band spanning ≥ maxFanout buckets — the explode
    *    would be unbounded (`sequence()` throws past 2³¹) or pathological. The
    *    span test runs in DOUBLE so ±∞ stays ±∞ instead of overflowing long
    *    arithmetic.
    * Null bounds stay on the bucketed branch (the span predicate is null →
    * coalesce(false)): they explode to zero buckets, matching the naive join's
    * null-comparison drop. NaN POINTS need no routing — their bucket is wrong but
    * the original condition re-filters every candidate pair, and a NaN point can
    * only ever satisfy a NaN upper bound, which routes its interval row to the
    * fallback. Both branches reuse the ORIGINAL child subtrees (same attribute
    * ids), so the Union's first-branch output is exactly `j.output` and parent
    * operators stay resolved.
    *
    * Returns None for join-type/shape combinations the rewrite cannot express
    * exactly. All non-inner shapes require a statically bounded band (no
    * fallback branch): a row matching in BOTH branches would double-emit, and
    * an anti must prove non-existence across branches. Per type:
    *  - left-outer: point on the LEFT (preserved) side — single mirror join;
    *  - right-outer: point on the RIGHT (preserved) side — single mirror join
    *    (the exploded interval side is the null-producing side, so unmatched
    *    point rows null-extend exactly once);
    *  - semi/anti with point on the LEFT: single join (interval side exploded
    *    is the non-preserved side);
    *  - semi/anti with point on the RIGHT: the preserved side IS the interval
    *    side, so exploding it duplicates preserved rows. Handled by tagging
    *    each interval row with a `monotonically_increasing_id` BEFORE the
    *    explode and collapsing copies after the join with a group-by on that
    *    id. Sound despite the id's nondeterminism because (a) the tagged
    *    subtree appears exactly ONCE in the plan — every copy of a row inherits
    *    the id assigned in the single evaluation, and duplicate original rows
    *    get distinct ids (preserving semi/anti multiplicity) — and (b) the
    *    rewrite fires only when [[retryStableOrder]] proves the ids are also
    *    reproducible under partial stage retry (or the user opts in via
    *    [[UnstableTagsKey]]). Anti additionally
    *    uses an OUTER generate (zero-bucket rows must be kept — a null/inverted
    *    band matches nothing, and anti keeps non-matching rows) plus a
    *    left-outer join against a literal-true match marker: a row passes iff
    *    max(marker) over its copies is null.
    *  - full-outer (either point side): one full-outer bucket join over the
    *    id-tagged outer-exploded interval side; a window over the interval id
    *    keeps matched pairs and unmatched point rows as-is and recovers exactly
    *    one null-extension per fully-unmatched interval row (see the case body).
    */
  private def build(
      j: Join,
      point: Expression,
      pointOnLeft: Boolean,
      lo: Expression,
      hi: Expression,
      width: Double,
      maxFanout: Double,
      family: Family,
      offUnits: Option[Double]): Option[LogicalPlan] = {
    import org.apache.spark.sql.catalyst.plans.{FullOuter, LeftAnti, LeftOuter, LeftSemi, RightOuter}
    val isInnerLike = j.joinType == Inner || j.joinType == Cross
    def bucket(e: Expression): Expression = family match {
      case TsFamily =>
        floorDivLong(UnixMicros(e), math.max(1L, (width * 1e6).toLong))
      case DateFamily =>
        floorDivLong(Cast(UnixDate(e), LongType), widthDays(width))
      case NumFamily =>
        Floor(new Divide(Cast(e, DoubleType), Literal(width)))
    }

    val startB = bucket(lo)
    val stopB  = bucket(hi)
    val needFallback = !staticallyBounded(offUnits, lo, hi, width, maxFanout, family)
    val shapeOk = j.joinType match {
      case Inner | Cross         => true
      case LeftOuter             => pointOnLeft && !needFallback
      case RightOuter            => !pointOnLeft && !needFallback
      // Point-on-right semi/anti and full-outer tag rows with monotonic ids;
      // require the tagged side(s) to reproduce row order under task retry
      // (see retryStableOrder) or an explicit user override.
      case LeftSemi | LeftAnti   =>
        !needFallback && (pointOnLeft || idTagsSafe(j.left))
      case FullOuter             => // both sides are id-tagged (id + pid)
        !needFallback && idTagsSafe(j.left) && idTagsSafe(j.right)
      case _                     => false
    }
    if (!shapeOk) return None

    def isNaN(e: Expression): Expression = e.dataType match {
      case FloatType | DoubleType => IsNaN(e)
      case _                      => Literal(false)
    }
    val spanTooBig = GreaterThanOrEqual(
      new Subtract(Cast(stopB, DoubleType), Cast(startB, DoubleType)),
      Literal(maxFanout))
    val toFallback =
      Coalesce(Seq(Or(Or(spanTooBig, isNaN(lo)), isNaN(hi)), Literal(false)))

    val intervalSide = if (pointOnLeft) j.right else j.left
    val pointSide    = if (pointOnLeft) j.left else j.right

    // bucketed branch --------------------------------------------------------
    val arrTpe = ArrayType(LongType, containsNull = false)
    val emptyArr = Literal.create(Array.empty[Long], arrTpe)
    // Guard: inverted band (lo > hi) or null bound → empty sequence → row drops,
    // exactly what the naive join's (null/false) comparison would do.
    val buckets = If(
      LessThanOrEqual(startB, stopB),
      // Sequence is TimeZoneAwareExpression: resolution demands a zone even for
      // long sequences, and optimizer-injected nodes skip ResolveTimeZone.
      new Sequence(startB, stopB, Some(Literal(1L)), Some(conf.sessionLocalTimeZone)),
      emptyArr)
    val bucketAttr = AttributeReference("__graft_ij_bucket", LongType, nullable = false)()
    val exploded = Generate(
      Explode(buckets),
      unrequiredChildIndex = Nil,
      outer = false,
      qualifier = None,
      generatorOutput = Seq(bucketAttr),
      child = if (needFallback) Filter(Not(toFallback), intervalSide) else intervalSide)
    val pointBucket = Alias(bucket(point), "__graft_ij_bucket_p")()
    val projected = Project(pointSide.output :+ pointBucket, pointSide)
    val eq = EqualTo(pointBucket.toAttribute, bucketAttr)
    val newCond = And(eq, j.condition.get)

    j.joinType match {
      case Inner | Cross =>
        val (nl, nr) = if (pointOnLeft) (projected, exploded) else (exploded, projected)
        // Original output attrs pass through untouched; strip the bucket columns.
        val bucketed = Project(j.output, Join(nl, nr, j.joinType, Some(newCond), j.hint))
        if (!needFallback) return Some(bucketed)
        // nested-loop fallback for the rare unbucketable interval rows
        val fallbackInterval = Filter(toFallback, intervalSide)
        val (fl, fr) = if (pointOnLeft) (pointSide, fallbackInterval)
                       else (fallbackInterval, pointSide)
        val fallback = Join(fl, fr, j.joinType, j.condition, j.hint)
        fallback.setTagValue(fallbackTag, ())
        Some(Union(Seq(bucketed, fallback)))

      // Existence tests and left-outer share one shape when the point is on the
      // preserved left side: the exploded interval side carries DISTINCT buckets
      // per original row, and the preserved left side is unchanged, so the
      // bucketed join equals the band join row-for-row — semi/anti existence per
      // left row, outer matched pairs + exactly one null-extension for unmatched
      // lefts. A single join also evaluates each child once (a Union of
      // inner + anti would re-evaluate children, double the cost, and break on
      // nondeterministic columns).
      case LeftSemi | LeftAnti | LeftOuter if pointOnLeft =>
        Some(Project(j.output,
          Join(projected, exploded, j.joinType, Some(newCond), j.hint)))

      // Mirror of the LeftOuter case: preserved point side on the right stays
      // unexploded; the left interval side explodes and is the null-producing
      // side, so unmatched rights null-extend exactly once.
      case RightOuter =>
        Some(Project(j.output,
          Join(exploded, projected, RightOuter, Some(newCond), j.hint)))

      // Semi/anti with the point on the RIGHT: the preserved (left) side is the
      // interval side. Tag each interval row with a monotonic id, explode, join,
      // then collapse copies by grouping on the id (see scaladoc for why the
      // single-use id is sound). Linear shape: one explode, one keyed join, one
      // hash agg on a unique key — no nested loop, no driver round-trip.
      case LeftSemi | LeftAnti =>
        import org.apache.spark.sql.catalyst.expressions.aggregate.{First, Max}
        val idAlias = Alias(MonotonicallyIncreasingID(), "__graft_ij_id")()
        val idProject = Project(intervalSide.output :+ idAlias, intervalSide)
        // Collapse copies back to one row per original id; copies are identical
        // in every original column, so First is exact. Aliases reuse the
        // original exprIds so parent operators stay resolved.
        def collapse(child: LogicalPlan, extraAgg: Seq[NamedExpression]): Aggregate = {
          val aggExprs = intervalSide.output.map { a =>
            Alias(new First(a).toAggregateExpression(), a.name)(
              exprId = a.exprId, qualifier = a.qualifier)
          } ++ extraAgg
          Aggregate(Seq(idAlias.toAttribute), aggExprs, child)
        }
        j.joinType match {
          case LeftSemi =>
            val explodedId = Generate(Explode(buckets), Nil, outer = false, None,
              Seq(bucketAttr), idProject)
            val joined = Join(explodedId, projected, LeftSemi, Some(newCond), j.hint)
            Some(Project(j.output, collapse(joined, Nil)))
          case _ => // LeftAnti
            // Outer generate: a zero-bucket row (null/inverted band) matches
            // nothing and anti must KEEP it. Its bucket is null, so it joins
            // nothing below.
            val bucketAttrN =
              AttributeReference("__graft_ij_bucket", LongType, nullable = true)()
            val explodedId = Generate(Explode(buckets), Nil, outer = true, None,
              Seq(bucketAttrN), idProject)
            val marker = Alias(Literal(true), "__graft_ij_m")()
            val projectedM =
              Project(pointSide.output :+ pointBucket :+ marker, pointSide)
            val condN = And(EqualTo(pointBucket.toAttribute, bucketAttrN), j.condition.get)
            val joined = Join(explodedId, projectedM, LeftOuter, Some(condN), j.hint)
            val anyMatch =
              Alias(new Max(marker.toAttribute).toAggregateExpression(), "__graft_ij_any")()
            val agg = collapse(joined, Seq(anyMatch))
            Some(Project(j.output, Filter(IsNull(anyMatch.toAttribute), agg)))
        }

      // Full outer: both sides preserved. One full-outer join on the bucket key
      // over the id-tagged, OUTER-exploded interval side, then a window over the
      // interval id recovers exactly one null-extension per fully-unmatched
      // interval row:
      //   - matched (copy, point) pairs carry the point side's literal-true
      //     marker and pass through (each qualifying pair meets in exactly one
      //     bucket, so no dedup);
      //   - unmatched POINT rows surface as full-outer rows with a null interval
      //     id and a non-null marker — preserved as-is (the point side is never
      //     exploded, so multiplicity is exact);
      //   - an interval row's unmatched copies carry a null marker; the window
      //     keeps copy #1 iff count(marker) over the id is zero.
      // The point side gets its own monotonic id so the window partition key
      // (isnull(id), coalesce(id, pid)) is unique per unmatched point row —
      // null-id rows never pile into one partition. Both ids are single-use
      // (sound per the semi/anti scaladoc). Cost: one extra window shuffle over
      // the join output — linear, keyed, skew-bounded by the fanout.
      case FullOuter =>
        import org.apache.spark.sql.catalyst.expressions.aggregate.Count
        val idAlias = Alias(MonotonicallyIncreasingID(), "__graft_ij_id")()
        val idProject = Project(intervalSide.output :+ idAlias, intervalSide)
        val bucketAttrN =
          AttributeReference("__graft_ij_bucket", LongType, nullable = true)()
        val exploded2 = Generate(Explode(buckets), Nil, outer = true, None,
          Seq(bucketAttrN), idProject)
        val marker = Alias(Literal(true), "__graft_ij_m")()
        val pidAlias = Alias(MonotonicallyIncreasingID(), "__graft_ij_pid")()
        val projectedM =
          Project(pointSide.output :+ pointBucket :+ marker :+ pidAlias, pointSide)
        val condN = And(EqualTo(pointBucket.toAttribute, bucketAttrN), j.condition.get)
        val joined = Join(exploded2, projectedM, FullOuter, Some(condN), j.hint)

        val partKeys: Seq[Expression] = Seq(
          IsNull(idAlias.toAttribute),
          Coalesce(Seq(idAlias.toAttribute, pidAlias.toAttribute)))
        val orderSpec = Seq(SortOrder(bucketAttrN, Ascending, NullsFirst, Seq.empty))
        val rnAlias = Alias(WindowExpression(RowNumber(),
          WindowSpecDefinition(partKeys, orderSpec,
            SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))),
          "__graft_ij_rn")()
        val cntAlias = Alias(WindowExpression(
          Count(marker.toAttribute).toAggregateExpression(),
          WindowSpecDefinition(partKeys, orderSpec,
            SpecifiedWindowFrame(RowFrame, UnboundedPreceding, UnboundedFollowing))),
          "__graft_ij_cnt")()
        val win = Window(Seq(rnAlias, cntAlias), partKeys, orderSpec, joined)
        val keep = Or(
          IsNotNull(marker.toAttribute),
          And(EqualTo(cntAlias.toAttribute, Literal(0L)),
            EqualTo(rnAlias.toAttribute, Literal(1))))
        Some(Project(j.output, Filter(keep, win)))

      case _ => None
    }
  }
}

/** Session-builder registration: `.config("spark.sql.extensions",
  * "graft.plans.GraftSparkExtensions")` or `.withExtensions(new GraftSparkExtensions)`.
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // Persisted-SQL-view DDL + read substitution for graft catalogs. Must be
    // build-time (the parser interceptor has no runtime registration hook).
    graft.catalog.GraftViewExtension.install(ext)
    // Plain-scan parallelism under SPJ reporting: strip KeyGroupedPartitioning
    // from graft scans whose grouping no operator consumes (the v2 twin of
    // Spark's DisableUnnecessaryBucketedScan; runs after EnsureRequirements,
    // so every zero-exchange SPJ plan is left intact).
    ext.injectQueryStagePrepRule(session =>
      new graft.catalog.DisableUnnecessaryKeyGrouping(session))
    // Transparent materialized-view serving: a COUNT/SUM/MIN/MAX GROUP BY
    // over a graft table with a registered, provably-FRESH MV is answered
    // from the MV (O(groups) instead of O(table)); stale or uncovered
    // queries pass through untouched. Operator-optimization rule: runs
    // before V2 scan pushdown, so the relation is still matchable.
    ext.injectOptimizerRule(session => new graft.catalog.GraftMvRewrite(session))
    // Top-k segment pruning: ORDER BY x DESC LIMIT k over a graft table
    // derives a sound threshold from committed zone stats (>= k non-null
    // values provably >= tau) and injects x >= tau, so zone pruning skips
    // every segment that cannot reach the top k.
    ext.injectOptimizerRule(session => new graft.catalog.GraftTopKPrune(session))
    // Analysis-time identity guard: UPDATE/MERGE-UPDATE assigning a literal
    // NULL to a GENERATED ALWAYS identity column refuses at analysis (the
    // rewrite would otherwise silently mint a fresh id — re-keying the row).
    // Two hooks: a resolution rule sees UpdateTable before its rewrite; the
    // check rule sees MERGE's rewritten ReplaceData(MergeRows) form (no
    // injected rule ever observes a resolved MergeIntoTable).
    ext.injectResolutionRule(session => new graft.catalog.GraftIdentityChecks(session))
    ext.injectCheckRule(_ => plan => graft.catalog.GraftIdentityChecks.check(plan))
    // ... and again as a columnar pre-transition: scan-only plans carry no
    // exchange, skip AQE entirely, and so never see queryStagePrepRules.
    ext.injectColumnar(session => new graft.catalog.GraftUngroupColumnarRule(session))
    // IntervalJoinRewrite is deliberately NOT injected here: it registers at
    // runtime via GraftExtensions.install (experimental.extraOptimizations —
    // a Once-style user batch). Injecting it as an optimizer rule TOO would
    // run it twice per plan, and the full-outer band rewrite is not
    // idempotent under the operator-optimization fixed point (measured:
    // duplicate null-extended rows in IntervalJoinSpec).
  }
}

/** Runtime registration for an already-built session (the driver's Verify/Bench
  * sessions are constructed without extensions). Idempotent; the rule itself is a
  * no-op on anything but pure band joins. */
object GraftExtensions {
  def install(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraOptimizations.contains(IntervalJoinRewrite)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ IntervalJoinRewrite
    }
  }

  /** Query-side setup shared by the declared band-join queries (q68/q82/q83):
    * install the rule, force it on, and UNSET any leftover session bucket width —
    * a width tuned for some numeric band (e.g. 0.01) would span a time band over
    * more than maxFanout buckets and silently route the whole join to the
    * nested-loop fallback; unsetting pins the auto-derived width.
    *
    * SESSION-STICKY BY DESIGN: the rule plans lazily (conf is read when the
    * action runs, not when the DataFrame is built), so a restore-after-build
    * would disable the rewrite before it ever fires. Instead the rule stays
    * installed and enabled for the rest of the session — it no-ops on anything
    * but pure band joins, so results are unaffected; to keep plan SHAPES
    * order-independent too, Verify and Bench install it up-front so every query
    * in a run is planned under the same rule set regardless of position. */
  def enableForQuery(spark: SparkSession): Unit = {
    install(spark)
    spark.conf.set(IntervalJoinRewrite.EnabledKey, "true")
    spark.conf.unset(IntervalJoinRewrite.WidthKey)
  }
}
