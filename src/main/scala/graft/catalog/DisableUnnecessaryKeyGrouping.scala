package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.physical.UnspecifiedDistribution
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{FilterExec, ProjectExec, SortExec, SparkPlan}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.exchange.Exchange

/** Restores full scan parallelism on graft KeyGroupedPartitioning scans whose
  * grouping no operator uses — the 100 TB plain-scan fix for SPJ reporting.
  *
  * Whenever a scan reports `KeyGroupedPartitioning` and
  * `spark.sql.sources.v2.bucketing.enabled` is on, Spark 4.1 groups the
  * scan's splits into ONE task per partition value — measured: a
  * 4-partition/20-split table runs 4 scan tasks even for a bare `SELECT *`,
  * and split granularity cannot change that (BatchScanExec.inputRDD groups by
  * key whenever the partitioning is reported, join or no join). That is the
  * right trade exactly when some operator consumes the clustering (SPJ joins,
  * partition-keyed aggregates — zero exchanges), and a parallelism collapse
  * everywhere else: a plain scan of a 25-partition table would read 100 TB
  * with 25 tasks on a 1000-core cluster.
  *
  * This rule is the v2 twin of Spark's own `DisableUnnecessaryBucketedScan`
  * (same traversal, same conditions — execution/bucketing/
  * DisableUnnecessaryBucketedScan.scala in the Spark source): it runs as a
  * query-stage preparation rule AFTER `EnsureRequirements`, walks the
  * physical plan top-down, and strips the key-grouping from a graft
  * `BatchScanExec` when either
  *
  *   - no operator between the scan and the plan root requires a
  *     distribution (nothing consumes the clustering), or
  *   - the nearest such operator sits above an exchange reached from the
  *     scan through order/partitioning-transparent nodes only (the exchange
  *     re-distributes anyway, so grouping below it buys nothing).
  *
  * Stripping = `spjParams.keyGroupedPartitioning := None`: the scan then
  * reports `UnknownPartitioning` and every (file-sized, GraftSpj multi-split
  * mode) split becomes its own task. Scans whose grouping IS consumed — SPJ
  * joins (q284/q285/q288), partition-keyed aggregates, windows over the
  * partition key — are left untouched, so every zero-exchange plan the
  * engine promises survives; scans already aligned by SPJ proper
  * (`commonPartitionValues` pushed) are never touched. Runs under AQE on
  * every (re-)optimization; idempotent. Escape hatch:
  * [[GraftSpj.UngroupKey]] = false. */
final class DisableUnnecessaryKeyGrouping(session: SparkSession) extends Rule[SparkPlan] {

  override def apply(plan: SparkPlan): SparkPlan = {
    val on = scala.util.Try(session.conf.get(GraftSpj.UngroupKey).toBoolean).getOrElse(true)
    if (on) visit(plan, interesting = false, exchange = false, allowed = true) else plan
  }

  private def visit(p: SparkPlan, interesting: Boolean, exchange: Boolean,
                    allowed: Boolean): SparkPlan = p match {
    case q if hasInterestingPartition(q) =>
      q.mapChildren(visit(_, interesting = true, exchange = false, allowed = true))
    case e: Exchange =>
      e.mapChildren(visit(_, interesting, exchange = true, allowed = true))
    case b: BatchScanExec if groupedGraftScan(b) && (!interesting || (exchange && allowed)) =>
      val ungrouped = b.copy(spjParams = b.spjParams.copy(keyGroupedPartitioning = None))
      // case-class copy loses TreeNode tags; AQE asserts the logical link
      // when it cuts a query stage at this scan, so carry the tags over
      ungrouped.copyTagsFrom(b)
      ungrouped
    case o =>
      val still = allowed && isAllowedUnaryExecNode(o)
      o.mapChildren(visit(_, interesting, exchange, still))
  }

  /** The operator consumes its children's partitioning (join, keyed/global
    * aggregate, window, ...) — anything but UnspecifiedDistribution, exactly
    * Spark's `hasInterestingPartition`. */
  private def hasInterestingPartition(p: SparkPlan): Boolean =
    p.requiredChildDistribution.exists {
      case UnspecifiedDistribution => false
      case _                       => true
    }

  /** Nodes that neither consume nor change partitioning between an exchange
    * and the scan (Spark's `isAllowedUnaryExecNode`: sort/project/filter and
    * partial aggregates). */
  private def isAllowedUnaryExecNode(p: SparkPlan): Boolean = p match {
    case _: SortExec | _: ProjectExec | _: FilterExec => true
    case agg: BaseAggregateExec => agg.requiredChildDistributionExpressions.isEmpty
    case _ => false
  }

  /** A graft scan whose reported grouping is still in force and not already
    * consumed by SPJ alignment. */
  private def groupedGraftScan(b: BatchScanExec): Boolean =
    b.spjParams.keyGroupedPartitioning.isDefined &&
      b.spjParams.commonPartitionValues.isEmpty &&
      (b.scan match { case _: GraftStreamableScan => true; case _ => false })
}

/** Second registration surface for [[DisableUnnecessaryKeyGrouping]]: a
  * scan-only plan (bare SELECT, filter-only read) has no exchange, so Spark
  * never wraps it in AQE and query-stage preparation rules never run — yet it
  * is exactly the 100 TB full-table read that must not collapse to
  * partition-count tasks. Columnar rules run after `EnsureRequirements` on
  * BOTH paths (non-AQE preparations, and per-stage in AQE, where the
  * traversal is a consistent no-op re-check: any operator consuming a scan's
  * partitioning without an intervening exchange is necessarily in the same
  * stage). */
final class GraftUngroupColumnarRule(session: SparkSession)
  extends org.apache.spark.sql.execution.ColumnarRule {
  override def preColumnarTransitions: Rule[SparkPlan] =
    new DisableUnnecessaryKeyGrouping(session)
}
