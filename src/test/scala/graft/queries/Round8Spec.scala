package graft.queries

import graft.{Registry, SparkSpec}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.window.WindowExec

/** Plan pins for the round-8 queries: the scale claims in their Scaladoc must
  * be visible in the physical plan. */
class Round8Spec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def executed(name: String): SparkPlan =
    Registry.byName(name).fn(spark, sf).queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan // unwrap AQE for collect()
      case other => other
    }

  test("q156/q157/q158: every window is user-partitioned — no single-partition collapse") {
    for (q <- Seq("q156_markov_transitions", "q157_activity_streaks", "q158_time_weighted_avg")) {
      val windows = executed(q).collect { case w: WindowExec => w }
      assert(windows.nonEmpty, s"$q should plan a Window")
      windows.foreach { w =>
        assert(w.partitionSpec.nonEmpty,
          s"$q plans an UNPARTITIONED window (all rows to one partition):\n$w")
      }
    }
  }

  test("q159: spatial join is an equi-join on the cell id, never a nested loop") {
    val p = executed("q159_spatial_grid_join").toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"spatial join degraded to a quadratic shape:\n${p.take(800)}")
    assert(p.contains("Join") && p.contains("cell"),
      s"expected an equi-join keyed on cell in:\n${p.take(800)}")
  }

  test("q160: enumerate plans NO window operator and ordinals are contiguous") {
    val df = Registry.byName("q160_distributed_enumerate").fn(spark, sf)
    val windows = executed("q160_distributed_enumerate").collect { case w: WindowExec => w }
    assert(windows.isEmpty, "distributed enumerate must not fall back to a global window")
    // contiguity: ordinals 0..n-1 exactly — max = n-1 and Σ = n(n-1)/2 globally
    val rows = df.collect()
    val n = rows.map(_.getAs[Long]("n")).sum
    assert(rows.map(_.getAs[Long]("max_ord")).max === n - 1)
    assert(rows.map(_.getAs[Long]("min_ord")).min === 0L)
    assert(rows.map(_.getAs[Long]("sum_ord")).sum === n * (n - 1) / 2)
  }

  test("q160: ordinal assignment is stable across reruns (deterministic range bounds)") {
    val a = Registry.byName("q160_distributed_enumerate").fn(spark, sf).collect().toSeq
    val b = Registry.byName("q160_distributed_enumerate").fn(spark, sf).collect().toSeq
    assert(a === b)
  }
}
