package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Engine observability + approximation guarantees.
  *
  * `Dataset.observe` is the production monitoring surface: named aggregates are
  * computed inline with the job (no second scan) and surface through
  * `queryExecution.observedMetrics` / streaming progress events — at 100 TB a
  * separate metrics pass would double the read. `approx_percentile` is the
  * bounded-error twin of q61's exact percentiles; its rank-error contract is what
  * makes it usable at scale where exact percentiles would shuffle every value.
  */
class MetricsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("Dataset.observe computes inline metrics without a second scan") {
    val li = Tables.lineitem(spark, sf)
    val observed = li.observe("scan_stats",
      count(lit(1)).as("rows_seen"),
      sum(col("l_quantity")).as("total_qty"),
      count(when(col("l_quantity") > 25, 1)).as("big_rows"))
    // downstream transformation is free to filter — the metrics still describe
    // the observed point in the plan, not the final result. NB: metrics attach to
    // the QueryExecution that actually RAN, so collect() the derived Dataset and
    // read them from its own queryExecution (count() would spawn a separate one).
    val filtered = observed.filter(col("l_quantity") > 25)
    val kept = filtered.collect().length.toLong
    val m = filtered.queryExecution.observedMetrics("scan_stats")

    val expectedRows = li.count()
    assert(m.getAs[Long]("rows_seen") == expectedRows)
    assert(m.getAs[Long]("big_rows") == kept)
    val exactQty = li.agg(sum(col("l_quantity"))).collect()(0).getDouble(0)
    assert(math.abs(m.getAs[Double]("total_qty") - exactQty) < 1e-6)
  }

  test("approx_percentile respects its rank-error bound against exact percentiles") {
    val li = Tables.lineitem(spark, sf).select(col("l_extendedprice").as("v"))
    val n = li.count()
    val accuracy = 1000 // rank error <= n / accuracy
    val qs = Seq(0.1, 0.5, 0.9, 0.99)
    val approx = li.agg(
      percentile_approx(col("v"), array(qs.map(lit): _*), lit(accuracy))).collect()(0)
      .getSeq[Double](0)
    val sorted = li.orderBy(col("v")).collect().map(_.getDouble(0))
    qs.zip(approx).foreach { case (q, est) =>
      // the estimate must be an actual data value whose rank is within n/accuracy
      // of the target rank
      val rank = sorted.indexWhere(_ >= est)
      assert(rank >= 0, s"estimate $est for q=$q not found in data range")
      val targetRank = q * (n - 1)
      val tol = n.toDouble / accuracy + 1
      assert(math.abs(rank - targetRank) <= tol,
        s"q=$q: estimate $est at rank $rank, target $targetRank +- $tol")
    }
  }
}
