package graft.queries

import graft.{QDef, Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second-ring relational surface: argmin/argmax aggregates, exact percentiles,
  * pivot, and the remaining analytic windows. */
object ExtraQueries {

  /** max_by / min_by + exact interpolated percentiles per order status.
    * The by-key folds the order key into the cents price so it is UNIQUE — max_by
    * tie-breaking is undefined in both engines. Percentile outputs are ×1000-scaled:
    * interpolation fractions here are multiples of 0.1, so the true value has at
    * most 3 decimals and the scaled rounding can never land on a tie. */
  private def q61(s: SparkSession, d: String): DataFrame = {
    val byKey = expr("CAST(FLOOR(o_totalprice * 100) AS BIGINT) * 10000000 + o_orderkey")
    T.orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(
        max_by(col("o_orderkey"), byKey).as("priciest_order"),
        min_by(col("o_orderkey"), byKey).as("cheapest_order"),
        round(expr("percentile(o_totalprice, 0.5)") * 1000).cast("long").as("median_price_x1000"),
        round(expr("percentile(o_totalprice, 0.9)") * 1000).cast("long").as("p90_price_x1000"))
      .orderBy(col("o_orderstatus"))
  }

  private val q61Sql =
    """SELECT o_orderstatus,
       MAX_BY(o_orderkey, CAST(FLOOR(o_totalprice * 100) AS BIGINT) * 10000000 + o_orderkey) AS priciest_order,
       MIN_BY(o_orderkey, CAST(FLOOR(o_totalprice * 100) AS BIGINT) * 10000000 + o_orderkey) AS cheapest_order,
       CAST(ROUND(QUANTILE_CONT(o_totalprice, 0.5) * 1000) AS BIGINT) AS median_price_x1000,
       CAST(ROUND(QUANTILE_CONT(o_totalprice, 0.9) * 1000) AS BIGINT) AS p90_price_x1000
       FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""

  /** Pivot: order counts + revenue by status × priority (explicit value list so the
    * output schema is static; columns renamed to oracle-safe identifiers). */
  private def q62(s: SparkSession, d: String): DataFrame = {
    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    val pivoted = T.orders(s, d)
      .groupBy(col("o_orderstatus"))
      .pivot("o_orderpriority", prios)
      .agg(count(lit(1)))
    val renamed = prios.zipWithIndex.foldLeft(pivoted) { case (df, (p, i)) =>
      df.withColumnRenamed(p, s"n_p${i + 1}")
    }
    renamed.orderBy(col("o_orderstatus"))
  }

  private val q62Sql =
    """SELECT o_orderstatus,
       COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS n_p1,
       COUNT(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS n_p2,
       COUNT(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS n_p3,
       COUNT(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END) AS n_p4,
       COUNT(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS n_p5
       FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""

  /** Distribution windows: percent_rank, cume_dist, nth_value over a tie-prone
    * bucketed ordering (ties get equal values in both engines — deterministic). */
  private def q63(s: SparkSession, d: String): DataFrame = {
    val bucket = floor(col("o_totalprice") / 50000)
    val w = Window.partitionBy(col("o_custkey")).orderBy(bucket)
    val wFull = Window.partitionBy(col("o_custkey")).orderBy(bucket, col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    T.orders(s, d)
      .filter(col("o_custkey") < 40)
      .select(
        col("o_custkey"), col("o_orderkey"),
        bucket.cast("long").as("price_bucket"),
        round(percent_rank().over(w) * 10000).cast("long").as("pct_rank_bp"),
        round(cume_dist().over(w) * 10000).cast("long").as("cume_dist_bp"),
        nth_value(col("o_orderkey"), 2).over(wFull).as("second_order"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  private val q63Sql =
    """SELECT o_custkey, o_orderkey,
       CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS price_bucket,
       CAST(ROUND(PERCENT_RANK() OVER w * 10000) AS BIGINT) AS pct_rank_bp,
       CAST(ROUND(CUME_DIST() OVER w * 10000) AS BIGINT) AS cume_dist_bp,
       NTH_VALUE(o_orderkey, 2) OVER w2 AS second_order
       FROM orders WHERE o_custkey < 40
       WINDOW w AS (PARTITION BY o_custkey ORDER BY FLOOR(o_totalprice / 50000)),
              w2 AS (PARTITION BY o_custkey ORDER BY FLOOR(o_totalprice / 50000), o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
       ORDER BY o_custkey, o_orderkey"""

  val defs: Seq[QDef] = Seq(
    QDef("q61_argminmax_median", q61, Some(q61Sql)),
    QDef("q62_pivot", q62, Some(q62Sql)),
    QDef("q63_window_distribution", q63, Some(q63Sql)),
  )
}
