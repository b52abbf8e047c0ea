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
    // cents (< 2^26) shifted past 36 bits, order key in the low 36 bits: unique,
    // overflow-free to orderkey < 2^36 (~6.9e10, far beyond any SF here), and the
    // ordering is price-major — a 10^7 multiplier would let large orderkeys bleed
    // into the price field
    val byKey = expr("CAST(FLOOR(o_totalprice * 100) AS BIGINT) * 68719476736 + o_orderkey")
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
       MAX_BY(o_orderkey, CAST(FLOOR(o_totalprice * 100) AS BIGINT) * 68719476736 + o_orderkey) AS priciest_order,
       MIN_BY(o_orderkey, CAST(FLOOR(o_totalprice * 100) AS BIGINT) * 68719476736 + o_orderkey) AS cheapest_order,
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
    // coalesce to 0: Spark leaves empty pivot cells NULL while the oracle's
    // COUNT(CASE ...) yields 0 for them
    val renamed = prios.zipWithIndex.foldLeft(pivoted) { case (df, (p, i)) =>
      df.withColumn(s"n_p${i + 1}", coalesce(col(s"`$p`"), lit(0L))).drop(p)
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

  /** Supplier-side star: supplier ⋈ nation ⋈ region balances (the one base table no
    * other declared query touched). */
  private def q64(s: SparkSession, d: String): DataFrame =
    T.supplier(s, d)
      .join(broadcast(T.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(T.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        count(lit(1)).as("n_suppliers"),
        round(sum(col("s_acctbal")), 2).as("total_bal"),
        round(max(col("s_acctbal")), 2).as("max_bal"))
      .orderBy(col("r_name"))

  private val q64Sql =
    """SELECT r_name, COUNT(*) AS n_suppliers,
       ROUND(SUM(s_acctbal), 2) AS total_bal,
       ROUND(MAX(s_acctbal), 2) AS max_bal
       FROM supplier
       JOIN nation ON s_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       GROUP BY r_name ORDER BY r_name"""

  /** Right and full outer joins (left outer is q04): a deliberately partial match
    * between big-spender custkeys and urgent-order custkeys, classified per row. */
  private def q65(s: SparkSession, d: String): DataFrame = {
    val rich = T.customer(s, d).filter(col("c_acctbal") > 5000)
      .select(col("c_custkey"))
    val urgent = T.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey")).distinct()
    val full = rich.join(urgent, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(
        when(col("c_custkey").isNull, "urgent_only")
          .when(col("o_custkey").isNull, "rich_only")
          .otherwise("both").as("side"))
      .groupBy(col("side")).agg(count(lit(1)).as("n"))
      .select(lit("full").as("join_type"), col("side"), col("n"))
    val right = rich.join(urgent, col("c_custkey") === col("o_custkey"), "right_outer")
      .select(
        when(col("c_custkey").isNull, "urgent_only").otherwise("both").as("side"))
      .groupBy(col("side")).agg(count(lit(1)).as("n"))
      .select(lit("right").as("join_type"), col("side"), col("n"))
    full.unionAll(right).orderBy(col("join_type"), col("side"))
  }

  private val q65Sql =
    """WITH rich AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000),
       urgent AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
       SELECT 'full' AS join_type,
         CASE WHEN c_custkey IS NULL THEN 'urgent_only'
              WHEN o_custkey IS NULL THEN 'rich_only'
              ELSE 'both' END AS side,
         COUNT(*) AS n
       FROM rich FULL OUTER JOIN urgent ON c_custkey = o_custkey
       GROUP BY 2
       UNION ALL
       SELECT 'right' AS join_type,
         CASE WHEN c_custkey IS NULL THEN 'urgent_only' ELSE 'both' END AS side,
         COUNT(*) AS n
       FROM rich RIGHT OUTER JOIN urgent ON c_custkey = o_custkey
       GROUP BY 2
       ORDER BY join_type, side"""

  /** The SQL entry point (spark.sql over registered temp views) — same Catalyst
    * plans as the DataFrame API, declared once to pin the surface. TPC-H Q3 shape:
    * unshipped-revenue top-10. */
  private def q67(s: SparkSession, d: String): DataFrame = {
    T.customer(s, d).createOrReplaceTempView("v_customer")
    T.orders(s, d).createOrReplaceTempView("v_orders")
    T.lineitem(s, d).createOrReplaceTempView("v_lineitem")
    s.sql(
      """SELECT l_orderkey,
         ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
         DATE_FORMAT(o_orderdate, 'yyyy-MM-dd') AS order_date,
         o_orderpriority
         FROM v_customer
         JOIN v_orders   ON c_custkey = o_custkey
         JOIN v_lineitem ON l_orderkey = o_orderkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
           AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
         GROUP BY l_orderkey, o_orderdate, o_orderpriority
         ORDER BY revenue DESC, l_orderkey
         LIMIT 10""")
  }

  private val q67Sql =
    """SELECT l_orderkey,
       ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
       STRFTIME(o_orderdate, '%Y-%m-%d') AS order_date,
       o_orderpriority
       FROM customer
       JOIN orders   ON c_custkey = o_custkey
       JOIN lineitem ON l_orderkey = o_orderkey
       WHERE c_mktsegment = 'BUILDING'
         AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
       GROUP BY l_orderkey, o_orderdate, o_orderpriority
       ORDER BY revenue DESC, l_orderkey
       LIMIT 10"""

  /** Unpivot (melt): wide per-row measures to long (measure, value) rows — the
    * inverse of q62's pivot and the standard reshape before per-measure
    * aggregation or feature export. Narrow, shuffle-free projection (internally a
    * Generate/Expand — each row fans out to one row per measure, no exchange).
    * DuckDB twin uses UNION ALL, which is the same reshape spelled portably. */
  private def q77(s: SparkSession, d: String): DataFrame =
    T.lineitem(s, d)
      .filter(col("l_orderkey") < 100)
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(round(col("l_quantity"), 2).as("l_quantity"),
          round(col("l_extendedprice"), 2).as("l_extendedprice"),
          round(col("l_discount"), 2).as("l_discount")),
        "measure", "value")
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("measure"))

  private val q77Sql =
    """SELECT l_orderkey, l_linenumber, measure, value FROM (
         SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
           ROUND(l_quantity, 2) AS value FROM lineitem
         UNION ALL
         SELECT l_orderkey, l_linenumber, 'l_extendedprice',
           ROUND(l_extendedprice, 2) FROM lineitem
         UNION ALL
         SELECT l_orderkey, l_linenumber, 'l_discount',
           ROUND(l_discount, 2) FROM lineitem)
       WHERE l_orderkey < 100
       ORDER BY l_orderkey, l_linenumber, measure"""

  /** Histogram profiling: fixed-width value bucketing + per-bucket counts — the
    * data-distribution profile a pipeline computes before choosing filters or
    * partitioning. Bucket index is portable floor arithmetic (both engines floor
    * the same double division; clamping bounds the index domain), one hash
    * aggregation, no window. */
  private def q78(s: SparkSession, d: String): DataFrame = {
    val lo = 900.0; val w = 10000.0; val nb = 11
    val bucket = least(greatest(
      floor((col("o_totalprice") - lit(lo)) / lit(w)), lit(0)), lit(nb - 1))
    T.orders(s, d)
      .select(bucket.cast("long").as("bucket"), col("o_totalprice"))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n"),
        round(min(col("o_totalprice")), 2).as("lo_price"),
        round(max(col("o_totalprice")), 2).as("hi_price"))
      .orderBy(col("bucket"))
  }

  private val q78Sql =
    """SELECT CAST(LEAST(GREATEST(FLOOR((o_totalprice - 900.0) / 10000.0), 0), 10) AS BIGINT) AS bucket,
       COUNT(*) AS n,
       ROUND(MIN(o_totalprice), 2) AS lo_price,
       ROUND(MAX(o_totalprice), 2) AS hi_price
       FROM orders
       GROUP BY 1
       ORDER BY bucket"""

  /** RECURSIVE CTE (Spark 4's WITH RECURSIVE): a 15-row month spine generated by
    * bounded recursion, left-joined to orders for a monthly revenue profile. The
    * spine STARTS THREE MONTHS BEFORE the data (orders begin 1995-01), so the
    * 1994-10..12 rows are genuinely order-free — the zero-filled left-join path
    * is exercised, not just claimed. Spark currently supports only UNION ALL
    * recursion (no UNION-distinct), so cyclic-closure recursion stays on the
    * DataFrame side (q81's propagation loop); this pins the bounded-recursion
    * surface both engines share. */
  private def q90(s: SparkSession, d: String): DataFrame = {
    T.orders(s, d).createOrReplaceTempView("v_orders_rec")
    s.sql(
      """WITH RECURSIVE months(m) AS (
           SELECT TIMESTAMP '1994-10-01 00:00:00'
           UNION ALL
           SELECT m + INTERVAL 1 MONTH FROM months
           WHERE m < TIMESTAMP '1995-12-01 00:00:00')
         SELECT DATE_FORMAT(m, 'yyyy-MM') AS month,
           COUNT(o_orderkey) AS n_orders,
           ROUND(COALESCE(SUM(o_totalprice), 0), 2) AS total
         FROM months LEFT JOIN v_orders_rec ON DATE_TRUNC('MONTH', o_orderdate) = m
         GROUP BY m
         ORDER BY month""")
  }

  private val q90Sql =
    """WITH RECURSIVE months(m) AS (
         SELECT TIMESTAMP '1994-10-01 00:00:00'
         UNION ALL
         SELECT m + INTERVAL 1 MONTH FROM months
         WHERE m < TIMESTAMP '1995-12-01 00:00:00')
       SELECT STRFTIME(m, '%Y-%m') AS month,
         COUNT(o_orderkey) AS n_orders,
         ROUND(COALESCE(SUM(o_totalprice), 0), 2) AS total
       FROM months LEFT JOIN orders ON DATE_TRUNC('month', o_orderdate) = m
       GROUP BY m
       ORDER BY month"""

  /** Correlated-subquery family — scalar subquery, EXISTS, and IN in one query:
    * the Catalyst decorrelation surface (RewriteCorrelatedScalarSubquery /
    * RewritePredicateSubquery turn each into joins — scalar → left outer
    * aggregate join, EXISTS → semi, IN → semi on the key). Declared in SQL since
    * that is where users write these shapes; the DataFrame corpus covers the
    * post-rewrite join forms (q04/q05/q09). */
  private def q94(s: SparkSession, d: String): DataFrame = {
    T.customer(s, d).createOrReplaceTempView("v_customer_sub")
    T.orders(s, d).createOrReplaceTempView("v_orders_sub")
    s.sql(
      """SELECT c_custkey,
           (SELECT ROUND(MAX(o_totalprice), 2) FROM v_orders_sub o
            WHERE o.o_custkey = c.c_custkey) AS max_price,
           (SELECT COUNT(*) FROM v_orders_sub o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderpriority = '1-URGENT') AS n_urgent
         FROM v_customer_sub c
         WHERE EXISTS (SELECT 1 FROM v_orders_sub o WHERE o.o_custkey = c.c_custkey)
           AND c_custkey IN (SELECT o_custkey FROM v_orders_sub
                             WHERE o_totalprice > 50000)
         ORDER BY c_custkey""")
  }

  private val q94Sql =
    """SELECT c_custkey,
       (SELECT ROUND(MAX(o_totalprice), 2) FROM orders o
        WHERE o.o_custkey = c.c_custkey) AS max_price,
       CAST((SELECT COUNT(*) FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderpriority = '1-URGENT') AS BIGINT) AS n_urgent
       FROM customer c
       WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
         AND c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 50000)
       ORDER BY c_custkey"""

  /** Typed COGROUP — the KeyValueGroupedDataset operator the rest of the corpus
    * doesn't touch: both sides' rows for one key materialize in a single function
    * call (per-key custom merge logic that a join + agg can't express in general).
    * Physical shape: both sides shuffle once on the key, then a single CoGroup
    * operator — same exchange count as the equivalent outer join. Values are
    * floored to integer cents BEFORE summing (iterator order inside a cogroup
    * bucket is not deterministic, and integer sums are order-independent — the
    * same convention as q73). The oracle is the relational rendering: two
    * per-key aggregates full-outer-joined. */
  private def q87(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val orders = T.orders(s, d)
      .select(col("o_custkey").as("k"), col("o_totalprice").as("v")).as[(Long, Double)]
    val events = T.events(s, d)
      .filter(col("user_id") < 1000)
      .select(col("user_id").as("k"), col("value").as("v")).as[(Long, Double)]
    orders.groupByKey(_._1).cogroup(events.groupByKey(_._1)) { (k, os, es) =>
      var nO = 0L; var sO = 0L
      os.foreach { o => nO += 1; sO += math.floor(o._2 * 100).toLong }
      var nE = 0L; var sE = 0L
      es.foreach { e => nE += 1; sE += math.floor(e._2 * 100).toLong }
      Iterator.single((k, nO, sO, nE, sE))
    }.toDF("k", "n_orders", "orders_cents", "n_events", "events_cents")
      .orderBy(col("k"))
  }

  private val q87Sql =
    """WITH o AS (
         SELECT o_custkey AS k, COUNT(*) AS n_orders,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS orders_cents
         FROM orders GROUP BY 1),
       e AS (
         SELECT user_id AS k, COUNT(*) AS n_events,
           CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS events_cents
         FROM events WHERE user_id < 1000 GROUP BY 1)
       SELECT COALESCE(o.k, e.k) AS k,
         COALESCE(n_orders, 0) AS n_orders, COALESCE(orders_cents, 0) AS orders_cents,
         COALESCE(n_events, 0) AS n_events, COALESCE(events_cents, 0) AS events_cents
       FROM o FULL OUTER JOIN e ON o.k = e.k
       ORDER BY k"""

  val defs: Seq[QDef] = Seq(
    QDef("q67_sql_api", q67, Some(q67Sql)),
    QDef("q87_cogroup", q87, Some(q87Sql)),
    QDef("q90_recursive_cte", q90, Some(q90Sql)),
    QDef("q94_correlated_subqueries", q94, Some(q94Sql)),
    QDef("q61_argminmax_median", q61, Some(q61Sql)),
    QDef("q62_pivot", q62, Some(q62Sql)),
    QDef("q63_window_distribution", q63, Some(q63Sql)),
    QDef("q64_supplier_star", q64, Some(q64Sql)),
    QDef("q65_outer_join_variants", q65, Some(q65Sql)),
    QDef("q77_unpivot", q77, Some(q77Sql)),
    QDef("q78_histogram", q78, Some(q78Sql)),
  )
}
