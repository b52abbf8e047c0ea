package graft.queries

import graft.{QDef, Tables => T}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator contract (SURVEY.md §2b): scans, projections/predicates, the
  * full join family, aggregation variants, windows, sort/limit, set ops, dedup.
  *
  * Everything here is declarative DataFrame API so Catalyst plans it: filters and
  * projections push into the parquet scan, small dimensions are broadcast, and the
  * remaining shuffles are the semantically required ones (group-by / join keys).
  */
object RelationalQueries {

  /** TPC-H Q1 shape (pricing summary). One wide scan -> partial hash agg (map-side
    * combine) -> 6-group final agg. At 100 TB this is scan-bound; no extra shuffle
    * beyond the single 6-key exchange. */
  private def q01(s: SparkSession, d: String): DataFrame =
    T.lineitem(s, d)
      .filter(col("l_shipdate") <= to_timestamp(lit("2000-12-01 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg("l_quantity"), 2).as("avg_qty"),
        round(avg("l_extendedprice"), 2).as("avg_price"),
        round(avg("l_discount"), 2).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  private val q01Sql =
    """SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
       ROUND(AVG(l_quantity), 2) AS avg_qty,
       ROUND(AVG(l_extendedprice), 2) AS avg_price,
       ROUND(AVG(l_discount), 2) AS avg_disc,
       COUNT(*) AS count_order
       FROM lineitem
       WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
       GROUP BY l_returnflag, l_linestatus
       ORDER BY l_returnflag, l_linestatus"""

  /** Predicate family: comparison, BETWEEN, IN, LIKE, boolean algebra, modulo.
    * All of it folds into the parquet scan as PushedFilters. */
  private def q02(s: SparkSession, d: String): DataFrame =
    T.orders(s, d)
      .filter(
        col("o_totalprice").between(10000, 200000) &&
          col("o_orderstatus").isin("O", "F") &&
          col("o_orderpriority").like("%URGENT%") &&
          !(col("o_custkey") % 10 === 3))
      .select(
        col("o_orderkey"), col("o_orderstatus"),
        round(col("o_totalprice"), 2).as("o_totalprice"), col("o_orderpriority"))
      .orderBy(col("o_orderkey"))

  private val q02Sql =
    """SELECT o_orderkey, o_orderstatus, ROUND(o_totalprice, 2) AS o_totalprice, o_orderpriority
       FROM orders
       WHERE o_totalprice BETWEEN 10000 AND 200000
         AND o_orderstatus IN ('O', 'F')
         AND o_orderpriority LIKE '%URGENT%'
         AND NOT (o_custkey % 10 = 3)
       ORDER BY o_orderkey"""

  /** 5-way star join: fact lineitem ⋈ orders, then customer, then broadcast dims.
    * nation/region are tiny at any SF -> explicit broadcast() so the big side never
    * shuffles for them; lineitem⋈orders⋈customer shuffle on their keys (AQE may
    * convert to broadcast at small SF). */
  private def q03(s: SparkSession, d: String): DataFrame = {
    val li = T.lineitem(s, d)
    val o  = T.orders(s, d)
    val c  = T.customer(s, d)
    val n  = broadcast(T.nation(s, d))
    val r  = broadcast(T.region(s, d))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(n, col("c_nationkey") === col("n_nationkey"))
      .join(r, col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
        countDistinct(col("o_orderkey")).as("n_orders"))
      .orderBy(col("r_name"), col("n_name"))
  }

  private val q03Sql =
    """SELECT r_name, n_name,
       ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
       COUNT(DISTINCT o_orderkey) AS n_orders
       FROM lineitem
       JOIN orders   ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       JOIN nation   ON c_nationkey = n_nationkey
       JOIN region   ON n_regionkey = r_regionkey
       GROUP BY r_name, n_name
       ORDER BY r_name, n_name"""

  /** Left outer join + null-tolerant aggregation (customers with zero orders kept). */
  private def q04(s: SparkSession, d: String): DataFrame =
    T.customer(s, d)
      .join(T.orders(s, d), col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        round(coalesce(sum(col("o_totalprice")), lit(0.0)), 2).as("total_spent"))
      .orderBy(col("c_custkey"))

  private val q04Sql =
    """SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders,
       ROUND(COALESCE(SUM(o_totalprice), 0.0), 2) AS total_spent
       FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
       GROUP BY c_custkey, c_name
       ORDER BY c_custkey"""

  /** Left semi join (EXISTS): customers having at least one big order. */
  private def q05(s: SparkSession, d: String): DataFrame = {
    val big = T.orders(s, d).filter(col("o_totalprice") > 400000)
    T.customer(s, d)
      .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  private val q05Sql =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
       WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
       ORDER BY c_custkey"""

  /** Left anti join (NOT EXISTS): customers with no open ('O') order. */
  private def q06(s: SparkSession, d: String): DataFrame = {
    val open = T.orders(s, d).filter(col("o_orderstatus") === "O")
    T.customer(s, d)
      .join(open, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  private val q06Sql =
    """SELECT c_custkey, c_name FROM customer
       WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
       ORDER BY c_custkey"""

  /** Theta (non-equi) join: same-brand part pairs with a large size gap. The equi
    * half (brand) keys the shuffle; the range predicate filters inside the join, so
    * this stays a hash/sort-merge join on brand, not a nested-loop cross. */
  private def q07(s: SparkSession, d: String): DataFrame = {
    val p1 = T.part(s, d).select(
      col("p_partkey").as("k1"), col("p_brand").as("b1"), col("p_size").as("s1"))
    val p2 = T.part(s, d).select(
      col("p_partkey").as("k2"), col("p_brand").as("b2"), col("p_size").as("s2"))
    p1.join(p2, col("b1") === col("b2") && col("s1") < col("s2") - 40)
      .groupBy(col("b1").as("p_brand"))
      .agg(
        count(lit(1)).as("n_pairs"),
        round(avg(col("s2") - col("s1")), 2).as("avg_gap"))
      .orderBy(col("p_brand"))
  }

  private val q07Sql =
    """SELECT p1.p_brand AS p_brand, COUNT(*) AS n_pairs,
       ROUND(AVG(p2.p_size - p1.p_size), 2) AS avg_gap
       FROM part p1 JOIN part p2
         ON p1.p_brand = p2.p_brand AND p1.p_size < p2.p_size - 40
       GROUP BY p1.p_brand
       ORDER BY p_brand"""

  /** Cross join (tiny × tiny only — intentional cartesian of the two dim tables). */
  private def q08(s: SparkSession, d: String): DataFrame =
    T.region(s, d).crossJoin(T.nation(s, d))
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(col("r_regionkey").cast("long") * col("n_nationkey").cast("long")).as("key_product_sum"))
      .orderBy(col("n_pairs"))

  private val q08Sql =
    """SELECT COUNT(*) AS n_pairs,
       CAST(SUM(CAST(r_regionkey AS BIGINT) * CAST(n_nationkey AS BIGINT)) AS BIGINT) AS key_product_sum
       FROM region CROSS JOIN nation
       ORDER BY n_pairs"""

  /** Exact count-distinct + sum-distinct + conditional (pivot-style) aggregation. */
  private def q09(s: SparkSession, d: String): DataFrame =
    T.orders(s, d)
      .join(T.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(T.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        countDistinct(col("c_custkey")).as("n_customers"),
        round(sum_distinct(col("o_totalprice")), 2).as("sum_distinct_price"),
        count(lit(1)).as("n_orders"),
        round(sum(when(col("o_orderstatus") === "F", col("o_totalprice")).otherwise(lit(0.0))), 2)
          .as("finished_revenue"),
        round(sum(when(col("o_orderpriority") === "1-URGENT", col("o_totalprice"))), 2)
          .as("urgent_revenue"),
        count(when(col("o_orderstatus") === "P", lit(1))).as("n_pending"))
      .orderBy(col("n_name"))

  private val q09Sql =
    """SELECT n_name,
       COUNT(DISTINCT c_custkey) AS n_customers,
       ROUND(SUM(DISTINCT o_totalprice), 2) AS sum_distinct_price,
       COUNT(*) AS n_orders,
       ROUND(SUM(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END), 2) AS finished_revenue,
       ROUND(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice END), 2) AS urgent_revenue,
       COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_pending
       FROM orders
       JOIN customer ON o_custkey = c_custkey
       JOIN nation   ON c_nationkey = n_nationkey
       GROUP BY n_name
       ORDER BY n_name"""

  /** ROLLUP with grouping() — subtotal rows keyed by an explicit gid, null group keys
    * coalesced to 'ALL' so null-ordering differences between engines cannot bite. */
  private def q10(s: SparkSession, d: String): DataFrame =
    T.customer(s, d)
      .join(broadcast(T.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .rollup(col("n_name"), col("c_mktsegment"))
      .agg(
        (grouping(col("n_name")) * 2 + grouping(col("c_mktsegment"))).as("gid"),
        count(lit(1)).as("n_cust"),
        round(sum(col("c_acctbal")), 2).as("sum_bal"))
      .select(
        coalesce(col("n_name"), lit("ALL")).as("n_name"),
        coalesce(col("c_mktsegment"), lit("ALL")).as("c_mktsegment"),
        col("gid"), col("n_cust"), col("sum_bal"))
      .orderBy(col("gid"), col("n_name"), col("c_mktsegment"))

  private val q10Sql =
    """SELECT COALESCE(n_name, 'ALL') AS n_name,
       COALESCE(c_mktsegment, 'ALL') AS c_mktsegment,
       GROUPING(n_name) * 2 + GROUPING(c_mktsegment) AS gid,
       COUNT(*) AS n_cust,
       ROUND(SUM(c_acctbal), 2) AS sum_bal
       FROM customer JOIN nation ON c_nationkey = n_nationkey
       GROUP BY ROLLUP (n_name, c_mktsegment)
       ORDER BY gid, n_name, c_mktsegment"""

  /** CUBE over two independent dimensions. */
  private def q11(s: SparkSession, d: String): DataFrame =
    T.orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        (grouping(col("o_orderstatus")) * 2 + grouping(col("o_orderpriority"))).as("gid"),
        count(lit(1)).as("n"),
        round(avg(col("o_totalprice")), 2).as("avg_price"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("o_orderstatus"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("o_orderpriority"),
        col("gid"), col("n"), col("avg_price"))
      .orderBy(col("gid"), col("o_orderstatus"), col("o_orderpriority"))

  private val q11Sql =
    """SELECT COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
       COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
       GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS gid,
       COUNT(*) AS n,
       ROUND(AVG(o_totalprice), 2) AS avg_price
       FROM orders
       GROUP BY CUBE (o_orderstatus, o_orderpriority)
       ORDER BY gid, o_orderstatus, o_orderpriority"""

  /** Variance / stddev family — the SQL twin of the reference's Welford/Chan
    * combineByKey statistics (/root/reference/outlier_detection.py:57-101); the custom
    * Aggregator in functions/ is cross-checked against exactly this. */
  private def q12(s: SparkSession, d: String): DataFrame =
    T.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        round(var_samp(col("l_quantity")), 2).as("var_qty"),
        round(stddev_samp(col("l_quantity")), 2).as("std_qty"),
        round(var_pop(col("l_quantity")), 2).as("varp_qty"),
        round(stddev_pop(col("l_quantity")), 2).as("stdp_qty"),
        round(avg(col("l_quantity")), 2).as("avg_qty"),
        round(min(col("l_quantity")), 2).as("min_qty"),
        round(max(col("l_quantity")), 2).as("max_qty"))
      .orderBy(col("l_returnflag"))

  private val q12Sql =
    """SELECT l_returnflag,
       ROUND(VAR_SAMP(l_quantity), 2) AS var_qty,
       ROUND(STDDEV_SAMP(l_quantity), 2) AS std_qty,
       ROUND(VAR_POP(l_quantity), 2) AS varp_qty,
       ROUND(STDDEV_POP(l_quantity), 2) AS stdp_qty,
       ROUND(AVG(l_quantity), 2) AS avg_qty,
       ROUND(MIN(l_quantity), 2) AS min_qty,
       ROUND(MAX(l_quantity), 2) AS max_qty
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  /** Bivariate statistics family — corr / covar / linear-regression aggregates,
    * the single-pass co-moment operators (one partial-aggregating pass, no
    * self-join): price as a function of quantity per return flag. ALL outputs
    * scaled to integers — co-moment merge order differs between engines, and
    * decimal ROUND(x, 2) on a double is the documented cross-engine tie flake;
    * scaled-integer rounding is the convention precisely because binary-half
    * ties round identically in both engines. */
  private def q89(s: SparkSession, d: String): DataFrame =
    T.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        round(corr(col("l_quantity"), col("l_extendedprice")) * 10000).cast("long")
          .as("corr_bp"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")) * 100).cast("long")
          .as("covar_s_x100"),
        round(covar_pop(col("l_quantity"), col("l_extendedprice")) * 100).cast("long")
          .as("covar_p_x100"),
        round(expr("regr_slope(l_extendedprice, l_quantity)") * 100).cast("long")
          .as("slope_x100"),
        round(expr("regr_intercept(l_extendedprice, l_quantity)") * 100).cast("long")
          .as("intercept_x100"),
        round(expr("regr_r2(l_extendedprice, l_quantity)") * 10000).cast("long")
          .as("r2_bp"))
      .orderBy(col("l_returnflag"))

  private val q89Sql =
    """SELECT l_returnflag,
       CAST(ROUND(CORR(l_quantity, l_extendedprice) * 10000) AS BIGINT) AS corr_bp,
       CAST(ROUND(COVAR_SAMP(l_quantity, l_extendedprice) * 100) AS BIGINT) AS covar_s_x100,
       CAST(ROUND(COVAR_POP(l_quantity, l_extendedprice) * 100) AS BIGINT) AS covar_p_x100,
       CAST(ROUND(REGR_SLOPE(l_extendedprice, l_quantity) * 100) AS BIGINT) AS slope_x100,
       CAST(ROUND(REGR_INTERCEPT(l_extendedprice, l_quantity) * 100) AS BIGINT) AS intercept_x100,
       CAST(ROUND(REGR_R2(l_extendedprice, l_quantity) * 10000) AS BIGINT) AS r2_bp
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  /** NULL-SAFE equi join (<=>): null keys MATCH each other instead of dropping —
    * the join-key form of q57's scalar null-safe equality. Catalyst still plans a
    * hash join (the key is wrapped so null hashes consistently); the corpus's
    * plain equi joins silently drop null keys, and this is the declared opt-out.
    * Fixture: NULLIF turns status 'P' into a null key on both sides. */
  private def q95(s: SparkSession, d: String): DataFrame = {
    val o = T.orders(s, d).withColumn("k", expr("NULLIF(o_orderstatus, 'P')"))
    val dim = o.select(col("k").as("dk")).distinct()
    o.join(dim, col("k") <=> col("dk"))
      .groupBy(coalesce(col("dk"), lit("P_NULL")).as("key"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("key"))
  }

  private val q95Sql =
    """WITH o AS (SELECT NULLIF(o_orderstatus, 'P') AS k FROM orders),
       d AS (SELECT DISTINCT k AS dk FROM o)
       SELECT COALESCE(dk, 'P_NULL') AS key, COUNT(*) AS n
       FROM o JOIN d ON o.k IS NOT DISTINCT FROM d.dk
       GROUP BY 1 ORDER BY key"""

  /** collect_list, array_sort'ed for determinism, emitted as a CSV string. */
  private def q13(s: SparkSession, d: String): DataFrame =
    T.orders(s, d)
      .filter(col("o_custkey") < 50)
      .groupBy(col("o_custkey"))
      .agg(
        expr("array_join(transform(array_sort(collect_list(o_orderkey)), x -> cast(x AS string)), ',')")
          .as("order_keys"),
        expr("array_join(array_sort(collect_set(o_orderstatus)), ',')").as("statuses"))
      .orderBy(col("o_custkey"))

  private val q13Sql =
    """SELECT o_custkey, array_to_string(list_sort(list(o_orderkey)), ',') AS order_keys,
       array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses
       FROM orders WHERE o_custkey < 50
       GROUP BY o_custkey ORDER BY o_custkey"""

  /** Ranking windows: row_number/ntile over a unique ordering, rank/dense_rank over a
    * tie-prone bucket ordering (deterministic because ties receive equal ranks). */
  private def q14(s: SparkSession, d: String): DataFrame = {
    val bucket = floor(col("o_totalprice") / 100000).as("price_bucket")
    val wUnique = Window.partitionBy(col("o_custkey"))
      .orderBy(col("price_bucket").desc, col("o_orderkey"))
    val wTies = Window.partitionBy(col("o_custkey")).orderBy(col("price_bucket").desc)
    T.orders(s, d)
      .filter(col("o_custkey") < 30)
      .withColumn("price_bucket", bucket)
      .withColumn("rn", row_number().over(wUnique))
      .withColumn("nt", ntile(4).over(wUnique))
      .withColumn("rnk", rank().over(wTies))
      .withColumn("drnk", dense_rank().over(wTies))
      .select(col("o_custkey"), col("o_orderkey"), col("price_bucket"),
        col("rn"), col("nt"), col("rnk"), col("drnk"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  private val q14Sql =
    """SELECT o_custkey, o_orderkey,
       CAST(FLOOR(o_totalprice / 100000) AS BIGINT) AS price_bucket,
       CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY FLOOR(o_totalprice / 100000) DESC, o_orderkey) AS INT) AS rn,
       CAST(NTILE(4) OVER (PARTITION BY o_custkey ORDER BY FLOOR(o_totalprice / 100000) DESC, o_orderkey) AS INT) AS nt,
       CAST(RANK() OVER (PARTITION BY o_custkey ORDER BY FLOOR(o_totalprice / 100000) DESC) AS INT) AS rnk,
       CAST(DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY FLOOR(o_totalprice / 100000) DESC) AS INT) AS drnk
       FROM orders WHERE o_custkey < 30
       ORDER BY o_custkey, o_orderkey"""

  /** Aggregate windows with explicit frames: cumulative (rows unbounded..current),
    * sliding rows frame, and a RANGE frame over a numeric ordering. */
  private def q15(s: SparkSession, d: String): DataFrame = {
    val wCum = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wSlide = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(-2, Window.currentRow)
    // RANGE frame needs a long ordering key -> whole cents via floor (floor, not
    // cast: DuckDB casts round-to-nearest while Spark truncates).
    val wRange = Window.partitionBy(col("o_custkey"))
      .orderBy(floor(col("o_totalprice") * 100).as("cents"))
      .rangeBetween(-100000L, 0L)
    T.orders(s, d)
      .filter(col("o_custkey") < 50)
      .select(
        col("o_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        round(sum(col("o_totalprice")).over(wCum), 2).as("running_total"),
        // cents-scaled integer: sliding frames sum in different orders across
        // engines (Spark recomputes the frame, DuckDB uses a segment tree), so the
        // doubles differ in the last ulp and ROUND(x,2) flips on boundary values;
        // a /3 average times 100 can never land exactly on .5, so this is tie-free
        round(avg(col("o_totalprice")).over(wSlide) * 100).cast("long").as("mov_avg3_x100"),
        count(lit(1)).over(wRange).as("n_within_1000"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  private val q15Sql =
    """SELECT o_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
       CAST(ROUND(AVG(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) * 100) AS BIGINT) AS mov_avg3_x100,
       COUNT(*) OVER (PARTITION BY o_custkey ORDER BY CAST(FLOOR(o_totalprice * 100) AS BIGINT)
         RANGE BETWEEN 100000 PRECEDING AND CURRENT ROW) AS n_within_1000
       FROM orders WHERE o_custkey < 50
       ORDER BY o_custkey, o_orderkey"""

  /** Global multi-key sort + limit (top 100 orders). */
  private def q16(s: SparkSession, d: String): DataFrame =
    T.orders(s, d)
      .select(
        col("o_orderkey"), col("o_orderpriority"),
        round(col("o_totalprice"), 2).as("o_totalprice"))
      .orderBy(col("o_orderpriority").asc, col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(100)

  private val q16Sql =
    """SELECT o_orderkey, o_orderpriority, ROUND(o_totalprice, 2) AS o_totalprice
       FROM orders
       ORDER BY o_orderpriority ASC, o_totalprice DESC, o_orderkey ASC
       LIMIT 100"""

  /** Top-k per group via window filter (top-3 orders per customer by price). */
  private def q17(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    T.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("o_totalprice"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  private val q17Sql =
    """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
         SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice,
           CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
         FROM orders) t
       WHERE rn <= 3
       ORDER BY o_custkey, rn"""

  /** Set operations: union all / union distinct over recombined splits. */
  private def q18(s: SparkSession, d: String): DataFrame = {
    val li = T.lineitem(s, d).select(col("l_orderkey"), col("l_linenumber"))
    val a  = li.filter(col("l_linenumber") <= 3)
    val b  = li.filter(col("l_linenumber") >= 3)
    val ua = a.unionAll(b).agg(count(lit(1)).as("n")).select(lit("union_all").as("op"), col("n"))
    val ud = a.union(b).distinct().agg(count(lit(1)).as("n")).select(lit("union_distinct").as("op"), col("n"))
    ua.unionAll(ud).orderBy(col("op"))
  }

  private val q18Sql =
    """WITH a AS (SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_linenumber <= 3),
            b AS (SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_linenumber >= 3)
       SELECT 'union_all' AS op, COUNT(*) AS n FROM (SELECT * FROM a UNION ALL SELECT * FROM b)
       UNION ALL
       SELECT 'union_distinct' AS op, COUNT(*) AS n FROM (SELECT * FROM a UNION SELECT * FROM b)
       ORDER BY op"""

  /** intersect / except and their ALL variants on customer keys. */
  private def q19(s: SparkSession, d: String): DataFrame = {
    val ordered = T.orders(s, d).select(col("o_custkey").as("k"))
    val all     = T.customer(s, d).select(col("c_custkey").as("k"))
    val i  = all.intersect(ordered.distinct()).agg(count(lit(1)).as("n"))
      .select(lit("intersect").as("op"), col("n"))
    val e  = all.except(ordered).agg(count(lit(1)).as("n"))
      .select(lit("except").as("op"), col("n"))
    val ia = ordered.intersectAll(ordered.filter(col("k") % 2 === 0))
      .agg(count(lit(1)).as("n")).select(lit("intersect_all").as("op"), col("n"))
    val ea = ordered.exceptAll(ordered.filter(col("k") % 2 === 0))
      .agg(count(lit(1)).as("n")).select(lit("except_all").as("op"), col("n"))
    i.unionAll(e).unionAll(ia).unionAll(ea).orderBy(col("op"))
  }

  private val q19Sql =
    """WITH ok AS (SELECT o_custkey AS k FROM orders),
            ck AS (SELECT c_custkey AS k FROM customer)
       SELECT 'intersect' AS op, COUNT(*) AS n FROM (SELECT k FROM ck INTERSECT SELECT k FROM ok)
       UNION ALL
       SELECT 'except' AS op, COUNT(*) AS n FROM (SELECT k FROM ck EXCEPT SELECT k FROM ok)
       UNION ALL
       SELECT 'intersect_all' AS op, COUNT(*) AS n
         FROM (SELECT k FROM ok INTERSECT ALL SELECT k FROM ok WHERE k % 2 = 0)
       UNION ALL
       SELECT 'except_all' AS op, COUNT(*) AS n
         FROM (SELECT k FROM ok EXCEPT ALL SELECT k FROM ok WHERE k % 2 = 0)
       ORDER BY op"""

  /** dropDuplicates on a subset — keep-any semantics, so only the count is declared
    * (SURVEY.md §2b determinism convention 4). */
  private def q20(s: SparkSession, d: String): DataFrame =
    T.events(s, d)
      .dropDuplicates("user_id", "event_type")
      .agg(count(lit(1)).as("n_distinct_pairs"))
      .select(col("n_distinct_pairs"))
      .orderBy(col("n_distinct_pairs"))

  private val q20Sql =
    """SELECT COUNT(*) AS n_distinct_pairs
       FROM (SELECT DISTINCT user_id, event_type FROM events)
       ORDER BY n_distinct_pairs"""

  /** Skew-salted join declared as a contract row: the fact side's hot keys are
    * spread across 8 salts (operators.SaltedJoin — deterministic row-identity
    * salt, small side replicated 8×), so one hot supplier cannot pin a single
    * reducer at 100 TB. Salting is plan-internal: the aggregated result is
    * EXACTLY the plain join's, which is what the DuckDB oracle checks. */
  private def q76(s: SparkSession, d: String): DataFrame = {
    val li = T.lineitem(s, d)
      .select(col("l_suppkey"), col("l_extendedprice"))
    val sup = T.supplier(s, d)
      .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
    graft.operators.SaltedJoin.inner(li, sup, "l_suppkey", n = 8)
      .groupBy(col("s_nationkey"))
      .agg(
        count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice")), 2).as("revenue"))
      .orderBy(col("s_nationkey"))
  }

  private val q76Sql =
    """SELECT s_nationkey, COUNT(*) AS n_items,
       ROUND(SUM(l_extendedprice), 2) AS revenue
       FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
       GROUP BY s_nationkey
       ORDER BY s_nationkey"""

  val defs: Seq[QDef] = Seq(
    QDef("q01_pricing_summary", q01, Some(q01Sql)),
    QDef("q02_filter_predicates", q02, Some(q02Sql)),
    QDef("q03_star_join_revenue", q03, Some(q03Sql)),
    QDef("q04_outer_join_agg", q04, Some(q04Sql)),
    QDef("q05_semi_join", q05, Some(q05Sql)),
    QDef("q06_anti_join", q06, Some(q06Sql)),
    QDef("q07_theta_join", q07, Some(q07Sql)),
    QDef("q08_cross_join", q08, Some(q08Sql)),
    QDef("q09_agg_distinct_conditional", q09, Some(q09Sql)),
    QDef("q10_rollup", q10, Some(q10Sql)),
    QDef("q11_cube", q11, Some(q11Sql)),
    QDef("q12_stats_family", q12, Some(q12Sql)),
    QDef("q89_bivariate_stats", q89, Some(q89Sql)),
    QDef("q95_nullsafe_join", q95, Some(q95Sql)),
    QDef("q13_collect_list", q13, Some(q13Sql)),
    QDef("q14_window_ranking", q14, Some(q14Sql)),
    QDef("q15_window_frames", q15, Some(q15Sql)),
    QDef("q16_sort_limit", q16, Some(q16Sql)),
    QDef("q17_topk_per_group", q17, Some(q17Sql)),
    QDef("q18_union_ops", q18, Some(q18Sql)),
    QDef("q19_intersect_except", q19, Some(q19Sql)),
    QDef("q20_dedup_subset", q20, Some(q20Sql)),
    QDef("q76_salted_skew_join", q76, Some(q76Sql)),
  )
}
