package graft.queries

import graft.{QDef, Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar function groups (SURVEY.md §2b): string, date, math, conditional, array
  * higher-order, map/json. All built-in `functions._` — codegen'd, no UDFs — so every
  * expression stays inside whole-stage codegen and pushes work into the scan where
  * possible (projection pruning means only referenced columns are read).
  */
object ScalarQueries {

  /** String functions over customer names ("Customer#NNNNNNNNN"). */
  private def q21(s: SparkSession, d: String): DataFrame =
    T.customer(s, d)
      .filter(col("c_custkey") < 100)
      .select(
        col("c_custkey"),
        upper(col("c_name")).as("uname"),
        lower(col("c_mktsegment")).as("lseg"),
        length(col("c_name")).as("name_len"),
        substring(col("c_name"), 1, 8).as("prefix"),
        concat(col("c_name"), lit("/"), col("c_mktsegment")).as("joined"),
        lpad(col("c_custkey").cast("string"), 8, "0").as("padded"),
        regexp_replace(col("c_name"), "[0-9]", "*").as("starred"),
        regexp_extract(col("c_name"), "[0-9]+", 0).as("digits"),
        element_at(split(col("c_name"), "#"), 2).as("num_part"),
        trim(lit("  x  ")).as("trimmed"),
        expr("replace(c_name, 'Customer', 'Cust')").as("short_name"),
        col("c_name").like("Customer#%").as("is_customer"))
      .orderBy(col("c_custkey"))

  private val q21Sql =
    """SELECT c_custkey,
       UPPER(c_name) AS uname,
       LOWER(c_mktsegment) AS lseg,
       CAST(LENGTH(c_name) AS INT) AS name_len,
       SUBSTR(c_name, 1, 8) AS prefix,
       CONCAT(c_name, '/', c_mktsegment) AS joined,
       LPAD(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
       REGEXP_REPLACE(c_name, '[0-9]', '*', 'g') AS starred,
       REGEXP_EXTRACT(c_name, '[0-9]+') AS digits,
       STRING_SPLIT(c_name, '#')[2] AS num_part,
       TRIM('  x  ') AS trimmed,
       REPLACE(c_name, 'Customer', 'Cust') AS short_name,
       (c_name LIKE 'Customer#%') AS is_customer
       FROM customer WHERE c_custkey < 100
       ORDER BY c_custkey"""

  /** Date/time functions over lineitem ship dates (timestamps compared/emitted as
    * strings or ints only — never raw timestamps, per the determinism conventions). */
  private def q22(s: SparkSession, d: String): DataFrame =
    T.lineitem(s, d)
      .filter(col("l_orderkey") < 200)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        year(col("l_shipdate")).as("ship_year"),
        month(col("l_shipdate")).as("ship_month"),
        dayofmonth(col("l_shipdate")).as("ship_day"),
        quarter(col("l_shipdate")).as("ship_quarter"),
        dayofweek(col("l_shipdate")).as("ship_dow"),
        date_format(date_trunc("month", col("l_shipdate")), "yyyy-MM-dd").as("ship_month_start"),
        date_format(date_add(col("l_shipdate"), 30), "yyyy-MM-dd").as("due_date"),
        datediff(col("l_shipdate"), to_date(lit("1995-01-01"))).as("days_since_95"),
        unix_timestamp(col("l_shipdate")).as("ship_epoch"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  private val q22Sql =
    """SELECT l_orderkey, l_linenumber,
       CAST(YEAR(l_shipdate) AS INT) AS ship_year,
       CAST(MONTH(l_shipdate) AS INT) AS ship_month,
       CAST(DAY(l_shipdate) AS INT) AS ship_day,
       CAST(QUARTER(l_shipdate) AS INT) AS ship_quarter,
       CAST(DAYOFWEEK(l_shipdate) + 1 AS INT) AS ship_dow,
       STRFTIME(DATE_TRUNC('month', l_shipdate), '%Y-%m-%d') AS ship_month_start,
       STRFTIME(l_shipdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
       CAST(DATE_DIFF('day', DATE '1995-01-01', l_shipdate) AS INT) AS days_since_95,
       CAST(EPOCH(l_shipdate) AS BIGINT) AS ship_epoch
       FROM lineitem WHERE l_orderkey < 200
       ORDER BY l_orderkey, l_linenumber"""

  /** Math functions on prices/quantities. */
  private def q23(s: SparkSession, d: String): DataFrame =
    T.lineitem(s, d)
      .filter(col("l_orderkey") < 200)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice"), 1).as("price_r1"),
        floor(col("l_extendedprice")).as("price_floor"),
        ceil(col("l_extendedprice")).as("price_ceil"),
        round(abs(col("l_discount") - 0.05), 2).as("disc_dev"),
        round(sqrt(col("l_quantity")), 2).as("qty_sqrt"),
        round(pow(col("l_quantity"), 2), 2).as("qty_sq"),
        round(log(col("l_extendedprice")), 2).as("price_ln"),
        round(exp(col("l_discount")), 2).as("disc_exp"),
        (col("l_orderkey") % 7).as("key_mod7"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  private val q23Sql =
    """SELECT l_orderkey, l_linenumber,
       ROUND(l_extendedprice, 1) AS price_r1,
       CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
       CAST(CEIL(l_extendedprice) AS BIGINT) AS price_ceil,
       ROUND(ABS(l_discount - 0.05), 2) AS disc_dev,
       ROUND(SQRT(l_quantity), 2) AS qty_sqrt,
       ROUND(POW(l_quantity, 2), 2) AS qty_sq,
       ROUND(LN(l_extendedprice), 2) AS price_ln,
       ROUND(EXP(l_discount), 2) AS disc_exp,
       l_orderkey % 7 AS key_mod7
       FROM lineitem WHERE l_orderkey < 200
       ORDER BY l_orderkey, l_linenumber"""

  /** Conditional functions: CASE WHEN, coalesce, nullif, greatest, least. */
  private def q24(s: SparkSession, d: String): DataFrame =
    T.customer(s, d)
      .select(
        col("c_custkey"),
        when(col("c_acctbal") < 0, "overdrawn")
          .when(col("c_acctbal") < 5000, "standard")
          .otherwise("premium").as("tier"),
        coalesce(nullif(col("c_mktsegment"), lit("MACHINERY")), lit("OTHER")).as("seg_or_other"),
        round(greatest(col("c_acctbal"), lit(0.0)), 2).as("bal_floor0"),
        round(least(col("c_acctbal"), lit(1000.0)), 2).as("bal_cap1000"),
        (col("c_acctbal") > 0).as("in_credit"))
      .orderBy(col("c_custkey"))

  private val q24Sql =
    """SELECT c_custkey,
       CASE WHEN c_acctbal < 0 THEN 'overdrawn'
            WHEN c_acctbal < 5000 THEN 'standard'
            ELSE 'premium' END AS tier,
       COALESCE(NULLIF(c_mktsegment, 'MACHINERY'), 'OTHER') AS seg_or_other,
       ROUND(GREATEST(c_acctbal, 0.0), 2) AS bal_floor0,
       ROUND(LEAST(c_acctbal, 1000.0), 2) AS bal_cap1000,
       (c_acctbal > 0) AS in_credit
       FROM customer
       ORDER BY c_custkey"""

  /** Array higher-order functions over embeddings: size, element_at, slice,
    * transform/filter, aggregate-fold (L2 norm, sequential so both engines sum in the
    * same order → bitwise-identical doubles before rounding). */
  private def q25(s: SparkSession, d: String): DataFrame =
    T.embeddings(s, d)
      .filter(col("vec_id") < 100)
      .select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        round(element_at(col("embedding"), 1).cast("double"), 4).as("first_val"),
        round(expr("aggregate(embedding, CAST(0.0 AS DOUBLE), (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"), 4)
          .as("sq_norm"),
        round(expr("aggregate(slice(embedding, 1, 8), CAST(0.0 AS DOUBLE), (a, x) -> a + CAST(x AS DOUBLE))"), 4)
          .as("head8_sum"),
        size(expr("filter(embedding, x -> x > 0)")).as("n_pos"),
        round(array_max(col("embedding")).cast("double"), 4).as("max_val"),
        round(array_min(col("embedding")).cast("double"), 4).as("min_val"),
        // zip_with + reverse: self-reverse dot (palindromic correlation)
        round(expr(
          "aggregate(zip_with(embedding, reverse(embedding), (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (a, v) -> a + v)"), 4)
          .as("rev_dot"))
      .orderBy(col("vec_id"))

  private val q25Sql =
    """SELECT vec_id,
       CAST(LENGTH(embedding) AS INT) AS dim,
       ROUND(CAST(embedding[1] AS DOUBLE), 4) AS first_val,
       ROUND(LIST_REDUCE(LIST_PREPEND(CAST(0.0 AS DOUBLE), LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (a, b) -> a + b), 4) AS sq_norm,
       ROUND(LIST_REDUCE(LIST_PREPEND(CAST(0.0 AS DOUBLE), LIST_TRANSFORM(embedding[1:8], x -> CAST(x AS DOUBLE))), (a, b) -> a + b), 4) AS head8_sum,
       CAST(LENGTH(LIST_FILTER(embedding, x -> x > 0)) AS INT) AS n_pos,
       ROUND(CAST(LIST_MAX(embedding) AS DOUBLE), 4) AS max_val,
       ROUND(CAST(LIST_MIN(embedding) AS DOUBLE), 4) AS min_val,
       ROUND(LIST_REDUCE(LIST_PREPEND(CAST(0.0 AS DOUBLE),
         LIST_TRANSFORM(generate_series(1, len(embedding)),
           i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[len(embedding) + 1 - i] AS DOUBLE))),
         (a, v) -> a + v), 4) AS rev_dot
       FROM embeddings WHERE vec_id < 100
       ORDER BY vec_id"""

  /** Map / JSON functions over events.props ('{"k": N}'). */
  private def q26(s: SparkSession, d: String): DataFrame =
    T.events(s, d)
      .filter(col("event_id") < 500)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        expr("from_json(props, 'k INT').k").as("k_int"),
        expr("element_at(from_json(props, 'map<string,int>'), 'k')").as("k_map"),
        expr("size(map_keys(from_json(props, 'map<string,int>')))").as("n_keys"),
        to_json(struct(col("event_id").as("id"))).as("packed"))
      .orderBy(col("event_id"))

  private val q26Sql =
    """SELECT event_id,
       json_extract_string(props, '$.k') AS k_str,
       CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
       CAST(json_extract_string(props, '$.k') AS INT) AS k_map,
       CAST(LENGTH(json_keys(props)) AS INT) AS n_keys,
       CONCAT('{"id":', CAST(event_id AS VARCHAR), '}') AS packed
       FROM events WHERE event_id < 500
       ORDER BY event_id"""

  // --------------------------------------------------------------------------
  // q169: MONTH-BOUNDARY arithmetic — the calendar family where engines
  // disagree most subtly: add_months clamps to end-of-month (Jan 31 + 1 month
  // = Feb 29), last_day, next-weekday, quarter truncation, and days-in-month.
  // q22 covers plain day arithmetic; this pins the clamping semantics against
  // DuckDB's INTERVAL MONTH (which also clamps) so the hash proves both
  // engines implement the same calendar, not just the same datatypes.
  // Spark's next_day is replicated in the oracle with explicit dow offset
  // arithmetic ((target − dow + 6) % 7 + 1 — strictly-after semantics).
  // --------------------------------------------------------------------------
  private def q169(s: SparkSession, d: String): DataFrame =
    T.lineitem(s, d)
      .filter(col("l_orderkey") < 200)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        date_format(add_months(col("l_shipdate"), 1), "yyyy-MM-dd").as("plus_1m"),
        date_format(add_months(col("l_shipdate"), -2), "yyyy-MM-dd").as("minus_2m"),
        date_format(last_day(col("l_shipdate")), "yyyy-MM-dd").as("eom"),
        date_format(next_day(col("l_shipdate"), "Mon"), "yyyy-MM-dd").as("next_mon"),
        date_format(trunc(col("l_shipdate"), "quarter"), "yyyy-MM-dd").as("q_start"),
        (datediff(last_day(col("l_shipdate")), trunc(col("l_shipdate"), "mm")) + 1)
          .as("days_in_month"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  private val q169Sql =
    """SELECT l_orderkey, l_linenumber,
       STRFTIME(l_shipdate + INTERVAL 1 MONTH, '%Y-%m-%d') AS plus_1m,
       STRFTIME(l_shipdate - INTERVAL 2 MONTH, '%Y-%m-%d') AS minus_2m,
       STRFTIME(LAST_DAY(l_shipdate), '%Y-%m-%d') AS eom,
       STRFTIME(l_shipdate + CAST((1 - DAYOFWEEK(l_shipdate) + 6) % 7 + 1 AS INT)
                  * INTERVAL 1 DAY, '%Y-%m-%d') AS next_mon,
       STRFTIME(DATE_TRUNC('quarter', l_shipdate), '%Y-%m-%d') AS q_start,
       CAST(DATE_DIFF('day', DATE_TRUNC('month', l_shipdate), LAST_DAY(l_shipdate)) + 1
            AS INT) AS days_in_month
       FROM lineitem WHERE l_orderkey < 200
       ORDER BY l_orderkey, l_linenumber"""

  val defs: Seq[QDef] = Seq(
    QDef("q21_string_funcs", q21, Some(q21Sql)),
    QDef("q22_date_funcs", q22, Some(q22Sql)),
    QDef("q23_math_funcs", q23, Some(q23Sql)),
    QDef("q24_cond_funcs", q24, Some(q24Sql)),
    QDef("q25_array_funcs", q25, Some(q25Sql)),
    QDef("q26_map_json_funcs", q26, Some(q26Sql)),
    QDef("q169_month_arithmetic", q169, Some(q169Sql)),
  )
}
