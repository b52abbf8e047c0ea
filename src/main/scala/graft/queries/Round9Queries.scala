package graft.queries

import graft.{QDef, Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-9 surface: the scalar/aggregate families a reference-parity user
  * still reaches for daily and nothing in q01–q170 exercised — higher-moment
  * aggregates (skewness/kurtosis), schema'd CSV scalar functions (to_csv /
  * from_csv — the LINE-level twin of the q53 file-level CSV scan), the
  * calendar-construction family (make_date / last_day / quarter / ISO week /
  * day-of-week), the split_part / translate / str_to_map string batch, a
  * truncated EWMA over per-user event streams (the smoothing analytic every
  * monitoring pipeline computes), and regexp_extract_all with explode (the
  * extract-ALL-matches shape PII/token mining needs, vs q21's first-match
  * regexp_extract).
  *
  * All queries follow the SURVEY.md §2b determinism conventions (trailing
  * total-order sort, integer or ROUND(x,2) outputs, DuckDB HUGEINT casts).
  */
object Round9Queries {

  // --------------------------------------------------------------------------
  // q171: higher-moment aggregate family — skewness and kurtosis (Spark's
  // definitions: POPULATION central moments, kurtosis as EXCESS m4/m2²−3).
  // DuckDB's skewness()/kurtosis() are the bias-CORRECTED sample versions, so
  // the oracle derives Spark's definitions from raw power sums (E[x^k]) with
  // explicit central-moment algebra — which is also why the measured column is
  // l_quantity (domain 1..50): the e4 term stays ~1e6, far inside double
  // precision, where o_totalprice's 1e5 scale would push e4 to 1e20 and turn
  // the cancellation into noise. At 100 TB both sides are single hash
  // aggregates (Spark's moments partial-aggregate; the oracle's power sums
  // trivially so) — no second pass, no per-group sort.
  // --------------------------------------------------------------------------
  private def q171(s: SparkSession, d: String): DataFrame =
    T.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      // `+ 0.0` after ROUND on BOTH sides: DuckDB's ROUND(-0.00173, 2) yields
      // IEEE -0.0 while Spark's BigDecimal HALF_UP round yields +0.0, and the
      // driver's value hash distinguishes the two bit patterns (round-7 q171
      // hash FAIL). IEEE guarantees -0.0 + 0.0 = +0.0, so the addition
      // canonicalizes the zero sign without moving any nonzero value.
      .agg(count(lit(1)).as("n"),
        (round(skewness(col("l_quantity")), 2) + lit(0.0)).as("skew"),
        (round(kurtosis(col("l_quantity")), 2) + lit(0.0)).as("kurt"))
      .orderBy(col("l_returnflag"))

  private val q171Sql =
    """WITH m AS (
         SELECT l_returnflag, COUNT(*) AS n,
                AVG(l_quantity) AS e1, AVG(POWER(l_quantity, 2)) AS e2,
                AVG(POWER(l_quantity, 3)) AS e3, AVG(POWER(l_quantity, 4)) AS e4
         FROM lineitem GROUP BY l_returnflag)
       SELECT l_returnflag, n,
         ROUND((e3 - 3*e1*e2 + 2*POWER(e1, 3))
               / POWER(e2 - e1*e1, 1.5), 2) + 0.0 AS skew,
         ROUND((e4 - 4*e1*e3 + 6*e1*e1*e2 - 3*POWER(e1, 4))
               / POWER(e2 - e1*e1, 2) - 3, 2) + 0.0 AS kurt
       FROM m ORDER BY l_returnflag"""

  // --------------------------------------------------------------------------
  // q172: schema'd CSV SCALAR functions — to_csv(struct) serializes each row
  // to one CSV line, from_csv parses it back under an explicit DDL schema
  // (schema inference off, same contract as the q26 JSON twins). The query
  // proves the round-trip is lossless by aggregating the PARSED copy and
  // hash-matching the aggregate of the original. This is the message-bus
  // shape (CSV payloads inside a column — Kafka values, log lines), distinct
  // from the q53 FILE-level CSV scan; per-row codegen'd expressions, no
  // shuffle beyond the final aggregate, so it scales like any projection.
  // --------------------------------------------------------------------------
  private def q172(s: SparkSession, d: String): DataFrame =
    T.orders(s, d)
      .select(to_csv(struct(col("o_orderkey"), col("o_orderstatus"),
        col("o_orderpriority"))).as("line"))
      .select(from_csv(col("line"),
        org.apache.spark.sql.types.StructType.fromDDL(
          "k BIGINT, st STRING, pr STRING"),
        Map.empty[String, String]).as("r"))
      .groupBy(col("r.st").as("st"))
      .agg(count(lit(1)).as("n"), sum(col("r.k")).as("key_sum"),
        countDistinct(col("r.pr")).as("n_prio"))
      .orderBy(col("st"))

  private val q172Sql =
    """SELECT o_orderstatus AS st, COUNT(*) AS n,
              CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
              COUNT(DISTINCT o_orderpriority) AS n_prio
       FROM orders GROUP BY st ORDER BY st"""

  // --------------------------------------------------------------------------
  // q173: calendar-construction family — make_date (build a date from parts),
  // last_day (month end), quarter, weekofyear (ISO week), dayofweek. All are
  // codegen'd date arithmetic on the int epoch-day domain — free at any
  // scale. Convention mapping pinned in the oracle: Spark dayofweek is
  // 1=Sunday, DuckDB's is 0=Sunday (hence the +1); both weekofyear are ISO.
  // The month-reconstruction (make_date(year, month, 1)) doubling as the
  // GROUP key proves make_date agrees with date_trunc exactly.
  // --------------------------------------------------------------------------
  private def q173(s: SparkSession, d: String): DataFrame =
    T.orders(s, d)
      .select(to_date(col("o_orderdate")).as("od"))
      .select(
        make_date(year(col("od")), month(col("od")), lit(1)).as("month_start"),
        last_day(col("od")).as("ld"),
        quarter(col("od")).as("q"),
        weekofyear(col("od")).as("wk"),
        dayofweek(col("od")).as("dow"))
      .groupBy(col("month_start"))
      .agg(count(lit(1)).as("n"),
        date_format(max(col("ld")), "yyyy-MM-dd").as("month_end"),
        max(col("q")).as("q"),
        countDistinct(col("wk")).as("n_weeks"),
        sum(col("dow")).as("dow_sum"))
      .select(date_format(col("month_start"), "yyyy-MM-dd").as("month_start"),
        col("n"), col("month_end"), col("q"), col("n_weeks"), col("dow_sum"))
      .orderBy(col("month_start"))

  private val q173Sql =
    """WITH c AS (SELECT CAST(o_orderdate AS DATE) AS od FROM orders)
       SELECT strftime(make_date(CAST(year(od) AS INT), CAST(month(od) AS INT), 1),
                       '%Y-%m-%d') AS month_start,
              COUNT(*) AS n,
              strftime(MAX(last_day(od)), '%Y-%m-%d') AS month_end,
              CAST(MAX(quarter(od)) AS INT) AS q,
              COUNT(DISTINCT weekofyear(od)) AS n_weeks,
              CAST(SUM(dayofweek(od) + 1) AS BIGINT) AS dow_sum
       FROM c
       GROUP BY make_date(CAST(year(od) AS INT), CAST(month(od) AS INT), 1)
       ORDER BY month_start"""

  // --------------------------------------------------------------------------
  // q174: string-surface batch — split_part (field extraction by delimiter,
  // the log-parsing staple), translate (character-map transliteration),
  // str_to_map (delimited key-value payloads → MAP + element_at lookup), and
  // reverse/repeat. str_to_map has no DuckDB twin, so the oracle extracts the
  // same values with anchored regexes — which is exactly the point of the
  // query: the MAP route and the regex route must agree byte-for-byte. All
  // codegen'd per-row expressions; the only shuffle is the final aggregate.
  // --------------------------------------------------------------------------
  private def q174(s: SparkSession, d: String): DataFrame =
    T.orders(s, d)
      .select(
        split_part(col("o_orderpriority"), lit("-"), lit(2)).as("prio_word"),
        translate(col("o_orderstatus"), "FOP", "fop").as("st_lc"),
        expr("str_to_map(concat('st:', o_orderstatus, ',pr:', " +
          "split_part(o_orderpriority, '-', 1)), ',', ':')").as("kv"),
        reverse(col("o_orderstatus")).as("st_rev"))
      .select(col("prio_word"), col("st_lc"),
        element_at(col("kv"), "st").as("kv_st"),
        expr("repeat(element_at(kv, 'pr'), 2)").as("pr2"),
        col("st_rev"))
      .groupBy(col("prio_word"), col("st_lc"), col("kv_st"), col("pr2"))
      .agg(count(lit(1)).as("n"), max(col("st_rev")).as("max_rev"))
      .orderBy(col("prio_word"), col("st_lc"), col("kv_st"), col("pr2"))

  private val q174Sql =
    """WITH c AS (
         SELECT split_part(o_orderpriority, '-', 2) AS prio_word,
                translate(o_orderstatus, 'FOP', 'fop') AS st_lc,
                regexp_extract(concat('st:', o_orderstatus, ',pr:',
                  split_part(o_orderpriority, '-', 1)), 'st:([^,]*)', 1) AS kv_st,
                repeat(regexp_extract(concat('st:', o_orderstatus, ',pr:',
                  split_part(o_orderpriority, '-', 1)), 'pr:([^,]*)', 1), 2) AS pr2,
                reverse(o_orderstatus) AS st_rev
         FROM orders)
       SELECT prio_word, st_lc, kv_st, pr2, COUNT(*) AS n, MAX(st_rev) AS max_rev
       FROM c GROUP BY prio_word, st_lc, kv_st, pr2
       ORDER BY prio_word, st_lc, kv_st, pr2"""

  // --------------------------------------------------------------------------
  // q175: truncated EWMA (α=0.25, window K=8) over per-user event streams —
  // the smoothing analytic monitoring pipelines compute, expressed as a
  // frame-bounded collect + an `aggregate` higher-order fold (acc·¾ + x·¼
  // seeded with the oldest element), which keeps the recursion INSIDE one
  // window pass: no self-join, no UDF, partition-parallel by user at any
  // scale. Only rows with a full 8-deep history emit (prefix rows would need
  // an initialization convention both engines agree on), which also gives the
  // oracle a closed form: ¾⁷·x₋₇ + Σⱼ₌₀..₆ ¼·¾ʲ·x₋ⱼ over 8 window lags. α is
  // a power of two, so weight arithmetic is exact in binary and the two
  // evaluation orders agree to the last ulp long before ROUND(·,2).
  // --------------------------------------------------------------------------
  private def q175(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    T.events(s, d)
      .withColumn("xs", collect_list(col("value")).over(w.rowsBetween(-7, 0)))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") >= 8)
      .withColumn("ewma", expr(
        "aggregate(slice(xs, 2, 7), element_at(xs, 1), " +
          "(acc, x) -> acc * 0.75D + x * 0.25D)"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(avg(col("ewma")), 2).as("avg_ewma"))
      .orderBy(col("event_type"))
  }

  private val q175Sql =
    """WITH o AS (
         SELECT event_type, value,
                ROW_NUMBER() OVER w AS rn,
                LAG(value, 7) OVER w AS x7, LAG(value, 6) OVER w AS x6,
                LAG(value, 5) OVER w AS x5, LAG(value, 4) OVER w AS x4,
                LAG(value, 3) OVER w AS x3, LAG(value, 2) OVER w AS x2,
                LAG(value, 1) OVER w AS x1
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
       SELECT event_type, COUNT(*) AS n,
              ROUND(AVG(
                POWER(0.75, 7) * x7
                + 0.25 * (POWER(0.75, 6) * x6 + POWER(0.75, 5) * x5
                + POWER(0.75, 4) * x4 + POWER(0.75, 3) * x3
                + POWER(0.75, 2) * x2 + POWER(0.75, 1) * x1
                + value)), 2) AS avg_ewma
       FROM o WHERE rn >= 8
       GROUP BY event_type ORDER BY event_type"""

  // --------------------------------------------------------------------------
  // q176: regexp_extract_all + explode — ALL matches per row (q21's
  // regexp_extract surfaces only the first), the shape token mining, PII
  // sweeps, and link extraction actually need. Long-word profile per source:
  // lowercase, extract every [a-z]{8,} run, explode, aggregate. Both engines
  // use leftmost non-overlapping match semantics and the pattern avoids any
  // syntax where Java and RE2-style dialects diverge. Generator + hash agg:
  // the explode is pipelined (no materialized token table), the only shuffle
  // is the final per-source aggregate.
  // --------------------------------------------------------------------------
  private def q176(s: SparkSession, d: String): DataFrame =
    T.documents(s, d)
      .select(col("source"),
        explode(expr("regexp_extract_all(lower(text), '[a-z]{8,}', 0)")).as("w"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_hits"),
        countDistinct(col("w")).as("n_distinct"),
        min(col("w")).as("first_word"),
        max(col("w")).as("last_word"))
      .orderBy(col("source"))

  private val q176Sql =
    """WITH t AS (
         SELECT source, unnest(regexp_extract_all(lower(text), '[a-z]{8,}')) AS w
         FROM documents)
       SELECT source, COUNT(*) AS n_hits, COUNT(DISTINCT w) AS n_distinct,
              MIN(w) AS first_word, MAX(w) AS last_word
       FROM t GROUP BY source ORDER BY source"""

  // --------------------------------------------------------------------------
  // q179: the SQL UNPIVOT clause (SPARK-39877) — q77 exercises Dataset.unpivot;
  // this is the SQL-surface twin a SQL-first user writes. Resolution-time
  // sugar: the plan is an Expand over the wide aggregate, identical to the
  // Dataset form, so it costs one hash agg + a generator at any scale. The
  // oracle hand-rolls the same reshape with UNION ALL so the check does not
  // depend on DuckDB's own UNPIVOT dialect.
  // --------------------------------------------------------------------------
  private def q179(s: SparkSession, d: String): DataFrame = {
    T.orders(s, d).createOrReplaceTempView("v_orders_r9")
    s.sql(
      """WITH wide AS (
           SELECT o_orderstatus AS st,
                  CAST(COUNT(*) AS BIGINT) AS n_orders,
                  CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
                  CAST(MAX(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS max_cents
           FROM v_orders_r9 GROUP BY o_orderstatus)
         SELECT st, metric, val
         FROM wide UNPIVOT (val FOR metric IN (n_orders, sum_cents, max_cents))
         ORDER BY st, metric""")
  }

  private val q179Sql =
    """WITH wide AS (
         SELECT o_orderstatus AS st,
                CAST(COUNT(*) AS BIGINT) AS n_orders,
                CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
                CAST(MAX(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS max_cents
         FROM orders GROUP BY o_orderstatus)
       SELECT st, 'n_orders' AS metric, n_orders AS val FROM wide
       UNION ALL SELECT st, 'sum_cents', sum_cents FROM wide
       UNION ALL SELECT st, 'max_cents', max_cents FROM wide
       ORDER BY st, metric"""

  // --------------------------------------------------------------------------
  // q180: IGNORE NULLS window navigation — forward-fill (last non-null up to
  // the row), previous non-null (strictly before), and BACKWARD-fill (next
  // non-null after) over sparse per-user readings. q116 covers grid-resampled
  // forward-fill; this is the row-based family on all three directions — the
  // sensor-gap/sessionization staple. Planted nulls (event_id % 3) make the
  // skip behavior non-vacuous. Everything is one window pass per direction,
  // partitioned by user — no self-join, integer cents → exact sums.
  // --------------------------------------------------------------------------
  private def q180(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    T.events(s, d)
      .withColumn("v", when(col("event_id") % 3 === 0, lit(null))
        .otherwise(expr("CAST(FLOOR(value * 100) AS BIGINT)")))
      .withColumn("carry",
        last(col("v"), ignoreNulls = true).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("prev_nn",
        last(col("v"), ignoreNulls = true).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("next_nn",
        first(col("v"), ignoreNulls = true).over(w.rowsBetween(1, Window.unboundedFollowing)))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null"),
        sum(coalesce(col("carry"), lit(0L))).as("sum_ffill"),
        sum(coalesce(col("prev_nn"), lit(0L))).as("sum_prev"),
        sum(coalesce(col("next_nn"), lit(0L))).as("sum_bfill"))
      .orderBy(col("event_type"))
  }

  private val q180Sql =
    """WITH base AS (
         SELECT event_type, user_id, ts, event_id,
                CASE WHEN event_id % 3 = 0 THEN NULL
                     ELSE CAST(FLOOR(value * 100) AS BIGINT) END AS v
         FROM events),
       nav AS (
         SELECT event_type, v,
                LAST_VALUE(v IGNORE NULLS) OVER
                  (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carry,
                LAST_VALUE(v IGNORE NULLS) OVER
                  (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_nn,
                FIRST_VALUE(v IGNORE NULLS) OVER
                  (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_nn
         FROM base)
       SELECT event_type, COUNT(*) AS n,
              CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
              CAST(SUM(COALESCE(carry, 0)) AS BIGINT) AS sum_ffill,
              CAST(SUM(COALESCE(prev_nn, 0)) AS BIGINT) AS sum_prev,
              CAST(SUM(COALESCE(next_nn, 0)) AS BIGINT) AS sum_bfill
       FROM nav GROUP BY event_type ORDER BY event_type"""

  val defs: Seq[QDef] = Seq(
    QDef("q171_higher_moments", q171, Some(q171Sql)),
    QDef("q172_csv_scalar_roundtrip", q172, Some(q172Sql)),
    QDef("q173_calendar_family", q173, Some(q173Sql)),
    QDef("q174_string_surface", q174, Some(q174Sql)),
    QDef("q175_ewma", q175, Some(q175Sql)),
    QDef("q176_regexp_extract_all", q176, Some(q176Sql)),
    QDef("q179_sql_unpivot", q179, Some(q179Sql)),
    QDef("q180_ignore_nulls_nav", q180, Some(q180Sql)))
}
