package graft.queries

import graft.{QDef, Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 surface: exact order statistics (percentile_cont / percentile_disc
  * / median), a Markov transition matrix over event streams, gaps-and-islands
  * activity streaks, time-weighted averages over irregular samples, a
  * grid-blocked spatial self-join (the geo-join shape that replaces the
  * quadratic distance join), and a deterministic distributed enumerate (the
  * scalable alternative to `ROW_NUMBER() OVER ()`'s single-partition
  * collapse).
  *
  * All queries follow the SURVEY.md §2b determinism conventions (trailing
  * total-order sort, integer or ROUND(x,2) outputs, DuckDB HUGEINT casts).
  */
object Round8Queries {

  // --------------------------------------------------------------------------
  // q155: exact order-statistics family — percentile_cont (interpolating),
  // percentile_disc (value-selecting), median — the SQL-standard inverse
  // distribution functions, over integer cents so the .5 interpolation points
  // are exact in both engines (a cents median over an even count lands on
  // k or k.5 exactly; ×10 then BIGINT makes the hash exact — the q89 scaled-int
  // convention). These are HOLISTIC aggregates (unlike avg/sum they need the
  // sorted group), so Spark plans a per-group sort — the 100 TB note is that
  // they partial-aggregate via QuantileSummaries only in the approx_percentile
  // form (already covered by MetricsSpec); the exact form here is the
  // per-group-sort shape, correct when groups fit their partitions (4 flags →
  // 4 groups — the intended cardinality for exact order stats).
  // --------------------------------------------------------------------------
  private def q155(s: SparkSession, d: String): DataFrame =
    T.lineitem(s, d)
      .select(col("l_returnflag"),
        expr("CAST(FLOOR(l_extendedprice * 100) AS BIGINT)").as("price_c"))
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        expr("CAST(percentile_cont(0.5) WITHIN GROUP (ORDER BY price_c) * 10 AS BIGINT)")
          .as("p50_cont_x10"),
        expr("CAST(percentile_cont(0.9) WITHIN GROUP (ORDER BY price_c) * 10 AS BIGINT)")
          .as("p90_cont_x10"),
        expr("CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY price_c) AS BIGINT)")
          .as("p25_disc"),
        expr("CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY price_c) AS BIGINT)")
          .as("p75_disc"),
        expr("CAST(median(price_c) * 10 AS BIGINT)").as("median_x10"),
        min(col("price_c")).as("min_c"),
        max(col("price_c")).as("max_c"))
      .orderBy(col("l_returnflag"))

  private val q155Sql =
    """WITH c AS (SELECT l_returnflag,
                  CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS price_c
                  FROM lineitem)
       SELECT l_returnflag, COUNT(*) AS n,
         CAST(quantile_cont(price_c, 0.5) * 10 AS BIGINT) AS p50_cont_x10,
         CAST(quantile_cont(price_c, 0.9) * 10 AS BIGINT) AS p90_cont_x10,
         CAST(quantile_disc(price_c, 0.25) AS BIGINT) AS p25_disc,
         CAST(quantile_disc(price_c, 0.75) AS BIGINT) AS p75_disc,
         CAST(quantile_cont(price_c, 0.5) * 10 AS BIGINT) AS median_x10,
         MIN(price_c) AS min_c, MAX(price_c) AS max_c
       FROM c GROUP BY l_returnflag ORDER BY l_returnflag"""

  // --------------------------------------------------------------------------
  // q156: first-order Markov transition matrix over per-user event streams —
  // the session-analytics estimator (what follows what, and with what
  // probability). Shape: ONE window (lag-style lead within user, ordered by
  // (ts, event_id) — unique tie-break makes the sequence deterministic) + ONE
  // hash agg on (from, to) + a broadcast-sized from-state total join for the
  // probability. Per-user partitions keep the window distributed at 100 TB —
  // there is no global sort anywhere.
  // --------------------------------------------------------------------------
  private def q156(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val trans = T.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type").as("from_t"))
      .withColumn("to_t", lead(col("from_t"), 1).over(w))
      .where(col("to_t").isNotNull)
      .groupBy(col("from_t"), col("to_t")).agg(count(lit(1)).as("n_trans"))
    val fromTotals = trans.groupBy(col("from_t")).agg(sum(col("n_trans")).as("n_from"))
    trans.join(broadcast(fromTotals), "from_t")
      .select(col("from_t"), col("to_t"), col("n_trans"),
        expr("n_trans * 10000 DIV n_from").as("prob_bp"))
      .orderBy(col("from_t"), col("to_t"))
  }

  private val q156Sql =
    """WITH seq AS (
         SELECT event_type AS from_t,
                LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_t
         FROM events),
       trans AS (
         SELECT from_t, to_t, COUNT(*) AS n_trans
         FROM seq WHERE to_t IS NOT NULL GROUP BY from_t, to_t),
       tot AS (SELECT from_t, CAST(SUM(n_trans) AS BIGINT) AS n_from
               FROM trans GROUP BY from_t)
       SELECT t.from_t, t.to_t, t.n_trans,
              CAST(t.n_trans * 10000 // f.n_from AS BIGINT) AS prob_bp
       FROM trans t JOIN tot f ON t.from_t = f.from_t
       ORDER BY t.from_t, t.to_t"""

  // --------------------------------------------------------------------------
  // q157: gaps-and-islands — per-user streaks of CONSECUTIVE active days (the
  // DAU-streak / retention primitive). The classic trick: within each user,
  // day - row_number(day) is constant exactly across a run of consecutive
  // days, so islands fall out of one partitioned window + one hash agg — no
  // self-join, no sequence generation. Every window is per-user, so the shape
  // is embarrassingly partition-parallel at 100 TB.
  // --------------------------------------------------------------------------
  private def q157(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val days = T.events(s, d)
      .select(col("user_id"), expr("datediff(to_date(ts), DATE '1970-01-01')").as("day"))
      .distinct()
    val islands = days
      .withColumn("grp", col("day") - row_number().over(w))
      .groupBy(col("user_id"), col("grp")).agg(count(lit(1)).as("len"))
    islands.agg(
        countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_streaks"),
        max(col("len")).as("max_streak"),
        sum(col("len")).as("active_days"),
        sum(when(col("len") >= 3, 1).otherwise(0)).as("n_streaks_3plus"))
      .orderBy(col("n_users"))
  }

  private val q157Sql =
    """WITH days AS (
         SELECT DISTINCT user_id,
                (CAST(ts AS DATE) - DATE '1970-01-01') AS day
         FROM events),
       islands AS (
         SELECT user_id, day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS grp
         FROM days),
       agg AS (
         SELECT user_id, grp, COUNT(*) AS len
         FROM islands GROUP BY user_id, grp)
       SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
              COUNT(*) AS n_streaks,
              CAST(MAX(len) AS BIGINT) AS max_streak,
              CAST(SUM(len) AS BIGINT) AS active_days,
              CAST(SUM(CASE WHEN len >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_streaks_3plus
       FROM agg ORDER BY n_users"""

  // --------------------------------------------------------------------------
  // q158: time-weighted average over irregularly sampled readings — the
  // correct mean for sensor/price series where samples arrive at uneven
  // intervals (the arithmetic mean over-weights bursts). Each reading holds
  // until the user's next event (lead within user, (ts, event_id) order);
  // weight = holding interval in µs; last reading per user has no interval and
  // drops. Integer arithmetic throughout: value in cents, interval in µs, TWA
  // = Σ(v_c·dt) DIV Σ(dt) — hash-exact. Same scale shape as q156: per-user
  // windows, then one hash agg.
  // --------------------------------------------------------------------------
  private def q158(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    T.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        expr("CAST(FLOOR(value * 100) AS BIGINT)").as("v_c"),
        expr("unix_micros(ts)").as("us"))
      .withColumn("next_us", lead(col("us"), 1).over(w))
      .where(col("next_us").isNotNull)
      .withColumn("dt", col("next_us") - col("us"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_intervals"),
        sum(col("dt")).as("total_us"),
        expr("CAST(SUM(v_c * dt) DIV SUM(dt) AS BIGINT)").as("twa_c"))
      .orderBy(col("event_type"))
  }

  private val q158Sql =
    """WITH r AS (
         SELECT event_type,
                CAST(FLOOR(value * 100) AS BIGINT) AS v_c,
                epoch_us(ts) AS us,
                LEAD(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_us
         FROM events),
       iv AS (SELECT event_type, v_c, next_us - us AS dt FROM r WHERE next_us IS NOT NULL)
       SELECT event_type, COUNT(*) AS n_intervals,
              CAST(SUM(dt) AS BIGINT) AS total_us,
              CAST(SUM(v_c * dt) // SUM(dt) AS BIGINT) AS twa_c
       FROM iv GROUP BY event_type ORDER BY event_type"""

  // --------------------------------------------------------------------------
  // q159: grid-blocked spatial self-join — all point pairs within L∞ distance
  // r, without the quadratic distance join. Points hash to cells of side r;
  // a pair within r ALWAYS lands in the same or an adjacent cell, so the left
  // side fans out to its 3×3 cell neighborhood (a 9× row-local explode — cheap)
  // and the join is a plain EQUI-join on cell id, exact distance verified
  // inside the block only. Each qualifying pair is found exactly once (the
  // right side sits in its own cell; id ordering kills the mirror). This is
  // the geohash/S2 recipe every production geo pipeline runs — candidate
  // volume scales with point density per cell, never with n². Coordinates are
  // derived from event ids with plain integer arithmetic so the oracle (a
  // brute-force quadratic join, viable at oracle scale only) computes
  // identical points.
  // --------------------------------------------------------------------------
  private def q159(s: SparkSession, d: String): DataFrame = {
    val r = 500L
    val pts = T.events(s, d)
      .where(col("event_id") % 3 === 0)
      .select(col("event_id").as("id"),
        expr("(event_id * 48271) % 100000").as("x"),
        expr("(event_id * 69621) % 100000").as("y"))
    val right = pts
      .withColumn("cell", expr(s"(x DIV $r) * 1000 + (y DIV $r)"))
      .select(col("id").as("id2"), col("x").as("x2"), col("y").as("y2"), col("cell"))
    val left = pts
      .withColumn("dxy", explode(array(
        (for (dx <- -1 to 1; dy <- -1 to 1) yield lit(dx * 1000 + dy)): _*)))
      .select(col("id"), col("x"), col("y"),
        (expr(s"(x DIV $r) * 1000 + (y DIV $r)") + col("dxy")).as("cell"))
    val pairs = left.join(right, "cell")
      .where(col("id") < col("id2") &&
        abs(col("x") - col("x2")) <= r && abs(col("y") - col("y2")) <= r)
    pairs.agg(
        count(lit(1)).as("n_pairs"),
        sum(col("id") * 31 + col("id2")).as("checksum"),
        max(abs(col("x") - col("x2"))).as("max_dx"),
        max(abs(col("y") - col("y2"))).as("max_dy"))
      .orderBy(col("n_pairs"))
  }

  private val q159Sql =
    """WITH pts AS (
         SELECT event_id AS id,
                (event_id * 48271) % 100000 AS x,
                (event_id * 69621) % 100000 AS y
         FROM events WHERE event_id % 3 = 0),
       pairs AS (
         SELECT a.id AS id1, b.id AS id2,
                abs(a.x - b.x) AS dx, abs(a.y - b.y) AS dy
         FROM pts a JOIN pts b
           ON a.id < b.id AND abs(a.x - b.x) <= 500 AND abs(a.y - b.y) <= 500)
       SELECT COUNT(*) AS n_pairs,
              CAST(SUM(id1 * 31 + id2) AS BIGINT) AS checksum,
              CAST(MAX(dx) AS BIGINT) AS max_dx, CAST(MAX(dy) AS BIGINT) AS max_dy
       FROM pairs ORDER BY n_pairs"""

  // --------------------------------------------------------------------------
  // q160: deterministic distributed enumerate — contiguous global ordinals
  // under a total order WITHOUT `ROW_NUMBER() OVER ()`, which moves every row
  // to a single partition (Spark itself warns "this can cause serious
  // performance degradation" — at 100 TB it is an outage, not a slowdown).
  // The scalable recipe: range-repartition on the sort key (deterministic —
  // RangePartitioner's sampling is seeded by partition index), sort within
  // partitions, then zipWithIndex's two-job offset scheme (count rows per
  // partition, broadcast cumulative offsets, assign ordinal = offset + local
  // position). The rows never converge on one node; the only driver-side data
  // is one count per partition. The oracle proves the ordinals equal
  // ROW_NUMBER() - 1 under the same total order.
  // --------------------------------------------------------------------------
  private def q160(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val sorted = T.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        expr("CAST(FLOOR(l_extendedprice * 100) AS BIGINT)").as("price_c"))
      .repartitionByRange(32, col("l_orderkey"), col("l_linenumber"))
      .sortWithinPartitions(col("l_orderkey"), col("l_linenumber"))
    val enumerated = sorted.rdd
      .zipWithIndex() // job 1: per-partition counts; job 2: offset + local pos
      .map { case (row, ord) => (row.getAs[String]("l_returnflag"), ord) }
      .toDF("flag", "ord")
    enumerated.groupBy(col("flag"))
      .agg(count(lit(1)).as("n"), min(col("ord")).as("min_ord"),
        max(col("ord")).as("max_ord"), sum(col("ord")).as("sum_ord"))
      .orderBy(col("flag"))
  }

  private val q160Sql =
    """WITH e AS (
         SELECT l_returnflag AS flag,
                ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber) - 1 AS ord
         FROM lineitem)
       SELECT flag, COUNT(*) AS n, MIN(ord) AS min_ord, MAX(ord) AS max_ord,
              CAST(SUM(ord) AS BIGINT) AS sum_ord
       FROM e GROUP BY flag ORDER BY flag"""

  // --------------------------------------------------------------------------
  // q165: DYNAMIC-gap session windows — `session_window(ts, gapExpr)` where
  // the inactivity gap is a per-event expression (a purchase holds the session
  // open 30 minutes, anything else 10): the adaptive-timeout sessionization
  // real engagement analytics runs, vs q29's fixed gap. Semantics are interval
  // union: each event spans [ts, ts+gap) and overlapping spans merge, so a
  // session's end is the MAX of its events' ends, not last-ts + constant. The
  // DuckDB twin replays exactly that contract with a running MAX(t + gap) over
  // the preceding rows (break when t >= every previous end) — engine-portable
  // proof that Spark's native operator implements the textbook union rule.
  // Shape at scale: per-user windows, one shuffle on user_id, no global sort.
  // --------------------------------------------------------------------------
  private def q165(s: SparkSession, d: String): DataFrame = {
    // the dynamic-gap contract wants CalendarIntervalType; ANSI INTERVAL
    // literals are DayTimeIntervalType, so build the gap with make_interval
    val gap = expr(
      "CASE WHEN event_type = 'purchase' THEN make_interval(0, 0, 0, 0, 0, 30, 0) " +
        "ELSE make_interval(0, 0, 0, 0, 0, 10, 0) END")
    val sess = T.events(s, d)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(ROUND(value * 100) AS BIGINT)")).as("cents"))
      .select(col("user_id"),
        expr("unix_micros(session_window.start)").as("st"),
        expr("unix_micros(session_window.end)").as("en"),
        col("n"), col("cents"))
    sess.agg(
        count(lit(1)).as("n_sessions"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("n")).as("n_events"),
        max(col("n")).as("max_events"),
        sum(col("en") - col("st")).as("total_span_us"),
        sum(col("cents")).as("total_cents"))
      .orderBy(col("n_sessions"))
  }

  private val q165Sql =
    """WITH e AS (
         SELECT user_id, epoch_us(ts) AS t,
                CASE WHEN event_type = 'purchase'
                     THEN 1800000000 ELSE 600000000 END AS gap,
                CAST(ROUND(value * 100) AS BIGINT) AS cents
         FROM events),
       o AS (SELECT user_id, t, gap, cents,
               MAX(t + gap) OVER (PARTITION BY user_id ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
             FROM e),
       f AS (SELECT user_id, t, gap, cents,
               CASE WHEN prev_end IS NULL OR t >= prev_end THEN 1 ELSE 0 END AS brk
             FROM o),
       sgrp AS (SELECT user_id, t, gap, cents,
                  SUM(brk) OVER (PARTITION BY user_id ORDER BY t
                    ROWS UNBOUNDED PRECEDING) AS sid
                FROM f),
       sess AS (SELECT user_id, sid, MIN(t) AS st, MAX(t + gap) AS en,
                       COUNT(*) AS n, SUM(cents) AS cents
                FROM sgrp GROUP BY user_id, sid)
       SELECT COUNT(*) AS n_sessions, COUNT(DISTINCT user_id) AS n_users,
              CAST(SUM(n) AS BIGINT) AS n_events, CAST(MAX(n) AS BIGINT) AS max_events,
              CAST(SUM(en - st) AS BIGINT) AS total_span_us,
              CAST(SUM(cents) AS BIGINT) AS total_cents
       FROM sess ORDER BY n_sessions"""

  // --------------------------------------------------------------------------
  // q166: NOT IN — the null-aware anti join, a DIFFERENT operator from q06's
  // NOT EXISTS anti join: SQL three-valued logic makes `x NOT IN (subquery)`
  // UNKNOWN (⇒ filtered) for EVERY x the moment the subquery yields one NULL,
  // so the join must track the build side's null bit, not just key misses.
  // Spark plans this as a broadcast null-aware anti join (streamed side never
  // shuffles; the build side must broadcast because every task needs the
  // global "has null" fact — the documented reason NAAJ has no shuffle form).
  // NULLIF keeps the subquery column nullable-TYPED (forcing the null-aware
  // plan) while the data stays null-free, so the result is non-degenerate.
  // --------------------------------------------------------------------------
  private def q166(s: SparkSession, d: String): DataFrame = {
    T.orders(s, d).createOrReplaceTempView("v_orders_naaj")
    T.customer(s, d).createOrReplaceTempView("v_customer_naaj")
    s.sql(
      """SELECT o_orderstatus AS st, COUNT(*) AS n,
                CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c
         FROM v_orders_naaj
         WHERE o_custkey NOT IN (SELECT NULLIF(c_custkey, -1) FROM v_customer_naaj
                                 WHERE c_acctbal < 0)
         GROUP BY o_orderstatus ORDER BY st""")
  }

  private val q166Sql =
    """SELECT o_orderstatus AS st, COUNT(*) AS n,
              CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c
       FROM orders
       WHERE o_custkey NOT IN (SELECT NULLIF(c_custkey, -1) FROM customer
                               WHERE c_acctbal < 0)
       GROUP BY o_orderstatus ORDER BY st"""

  // --------------------------------------------------------------------------
  // q168: regular-grid resampling with LINEAR INTERPOLATION — the sensor/price
  // alignment primitive (q116's gap-fill COPIES the previous value; this one
  // COMPUTES v_p + (v_n−v_p)·(t−t_p)/(t_n−t_p) between the bracketing
  // readings). Engine-portable construction: no IGNORE-NULLS windows — a
  // cumulative reading-count over the union of readings and grid points keys
  // each grid point to its bracketing readings by EQUI-join (prev = cum,
  // next = cum+1), so the shape is per-user windows + two node-keyed joins,
  // distributed at 100 TB. Interpolation is integer-exact in both engines:
  // floor division is spelled as (num − pmod(num, den)) DIV den — an exact
  // multiple divides identically under truncating DIV and flooring //, so the
  // sign-convention trap between the engines never fires.
  // --------------------------------------------------------------------------
  private def q168(s: SparkSession, d: String): DataFrame = {
    val stepUs = 6L * 3600 * 1000000 // 6-hour grid
    val readings = T.events(s, d)
      .where(col("user_id") % 50 === 0) // deterministic 2% user sample
      .select(col("user_id"), unix_micros(col("ts")).as("t"),
        expr("CAST(ROUND(value * 100) AS BIGINT)").as("v"))
      .groupBy(col("user_id"), col("t")).agg(max(col("v")).as("v")) // dedupe equal-µs
    val spans = readings.groupBy(col("user_id"))
      .agg(min(col("t")).as("t0"), max(col("t")).as("t1"))
    val grid = spans.select(col("user_id"),
      explode(sequence(col("t0"), col("t1"), lit(stepUs))).as("t"))
    val combined = readings.select(col("user_id"), col("t"), lit(1L).as("is_reading"))
      .unionByName(grid.select(col("user_id"), col("t"), lit(0L).as("is_reading")))
    // readings sort BEFORE coincident grid points, so a grid point landing
    // exactly on a reading brackets to it (t = t_p ⇒ interp = v_p, no division)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("t"), col("is_reading").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gridCum = combined
      .withColumn("cum", sum(col("is_reading")).over(w))
      .where(col("is_reading") === 0)
      .select(col("user_id"), col("t"), col("cum"))
    val wr = Window.partitionBy(col("user_id")).orderBy(col("t"))
    val numbered = readings.withColumn("rn", row_number().over(wr))
    val prev = numbered.select(col("user_id").as("pu"), col("rn").as("prn"),
      col("t").as("tp"), col("v").as("vp"))
    val next = numbered.select(col("user_id").as("nu"), col("rn").as("nrn"),
      col("t").as("tn"), col("v").as("vn"))
    val interp = gridCum
      .join(prev, col("user_id") === col("pu") && col("cum") === col("prn"))
      .join(next, col("user_id") === col("nu") && (col("cum") + 1) === col("nrn"), "left")
      .select(col("user_id"), col("t"),
        when(col("t") === col("tp"), col("vp"))
          .otherwise(expr(
            "vp + (((vn - vp) * (t - tp)) - pmod((vn - vp) * (t - tp), tn - tp)) DIV (tn - tp)"))
          .as("interp_c"))
    interp.groupBy((col("user_id") % 7).as("bucket"))
      .agg(count(lit(1)).as("n_points"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("interp_c")).as("sum_c"),
        min(col("interp_c")).as("min_c"),
        max(col("interp_c")).as("max_c"))
      .orderBy(col("bucket"))
  }

  private val q168Sql =
    """WITH readings AS (
         SELECT user_id, epoch_us(ts) AS t, MAX(CAST(ROUND(value * 100) AS BIGINT)) AS v
         FROM events WHERE user_id % 50 = 0 GROUP BY user_id, epoch_us(ts)),
       spans AS (SELECT user_id, MIN(t) AS t0, MAX(t) AS t1 FROM readings GROUP BY user_id),
       grid AS (SELECT user_id, UNNEST(generate_series(t0, t1, 21600000000)) AS t FROM spans),
       combined AS (
         SELECT user_id, t, 1 AS is_reading FROM readings
         UNION ALL SELECT user_id, t, 0 FROM grid),
       cums AS (
         SELECT user_id, t, is_reading,
                SUM(is_reading) OVER (PARTITION BY user_id
                  ORDER BY t, is_reading DESC ROWS UNBOUNDED PRECEDING) AS cum
         FROM combined),
       gridc AS (SELECT user_id, t, cum FROM cums WHERE is_reading = 0),
       numbered AS (
         SELECT user_id, t, v,
                ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY t) AS rn
         FROM readings),
       joined AS (
         SELECT g.user_id, g.t, p.t AS tp, p.v AS vp, n.t AS tn, n.v AS vn
         FROM gridc g
         JOIN numbered p ON g.user_id = p.user_id AND g.cum = p.rn
         LEFT JOIN numbered n ON g.user_id = n.user_id AND g.cum + 1 = n.rn),
       interp AS (
         SELECT user_id, t,
                CASE WHEN t = tp THEN vp
                     ELSE vp + (((vn - vp) * (t - tp))
                            - ((((vn - vp) * (t - tp)) % (tn - tp) + (tn - tp)) % (tn - tp)))
                          // (tn - tp)
                END AS interp_c
         FROM joined)
       SELECT user_id % 7 AS bucket, COUNT(*) AS n_points,
              COUNT(DISTINCT user_id) AS n_users,
              CAST(SUM(interp_c) AS BIGINT) AS sum_c,
              CAST(MIN(interp_c) AS BIGINT) AS min_c,
              CAST(MAX(interp_c) AS BIGINT) AS max_c
       FROM interp GROUP BY bucket ORDER BY bucket"""

  val defs: Seq[QDef] = Seq(
    QDef("q155_order_statistics", q155, Some(q155Sql)),
    QDef("q156_markov_transitions", q156, Some(q156Sql)),
    QDef("q157_activity_streaks", q157, Some(q157Sql)),
    QDef("q158_time_weighted_avg", q158, Some(q158Sql)),
    QDef("q159_spatial_grid_join", q159, Some(q159Sql)),
    QDef("q160_distributed_enumerate", q160, Some(q160Sql)),
    QDef("q165_dynamic_session", q165, Some(q165Sql)),
    QDef("q166_not_in_null_aware", q166, Some(q166Sql)),
    QDef("q168_resample_interpolate", q168, Some(q168Sql)),
    QDef("q170_bitwise_aggs", q170, Some(q170Sql)))

  // --------------------------------------------------------------------------
  // q170: bitwise aggregate family — `bit_and` / `bit_or` / `bit_xor`, the
  // flag-mask rollup (capability intersection, union, and parity in one
  // linear scan; all three are algebraic with single-long partials, so the
  // 100 TB form is map-side combine + a group-count-sized shuffle — the same
  // cost class as SUM). A synthetic per-row flag word (deterministic bits from
  // key arithmetic) makes every bit position exercised in both engines.
  // NB `defs` above references q170Sql: as a method (not a val), declaration
  // order cannot null it.
  // --------------------------------------------------------------------------
  private def q170(s: SparkSession, d: String): DataFrame =
    T.orders(s, d)
      .select(col("o_orderstatus").as("st"),
        expr("CAST(1 << (o_orderkey % 7) AS BIGINT) | CAST(1 << (o_custkey % 5 + 7) AS BIGINT)")
          .as("flags"),
        col("o_orderkey"))
      .groupBy(col("st"))
      .agg(count(lit(1)).as("n"),
        expr("bit_and(flags)").as("mask_all"),
        expr("bit_or(flags)").as("mask_any"),
        expr("bit_xor(flags)").as("mask_parity"),
        expr("bit_or(CAST(1 << (o_orderkey % 31) AS BIGINT))").as("key_coverage"))
      .orderBy(col("st"))

  private def q170Sql =
    """WITH f AS (
         SELECT o_orderstatus AS st,
                CAST(1 << (o_orderkey % 7) AS BIGINT)
                  | CAST(1 << (o_custkey % 5 + 7) AS BIGINT) AS flags,
                o_orderkey
         FROM orders)
       SELECT st, COUNT(*) AS n,
              CAST(BIT_AND(flags) AS BIGINT) AS mask_all,
              CAST(BIT_OR(flags) AS BIGINT) AS mask_any,
              CAST(BIT_XOR(flags) AS BIGINT) AS mask_parity,
              CAST(BIT_OR(CAST(1 << (o_orderkey % 31) AS BIGINT)) AS BIGINT) AS key_coverage
       FROM f GROUP BY st ORDER BY st"""
}
