package graft.queries

import graft.{QDef, Tables => T}
import graft.operators.AsOfJoin
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream shaped queries over the `events` table: analytic windows, tumbling
  * windows, session windows, as-of and range joins. Each is the BATCH twin of a
  * Structured Streaming query (graft.streaming package) — the batch result is what the
  * DuckDB oracle checks, and streaming replay-equals-batch specs assert the same result.
  *
  * Timestamp convention: events.ts is µs-truncated on both engines (see Tables.events)
  * and always EMITTED as a second-precision formatted string, never a raw timestamp.
  */
object EventQueries {

  private val fmt = "yyyy-MM-dd HH:mm:ss"
  /** DuckDB-side CTE matching Tables.events' µs view of the ns column. */
  private val evCte =
    "WITH ev AS (SELECT event_id, ts, user_id, event_type, value, props FROM events)"

  /** lag/lead/first + integer-second gaps per user. */
  private def q27(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    T.events(s, d)
      .select(
        col("user_id"), col("event_id"),
        lag(col("event_id"), 1).over(w).as("prev_id"),
        lead(col("event_id"), 1).over(w).as("next_id"),
        first(col("event_type")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("first_type"),
        last(col("event_type")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)).as("last_type"),
        (unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(w))).as("gap_s"))
      .orderBy(col("user_id"), col("event_id"))
  }

  private val q27Sql =
    s"""$evCte
       SELECT user_id, event_id,
       LAG(event_id, 1) OVER w AS prev_id,
       LEAD(event_id, 1) OVER w AS next_id,
       FIRST_VALUE(event_type) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_type,
       LAST_VALUE(event_type) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_type,
       DATE_DIFF('second', LAG(ts, 1) OVER w, ts) AS gap_s
       FROM ev
       WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       ORDER BY user_id, event_id"""

  /** Tumbling 10-minute windows (batch twin of groupBy(window($"ts", "10 minutes"))).
    * Spark's window() is epoch-aligned, so the oracle floors epoch seconds to 600. */
  private def q28(s: SparkSession, d: String): DataFrame =
    T.events(s, d)
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(
        date_format(col("window.start"), fmt).as("window_start"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("window_start"), col("event_type"))

  private val q28Sql =
    s"""$evCte
       SELECT STRFTIME(make_timestamp(CAST(FLOOR(EPOCH(ts) / 600) * 600 AS BIGINT) * 1000000), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value
       FROM ev
       GROUP BY 1, 2
       ORDER BY window_start, event_type"""

  /** Session windows, 30-minute gap, per user (batch twin of session_window()).
    * Oracle is the classic gaps-and-islands rewrite: a session breaks when the gap to
    * the previous event is >= the timeout (session_window treats end as exclusive:
    * events merge only while ts < last + gap). */
  private def q29(s: SparkSession, d: String): DataFrame =
    T.events(s, d)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(
        col("user_id"),
        date_format(col("session_window.start"), fmt).as("session_start"),
        date_format(col("session_window.end"), fmt).as("session_end"),
        col("n_events"), col("sum_value"))
      .orderBy(col("user_id"), col("session_start"))

  private val q29Sql =
    s"""$evCte,
       flags AS (
         SELECT user_id, ts, event_id, value,
           CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) >= INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS is_new
         FROM ev),
       sess AS (
         SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         FROM flags)
       SELECT user_id,
         STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
         STRFTIME(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
         COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value
       FROM sess
       GROUP BY user_id, sid
       ORDER BY user_id, session_start"""

  /** As-of join: each purchase matched to the user's latest click at or before it.
    * Uses the single-shuffle union+carry-forward operator (operators.AsOfJoin), not
    * join-then-window — see the operator's scaladoc for the 100 TB rationale. */
  private def q30(s: SparkSession, d: String): DataFrame = {
    val ev = T.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
    // the right time column is consumed by the operator, so carry a copy as payload
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_t"),
        col("event_id").as("click_event_id"), col("ts").as("click_ts_val"))
    AsOfJoin.backward(purchases, clicks, key = "user_id",
        leftTime = "ts", rightTime = "click_t", tieBreak = "click_event_id")
      .select(
        col("event_id"),
        date_format(col("ts"), fmt).as("ts"),
        col("click_event_id"),
        date_format(col("click_ts_val"), fmt).as("click_ts"))
      .orderBy(col("event_id"))
  }

  private val q30Sql =
    s"""$evCte,
       p AS (SELECT user_id, event_id, ts FROM ev WHERE event_type = 'purchase'),
       c AS (SELECT user_id, event_id, ts FROM ev WHERE event_type = 'click'),
       j AS (
         SELECT p.event_id, p.ts, c.event_id AS click_event_id, c.ts AS click_ts,
           ROW_NUMBER() OVER (PARTITION BY p.event_id ORDER BY c.ts DESC, c.event_id DESC) AS rn
         FROM p LEFT JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts)
       SELECT event_id, STRFTIME(ts, '%Y-%m-%d %H:%M:%S') AS ts, click_event_id,
         CASE WHEN click_ts IS NULL THEN NULL
              ELSE STRFTIME(click_ts, '%Y-%m-%d %H:%M:%S') END AS click_ts
       FROM j WHERE rn = 1
       ORDER BY event_id"""

  /** Range (interval) join: events followed by another event of the same user within
    * 5 minutes. Equi key (user_id) carries the shuffle; the time band is a join-side
    * filter, so this stays a keyed join, not a cartesian. */
  private def q31(s: SparkSession, d: String): DataFrame = {
    val ev = T.events(s, d)
    val e1 = ev.select(col("user_id"), col("ts").as("t1"),
      col("event_type").as("type1"), col("event_id").as("id1"))
    val e2 = ev.select(col("user_id").as("uid2"), col("ts").as("t2"),
      col("event_id").as("id2"))
    e1.join(e2,
        col("user_id") === col("uid2") &&
          col("t2") > col("t1") &&
          col("t2") <= col("t1") + expr("INTERVAL 5 MINUTES"))
      .groupBy(col("type1").as("event_type"))
      .agg(
        count(lit(1)).as("n_following"),
        round(avg(unix_timestamp(col("t2")) - unix_timestamp(col("t1"))), 2).as("avg_gap_s"))
      .orderBy(col("event_type"))
  }

  private val q31Sql =
    s"""$evCte
       SELECT e1.event_type AS event_type, COUNT(*) AS n_following,
         ROUND(AVG(DATE_DIFF('second', e1.ts, e2.ts)), 2) AS avg_gap_s
       FROM ev e1 JOIN ev e2
         ON e1.user_id = e2.user_id
        AND e2.ts > e1.ts
        AND e2.ts <= e1.ts + INTERVAL 5 MINUTE
       GROUP BY e1.event_type
       ORDER BY event_type"""

  /** PURE band join — no equi key at all: every pair of events (any users) where the
    * second falls in the 2-minute window after the first. Catalyst alone plans this
    * as BroadcastNestedLoopJoin, O(n²) — ~10^10 comparisons at sf0.1 and unrunnable
    * at 100 TB — so this query rides [[graft.plans.IntervalJoinRewrite]]: the rule
    * detects the fixed 2-minute band, auto-derives a 120 s bucket width (no conf
    * needed), and the join becomes a shuffled equi join on the bucket, O(n) with
    * one exchange pair. The rule is installed session-wide here (idempotent; it
    * only ever touches band joins with both bounds and no equi conjunct, so the
    * rest of the corpus plans unchanged). */
  private def q68(s: SparkSession, d: String): DataFrame = {
    graft.plans.GraftExtensions.enableForQuery(s)
    val ev = T.events(s, d)
    val e1 = ev.select(col("ts").as("t1"), col("event_type").as("type1"))
    val e2 = ev.select(col("ts").as("t2"))
    e1.join(e2,
        col("t2") > col("t1") &&
          col("t2") <= col("t1") + expr("INTERVAL 2 MINUTES"))
      .groupBy(col("type1").as("event_type"))
      .agg(
        count(lit(1)).as("n_following"),
        round(avg(unix_timestamp(col("t2")) - unix_timestamp(col("t1"))), 2).as("avg_gap_s"))
      .orderBy(col("event_type"))
  }

  private val q68Sql =
    s"""$evCte
       SELECT e1.event_type AS event_type, COUNT(*) AS n_following,
         ROUND(AVG(DATE_DIFF('second', e1.ts, e2.ts)), 2) AS avg_gap_s
       FROM ev e1 JOIN ev e2
         ON e2.ts > e1.ts
        AND e2.ts <= e1.ts + INTERVAL 2 MINUTE
       GROUP BY e1.event_type
       ORDER BY event_type"""

  /** Forward as-of join (q30's mirror): each purchase matched to the user's NEXT
    * click at or after it — same single-shuffle union+carry operator, mirrored
    * frame. Ties at equal click time resolve to the smallest click id. */
  private def q74(s: SparkSession, d: String): DataFrame = {
    val ev = T.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_t"),
        col("event_id").as("click_event_id"), col("ts").as("click_ts_val"))
    AsOfJoin.forward(purchases, clicks, key = "user_id",
        leftTime = "ts", rightTime = "click_t", tieBreak = "click_event_id")
      .select(
        col("event_id"),
        date_format(col("ts"), fmt).as("ts"),
        col("click_event_id"),
        date_format(col("click_ts_val"), fmt).as("click_ts"))
      .orderBy(col("event_id"))
  }

  private val q74Sql =
    s"""$evCte,
       p AS (SELECT user_id, event_id, ts FROM ev WHERE event_type = 'purchase'),
       c AS (SELECT user_id, event_id, ts FROM ev WHERE event_type = 'click'),
       j AS (
         SELECT p.event_id, p.ts, c.event_id AS click_event_id, c.ts AS click_ts,
           ROW_NUMBER() OVER (PARTITION BY p.event_id ORDER BY c.ts ASC, c.event_id ASC) AS rn
         FROM p LEFT JOIN c ON p.user_id = c.user_id AND c.ts >= p.ts)
       SELECT event_id, STRFTIME(ts, '%Y-%m-%d %H:%M:%S') AS ts, click_event_id,
         CASE WHEN click_ts IS NULL THEN NULL
              ELSE STRFTIME(click_ts, '%Y-%m-%d %H:%M:%S') END AS click_ts
       FROM j WHERE rn = 1
       ORDER BY event_id"""

  /** Stratified sampling (`sampleBy`): per-stratum Bernoulli sampling with explicit
    * fractions — the class-balancing / downsampling primitive of a training-data
    * pipeline (e.g. downweight `view` events, keep every `purchase`). Per-row
    * seeded-hash decisions, so it is a narrow shuffle-free projection that scales
    * embarrassingly. Sampling is seeded-deterministic WITHIN Spark but not
    * reproducible in another engine, so this is declared rows-only (SURVEY.md §2b
    * convention 5); StratifiedSampleSpec property-checks the fractions and the
    * seed-determinism instead. */
  private def q71(s: SparkSession, d: String): DataFrame =
    T.events(s, d)
      .stat.sampleBy("event_type",
        Map("purchase" -> 1.0, "click" -> 0.25, "error" -> 0.5, "view" -> 0.05),
        seed = 42L)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_sampled"), countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("event_type"))

  /** Dedup-keep-newest: one row per user — the latest event by (ts, event_id).
    * The "keep the newest version of each document" dedup a training corpus needs,
    * expressed as a rank-1 window filter; Catalyst turns rn=1 into WindowGroupLimit,
    * so each shuffle partition keeps only its per-key leader instead of sorting
    * whole groups (the same shape PlanSpec pins for q17's top-k). */
  private def q72(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
    T.events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(
        col("user_id"), col("event_id").as("latest_event_id"),
        date_format(col("ts"), fmt).as("latest_ts"), col("event_type"))
      .orderBy(col("user_id"))
  }

  private val q72Sql =
    s"""$evCte
       SELECT user_id, event_id AS latest_event_id,
         STRFTIME(ts, '%Y-%m-%d %H:%M:%S') AS latest_ts, event_type
       FROM (
         SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
         FROM ev) t
       WHERE rn = 1
       ORDER BY user_id"""

  /** ANTI band join through the rewrite's point-on-right id-collapse path
    * (plans.IntervalJoinRewrite): purchases with NO click anywhere in the 2
    * minutes after them — the preserved side IS the interval side, the shape a
    * naive planner can only nested-loop. Pure band (no user key on purpose: the
    * question is global quiet time). Emitted as per-day counts. */
  private def q82(s: SparkSession, d: String): DataFrame = {
    graft.plans.GraftExtensions.enableForQuery(s)
    val ev = T.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("ts").as("p_ts"))
    val clicks = ev.filter(col("event_type") === "click").select(col("ts").as("c_ts"))
    purchases.join(clicks,
        col("c_ts") >= col("p_ts") &&
          col("c_ts") <= col("p_ts") + expr("INTERVAL 2 MINUTES"), "left_anti")
      .groupBy(to_date(col("p_ts")).cast("string").as("day"))
      .agg(count(lit(1)).as("n_quiet_purchases"))
      .orderBy(col("day"))
  }

  private val q82Sql =
    s"""$evCte,
       p AS (SELECT event_id AS purchase_id, ts AS p_ts FROM ev WHERE event_type = 'purchase'),
       c AS (SELECT ts AS c_ts FROM ev WHERE event_type = 'click')
       SELECT STRFTIME(p_ts, '%Y-%m-%d') AS day, COUNT(*) AS n_quiet_purchases
       FROM p
       WHERE NOT EXISTS (
         SELECT 1 FROM c
         WHERE c_ts >= p_ts AND c_ts <= p_ts + INTERVAL 2 MINUTE)
       GROUP BY 1 ORDER BY day"""

  /** FULL-OUTER band join through the rewrite's both-side-recovery path: purchase
    * windows × clicks, counted by match category (pair / quiet purchase /
    * unattributed click). Both sides preserved, no equi key — the matrix's
    * hardest shape, here behind the oracle gate. */
  private def q83(s: SparkSession, d: String): DataFrame = {
    graft.plans.GraftExtensions.enableForQuery(s)
    val ev = T.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("ts").as("p_ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("ts").as("c_ts"))
    purchases.join(clicks,
        col("c_ts") >= col("p_ts") &&
          col("c_ts") <= col("p_ts") + expr("INTERVAL 2 MINUTES"), "full_outer")
      .select(when(col("purchase_id").isNotNull && col("click_id").isNotNull, "pair")
        .when(col("purchase_id").isNotNull, "quiet_purchase")
        .otherwise("unattributed_click").as("category"))
      .groupBy(col("category"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("category"))
  }

  private val q83Sql =
    s"""$evCte,
       p AS (SELECT event_id AS purchase_id, ts AS p_ts FROM ev WHERE event_type = 'purchase'),
       c AS (SELECT event_id AS click_id, ts AS c_ts FROM ev WHERE event_type = 'click')
       SELECT CASE WHEN purchase_id IS NOT NULL AND click_id IS NOT NULL THEN 'pair'
                   WHEN purchase_id IS NOT NULL THEN 'quiet_purchase'
                   ELSE 'unattributed_click' END AS category,
              COUNT(*) AS n
       FROM p FULL OUTER JOIN c
         ON c_ts >= p_ts AND c_ts <= p_ts + INTERVAL 2 MINUTE
       GROUP BY 1 ORDER BY category"""

  /** Batch twin of the stream-stream interval join
    * (graft.streaming.EventStreams.purchaseClickJoin): each purchase matched to the
    * same user's clicks in the 30 minutes before it. Declared through the SAME
    * transformation the streaming path runs (watermark nodes are eliminated on
    * batch children), so the DuckDB hash-match here plus StreamingSpec's
    * replay-equals-batch test together pin the streaming operator's semantics.
    * Plan shape: the equi conjunct (user_id) makes this a plain keyed join — one
    * exchange pair, band predicate evaluated post-match per key. */
  private def q79(s: SparkSession, d: String): DataFrame =
    graft.streaming.EventStreams.purchaseClickJoin(T.events(s, d))
      .select(col("purchase_id"), col("user_id"),
        date_format(col("p_ts"), fmt).as("p_ts"),
        col("click_id"),
        date_format(col("c_ts"), fmt).as("c_ts"))
      .orderBy(col("purchase_id"), col("click_id"))

  private val q79Sql =
    s"""$evCte,
       p AS (SELECT event_id AS purchase_id, user_id, ts AS p_ts FROM ev WHERE event_type = 'purchase'),
       c AS (SELECT event_id AS click_id, user_id AS c_user, ts AS c_ts FROM ev WHERE event_type = 'click')
       SELECT purchase_id, user_id,
         STRFTIME(p_ts, '%Y-%m-%d %H:%M:%S') AS p_ts,
         click_id,
         STRFTIME(c_ts, '%Y-%m-%d %H:%M:%S') AS c_ts
       FROM p JOIN c ON user_id = c_user
         AND c_ts >= p_ts - INTERVAL 30 MINUTE AND c_ts <= p_ts
       ORDER BY purchase_id, click_id"""

  /** Batch twin of the LEFT-OUTER stream-stream interval join
    * (EventStreams.purchaseClickLeftJoin): q79's attribution plus one
    * null-extended row per quiet purchase. Same declared-through-the-streaming-
    * transformation contract as q79; null click ordering is spelled explicitly
    * on both sides (Spark asc = nulls first, DuckDB default = nulls last). */
  private def q105(s: SparkSession, d: String): DataFrame =
    graft.streaming.EventStreams.purchaseClickLeftJoin(T.events(s, d))
      .select(col("purchase_id"), col("user_id"),
        date_format(col("p_ts"), fmt).as("p_ts"),
        col("click_id"),
        date_format(col("c_ts"), fmt).as("c_ts"))
      .orderBy(col("purchase_id"), col("click_id").asc_nulls_first)

  private val q105Sql =
    s"""$evCte,
       p AS (SELECT event_id AS purchase_id, user_id, ts AS p_ts FROM ev WHERE event_type = 'purchase'),
       c AS (SELECT event_id AS click_id, user_id AS c_user, ts AS c_ts FROM ev WHERE event_type = 'click')
       SELECT purchase_id, user_id,
         STRFTIME(p_ts, '%Y-%m-%d %H:%M:%S') AS p_ts,
         click_id,
         STRFTIME(c_ts, '%Y-%m-%d %H:%M:%S') AS c_ts
       FROM p LEFT JOIN c ON user_id = c_user
         AND c_ts >= p_ts - INTERVAL 30 MINUTE AND c_ts <= p_ts
       ORDER BY purchase_id, click_id NULLS FIRST"""

  val defs: Seq[QDef] = Seq(
    QDef("q27_event_lag_lead", q27, Some(q27Sql)),
    QDef("q28_tumbling_window", q28, Some(q28Sql)),
    QDef("q29_session_window", q29, Some(q29Sql)),
    QDef("q30_asof_join", q30, Some(q30Sql)),
    QDef("q31_range_join", q31, Some(q31Sql)),
    QDef("q68_band_join_rule", q68, Some(q68Sql)),
    QDef("q71_stratified_sample", q71, None),
    QDef("q72_dedup_keep_newest", q72, Some(q72Sql)),
    QDef("q74_asof_forward", q74, Some(q74Sql)),
    QDef("q79_stream_interval_join", q79, Some(q79Sql)),
    QDef("q82_anti_band_join", q82, Some(q82Sql)),
    QDef("q83_full_outer_band_join", q83, Some(q83Sql)),
    QDef("q105_stream_leftouter_twin", q105, Some(q105Sql)),
  )
}
