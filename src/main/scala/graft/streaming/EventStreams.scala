package graft.streaming

import graft.functions.{MeanVar, Welford, WelfordBuf}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (SURVEY.md §2b streaming rows, §7.7).
  *
  * Each transformation takes a DataFrame that may be BATCH or STREAMING and builds
  * the identical logical plan — one definition, two execution modes. The
  * replay-equals-batch specs (StreamingSpec) feed the same rows through a file-replay
  * stream and the batch path and assert equal results; the batch path is in turn
  * DuckDB-oracle-checked via q28/q29.
  *
  * Watermarks bound state: at 100 TB/day the windowed aggregations hold only
  * in-flight windows, dedup holds only the watermark horizon of keys, and the
  * per-user stats operator holds one Welford buffer per active user.
  */
object EventStreams {

  /** Tumbling 10-minute counts per event type (the streaming twin of q28). */
  def tumblingCounts(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Sliding 10-minute windows every 5 minutes. */
  def slidingCounts(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("n"))

  /** Session windows, 30-minute gap, per user (streaming twin of q29). */
  def sessionAgg(events: DataFrame, gap: String = "30 minutes",
                 watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("sum_value"))

  /** Streaming dedup on event_id within the watermark horizon. */
  def dedupEvents(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicates("event_id")

  /** Exactly-once streaming ingestion into a graft catalog table — the
    * lakehouse landing pattern: `stream.writeStream.foreachBatch(
    * appendBatchToGraft(table, appId))`. foreachBatch alone is at-least-once
    * (a failure between the batch write and the checkpoint commit replays the
    * batch); naming the segment `<appId>-batch-<id>` makes the graft commit
    * IDEMPOTENT — a replayed epoch finds its name in the table's durable
    * committed-segment registry and discards its rows (GraftCatalog
    * NoopBatchWrite), so the table sees each micro-batch exactly once. This
    * is the same recipe as Delta's `txnAppId`/`txnVersion`: the WRITER id is
    * part of the key, because batch ids restart from 0 per checkpoint — two
    * queries ingesting into one table, or one query restarted with a fresh
    * checkpoint, must not collide on `batch-0` and silently drop each other's
    * rows. One (table, appId) pair must have at most one live writer; give a
    * restarted-from-scratch query a NEW appId.
    *
    * Each micro-batch is one snapshot commit: appends stay atomic, readers
    * are never torn, and `VERSION AS OF` gives per-batch replay points. */
  def appendBatchToGraft(table: String, appId: String)(batch: DataFrame, batchId: Long): Unit =
    batch.writeTo(table).option("graft.segment", s"$appId-batch-$batchId").append()

  /** Streaming dedup via `dropDuplicatesWithinWatermark` (Spark 3.5+): unlike
    * `dropDuplicates("event_id")` — whose state lives forever unless the event-
    * time column is part of the key and exactly equal across duplicates — this
    * keys state on the id ALONE and expires it once the watermark passes the
    * first arrival plus the delay. That is the right contract for
    * at-least-once sources whose retries carry DRIFTED timestamps (a retry
    * storm re-sends the same event_id seconds apart): state stays bounded by
    * the watermark horizon and drifted duplicates still collapse. */
  def dedupWithinWatermark(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark("event_id")

  /** Stream-static enrichment join: the streaming fact side joined to a STATIC
    * dimension. Stateless — no watermark, no state store: every micro-batch
    * joins against the (broadcast) static side as-of its own execution, which
    * is why it needs none of the expiry machinery the stream-stream joins do.
    * At 100 TB/day this is THE dimension-enrichment shape: the dim broadcasts
    * once per micro-batch, the fact stream never shuffles. */
  def enrichStreamStatic(events: DataFrame, userTiers: DataFrame): DataFrame =
    events
      .join(broadcast(userTiers), Seq("user_id"))
      .select(col("event_id"), col("user_id"), col("tier"), col("event_type"),
        round(col("value"), 2).as("value"))

  /** Stream-stream interval join (a streaming self-join): each purchase matched to
    * the same user's clicks in the 30 minutes before it. Both sides carry a
    * watermark AND the join condition bounds event time in both directions, which
    * is exactly what lets Structured Streaming expire join state: a click older
    * than watermark + 30 min can never match a future purchase and is dropped from
    * the state store. Without the band, stream-stream inner join state grows
    * without bound — the streaming twin of the batch band-join scaling argument
    * (graft.plans.IntervalJoinRewrite). */
  def purchaseClickJoin(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    purchaseClickJoinImpl(events, watermark, "inner")

  /** Shared body of the inner and left-outer purchase⋈click interval joins.
    * NOTE each side's watermark advances with the max event time OF THAT TYPE —
    * placing withWatermark above the filter changes nothing, because Catalyst
    * pushes deterministic filters back below EventTimeWatermark (measured: the
    * click-side node still only sees clicks). Outer variants therefore only
    * flush held-back state once BOTH types progress past it (StreamingSpec's
    * heartbeat fixture). */
  private def purchaseClickJoinImpl(
      events: DataFrame, watermark: String, joinType: String): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", watermark)
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", watermark)
    purchases.join(clicks,
        col("user_id") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES") &&
          col("c_ts") <= col("p_ts"), joinType)
      .select(col("purchase_id"), col("user_id"), col("p_ts"),
        col("click_id"), col("c_ts"))
  }

  /** LEFT OUTER stream-stream interval join: every purchase with its same-user
    * clicks ≤ 30 min back when they exist, null-extended otherwise. The outer
    * side is only emitted once the WATERMARK proves no matching click can still
    * arrive — Structured Streaming's state-correct rendering of "unattributed
    * purchase" — and state eviction is the same band-bounded story as the inner
    * variant. */
  def purchaseClickLeftJoin(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    purchaseClickJoinImpl(events, watermark, "left_outer")

  /** FULL OUTER stream-stream interval join — both unattributed purchases AND
    * orphan clicks surface, each null-extended, each only once the watermark
    * proves no match can still arrive. Completes the join-type matrix the
    * inner/left-outer twins start; state stays band-bounded on both sides
    * because the interval condition lets either side evict rows the other
    * side's watermark has passed. Output keys on COALESCE of the two user
    * columns: an orphan click's purchase-side user_id is null, so neither
    * side's key alone covers every row. */
  def purchaseClickFullJoin(events: DataFrame, watermark: String = "1 hour"): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", watermark)
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", watermark)
    purchases.join(clicks,
        col("user_id") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES") &&
          col("c_ts") <= col("p_ts"), "full_outer")
      .select(col("purchase_id"), coalesce(col("user_id"), col("c_user")).as("user_key"),
        col("p_ts"), col("click_id"), col("c_ts"))
  }

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                         event_type: String, value: Double)
  final case class UserStats(user_id: Long, n: Long, mean: Double, variance: Double)

  /** Running per-user Welford statistics via Spark 4's transformWithState — the
    * successor API to mapGroupsWithState: typed per-key state handles (ValueState
    * here; List/Map state, timers, and TTL exist on the same handle), declared in
    * init and used per input batch. Same semantics as [[runningUserStats]], so
    * the replay spec asserts both against one batch oracle. Requires the RocksDB
    * state store provider (the default HDFS-backed store does not implement the
    * new API's column-family layout). */
  class UserStatsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, UserStats] {
    @transient private var state: org.apache.spark.sql.streaming.ValueState[WelfordBuf] = _

    override def init(outputMode: OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      state = getHandle.getValueState[WelfordBuf]("welford",
        org.apache.spark.sql.Encoders.product[WelfordBuf],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[UserStats] = {
      var buf = if (state.exists()) state.get() else Welford.zero
      rows.foreach(e => buf = Welford.update(buf, e.value))
      state.update(buf)
      val mv: MeanVar = Welford.finish(buf)
      Iterator.single(UserStats(key, mv.n, mv.mean, mv.variance))
    }
  }

  def runningUserStatsTws(events: Dataset[Event]): Dataset[UserStats] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new UserStatsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
  }

  /** MG summary carried between micro-batches: the ≤ k counters plus the rows
    * seen so far for the key (needed for the n/k threshold downstream). */
  final case class MgSummary(items: Map[String, Long], n: Long)
  final case class TypeHeavyHitters(event_type: String, n_seen: Long,
                                    candidates: Seq[String])

  /** Streaming Misra-Gries: per-event-type candidate heavy users via
    * transformWithState — the streaming face of q124's sketch-then-recheck
    * family. State per key is the MG buffer itself (≤ k counters + a row
    * count), advanced by the SAME reduce step as the batch Aggregator
    * (functions.MisraGries), so the mergeable-summaries guarantee carries over
    * batch boundaries: after ANY prefix of micro-batches, the emitted candidate
    * list contains every item whose true frequency in the rows seen so far
    * exceeds n/k. The exact recheck stays a batch job over the candidates
    * (q124's second pass) — the sketch's job in the streaming plane is to keep
    * a small, current candidate set without unbounded state: counting users
    * exactly would hold one counter per distinct user forever. */
  class HeavyHitterProcessor(k: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[String, Event, TypeHeavyHitters] {
    @transient private var state: org.apache.spark.sql.streaming.ValueState[MgSummary] = _

    override def init(outputMode: OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      state = getHandle.getValueState[MgSummary]("mg",
        org.apache.spark.sql.Encoders.product[MgSummary],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[Event],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[TypeHeavyHitters] = {
      val mg = new graft.functions.MisraGries(k)
      val buf = mg.zero
      var n = 0L
      if (state.exists()) {
        val st = state.get()
        st.items.foreach { case (i, c) => buf.put(i, c) }
        n = st.n
      }
      rows.foreach { e => mg.reduce(buf, e.user_id.toString); n += 1 }
      import scala.jdk.CollectionConverters._
      state.update(
        MgSummary(buf.asScala.map { case (i, c) => i -> c.longValue }.toMap, n))
      Iterator.single(TypeHeavyHitters(key, n, mg.finish(buf)))
    }
  }

  def runningHeavyHitters(events: Dataset[Event], k: Int): Dataset[TypeHeavyHitters] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.event_type)
      .transformWithState(new HeavyHitterProcessor(k),
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
  }

  final case class SessionSummary(user_id: Long, n_events: Long,
                                  start_ms: Long, end_ms: Long)
  // public: the state encoder's generated code constructs/reads it reflectively
  final case class SessionBuf(n: Long, startMs: Long, lastMs: Long)

  /** Custom sessionization with EVENT-TIME state timeout — the stateful shape
    * the built-in `session_window` (q29) cannot express when the session
    * CLOSE needs custom logic (emit-on-close only, custom gap bookkeeping,
    * one output row per completed session). State is one (count, start, last)
    * per user; every batch extends the open session and re-arms
    * `setTimeoutTimestamp(last + gap)`; when the WATERMARK passes that
    * instant the timeout branch fires exactly once, emits the completed
    * session, and frees the state — the deterministic timeout (processing
    * -time timeouts depend on wall clock; event-time timeouts replay
    * identically, which is what makes the spec's assertions exact). State
    * size is bounded by ACTIVE users only — closed sessions hold no state,
    * the property that keeps this runnable against unbounded user
    * populations. */
  def timeoutSessions(events: Dataset[Event], gapMs: Long,
                      watermarkDelay: String = "0 seconds"): Dataset[SessionSummary] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionBuf, SessionSummary](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionBuf]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionSummary(userId, s.n, s.startMs, s.lastMs))
          } else {
            val times = rows.map(_.ts.getTime).toSeq.sorted
            val prev = state.getOption
            // a gap INSIDE the batch closes the running session immediately
            val (closed, open) = times.foldLeft(
              (Seq.empty[SessionSummary], prev)) { case ((done, cur), t) =>
              cur match {
                case Some(s) if t - s.lastMs <= gapMs =>
                  // late-but-in-watermark events from a LATER batch can carry
                  // t < s.lastMs (sorting is per-batch only); clamping keeps
                  // session bounds monotone so a negative diff can never
                  // shrink the armed timeout or rewind the start
                  (done, Some(SessionBuf(s.n + 1, math.min(s.startMs, t),
                    math.max(s.lastMs, t))))
                case Some(s) =>
                  (done :+ SessionSummary(userId, s.n, s.startMs, s.lastMs),
                    Some(SessionBuf(1L, t, t)))
                case None => (done, Some(SessionBuf(1L, t, t)))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastMs + gapMs)
            }
            closed.iterator
          }
      }
  }

  /** Running per-user Welford statistics via flatMapGroupsWithState — the streaming
    * twin of the outlier model's training statistics (SURVEY.md §7.7): state is one
    * WelfordBuf per user, updated incrementally, emitted after every batch. */
  def runningUserStats(events: Dataset[Event]): Dataset[UserStats] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[WelfordBuf, UserStats](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[WelfordBuf]) =>
          var buf = state.getOption.getOrElse(Welford.zero)
          rows.foreach(e => buf = Welford.update(buf, e.value))
          state.update(buf)
          val mv: MeanVar = Welford.finish(buf)
          Iterator.single(UserStats(userId, mv.n, mv.mean, mv.variance))
      }
  }
}
