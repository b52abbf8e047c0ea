package graft.streaming

import graft.SparkSpec
import graft.streaming.EventStreams.Event
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Replay-equals-batch (SURVEY.md §5.5): the same transformation applied to a
  * file-replayed stream of the events table and to the batch DataFrame must agree. */
class StreamingSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** Place one parquet part file at `dst` with mtime `base + seq` seconds — THE
    * replay-order invariant: FileStreamSource replays strictly in
    * modification-time order (names are not consulted), so every fixture file
    * must carry a strictly increasing stamp or replay order (and therefore
    * watermark progression) is at the mercy of filesystem timestamps. */
  private def placeWithMtime(src: java.io.File, dst: java.io.File,
                             base: Long, seq: Int, move: Boolean): Unit = {
    if (move) java.nio.file.Files.move(src.toPath, dst.toPath)
    else java.nio.file.Files.copy(src.toPath, dst.toPath)
    dst.setLastModified(base + seq * 1000L)
  }

  private def onlyPart(dir: String): java.io.File =
    new java.io.File(dir).listFiles().find(_.getName.endsWith(".parquet")).get

  /** events.parquet re-chunked into ordered files for file-source replay
    * (FIXTURES.md §B.4), plus a far-future sentinel chunk that pushes the watermark
    * past every real event so append-mode results flush completely. */
  private lazy val replayDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("events_replay").toFile
    val ev = graft.Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .orderBy("ts")
      .collect()
    val chunks = ev.grouped(math.max(1, ev.length / 4)).toSeq
    import spark.implicits._
    chunks.zipWithIndex.foreach { case (rows, i) =>
      val ds = rows.map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3), r.getDouble(4))).toSeq
        .toDF("event_id", "ts", "user_id", "event_type", "value")
      ds.coalesce(1).write.parquet(s"$dir/chunk_$i")
    }
    // move chunk files into one flat dir with ordered names + ordered mtimes
    // (see placeWithMtime)
    val flat = new java.io.File(dir, "flat"); flat.mkdirs()
    val t0 = System.currentTimeMillis()
    chunks.indices.foreach { i =>
      placeWithMtime(onlyPart(s"$dir/chunk_$i"),
        new java.io.File(flat, f"c$i%03d.parquet"), t0, i, move = true)
    }
    // TWO sentinel batches: watermark updates at the END of the batch that sees
    // the new max event time, and stateful eviction (outer-join null emission,
    // final window flush) runs in the batch AFTER that — so the first sentinel
    // advances the watermark past every real event and the second gives the
    // engine a batch in which to apply it
    Seq(("zzz1_sentinel.parquet", -1L, "2030-01-01 00:00:00", 100),
        ("zzz2_sentinel.parquet", -2L, "2030-01-02 00:00:00", 101)).foreach {
      case (fname, id, t, seq) =>
        val sentinel = Seq((id, java.sql.Timestamp.valueOf(t), -1L, "sentinel", 0.0))
          .toDF("event_id", "ts", "user_id", "event_type", "value")
        val sdir = s"$dir/sent_$id"
        sentinel.coalesce(1).write.parquet(sdir)
        // seq 100/101: strictly after every chunk
        placeWithMtime(onlyPart(sdir), new java.io.File(flat, fname), t0, seq, move = true)
    }
    flat.getAbsolutePath
  }

  /** Variant replay dir for the outer stream-stream join: the "sentinel"-typed
    * watermark pushers never reach that join's watermark nodes (Catalyst pushes
    * the event_type filters below EventTimeWatermark, so each side's watermark
    * only advances with its own type). Heartbeat purchase+click rows at user -1
    * do pass the filters; two heartbeat batches = advance watermark, then apply
    * it. Streamed output is filtered to user_id >= 0 for batch parity. */
  private lazy val heartbeatReplayDir: String = {
    import spark.implicits._
    val flat = new java.io.File(
      java.nio.file.Files.createTempDirectory("events_replay_hb").toFile, "flat")
    flat.mkdirs()
    val base = System.currentTimeMillis()
    new java.io.File(replayDir).listFiles().filter(_.getName.startsWith("c"))
      .sortBy(_.getName).zipWithIndex.foreach { case (f, i) =>
        placeWithMtime(f, new java.io.File(flat, f.getName), base, i, move = false)
      }
    Seq(("zzz1_hb.parquet", "2030-01-01 00:00:00", -10L, 100),
        ("zzz2_hb.parquet", "2030-01-02 00:00:00", -20L, 101)).foreach {
      case (fname, t, id, seq) =>
        val ts = java.sql.Timestamp.valueOf(t)
        val hb = Seq((id, ts, -1L, "purchase", 0.0), (id - 1, ts, -1L, "click", 0.0))
          .toDF("event_id", "ts", "user_id", "event_type", "value")
        val hdir = s"${flat.getParent}/hb_$id"
        hb.coalesce(1).write.parquet(hdir)
        // seq 100/101: strictly after every chunk
        placeWithMtime(onlyPart(hdir), new java.io.File(flat, fname), base, seq, move = true)
    }
    flat.getAbsolutePath
  }

  private def batchEvents: DataFrame =
    graft.Tables.events(spark, sfDir).select("event_id", "ts", "user_id", "event_type", "value")

  /** The file-replay source — one recipe, shared by every streaming test. */
  private def replaySource(dir: String = replayDir): DataFrame =
    spark.readStream.schema(batchEvents.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)

  /** Run a streaming transformation over the file replay to completion. */
  private def replay(name: String, mode: String, dir: String = replayDir)(
      f: DataFrame => DataFrame): DataFrame = {
    val q = f(replaySource(dir)).writeStream
      .format("memory").queryName(name).outputMode(mode)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    val finished = q.awaitTermination(300000)
    assert(finished, s"stream '$name' did not finish within the timeout")
    spark.table(name)
  }

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map {
      case t: java.sql.Timestamp => t.toString
      case d: Double => f"$d%.4f"
      case v => String.valueOf(v)
    }.mkString("|")).sorted.toSeq

  test("tumbling window counts: replay equals batch") {
    val streamed = replay("tumbling", "append")(EventStreams.tumblingCounts(_))
      .filter(col("event_type") =!= "sentinel")
    val batch = EventStreams.tumblingCounts(batchEvents)
      .filter(col("event_type") =!= "sentinel")
    assert(canon(streamed) == canon(batch))
    assert(streamed.count() > 0)
  }

  test("sliding window counts: replay equals batch (sentinel window excluded)") {
    val streamed = replay("sliding", "append")(EventStreams.slidingCounts(_))
      .filter(col("window_start") < lit("2029-01-01"))
    val batch = EventStreams.slidingCounts(batchEvents)
      .filter(col("window_start") < lit("2029-01-01"))
    assert(canon(streamed) == canon(batch))
    // each event lands in exactly 2 sliding windows
  }

  test("session windows: replay equals batch") {
    val streamed = replay("sessions", "append")(EventStreams.sessionAgg(_))
      .filter(col("user_id") >= 0)
    val batch = EventStreams.sessionAgg(batchEvents).filter(col("user_id") >= 0)
    assert(canon(streamed) == canon(batch))
    assert(streamed.count() > 0)
  }

  test("streaming dedup within watermark: duplicated replay collapses to distinct") {
    // duplicate every event by reading the replay twice worth of files is not
    // possible with one dir; instead dedup the (already unique) stream and assert
    // count parity with batch distinct — plus a doubled MemoryStream variant below
    val streamed = replay("dedup", "append")(EventStreams.dedupEvents(_))
      .filter(col("event_id") >= 0)
    assert(streamed.count() == batchEvents.count())
  }

  test("foreachBatch sink: streamed parquet output equals the batch result") {
    val dir = java.nio.file.Files.createTempDirectory("fb_sink").toFile.getAbsolutePath
    val q = EventStreams.tumblingCounts(replaySource()).writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").parquet(dir)
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(300000), "foreachBatch stream did not finish")
    val streamed = spark.read.parquet(dir).filter(col("event_type") =!= "sentinel")
    val batch = EventStreams.tumblingCounts(batchEvents)
      .filter(col("event_type") =!= "sentinel")
    assert(canon(streamed) == canon(batch))
    assert(streamed.count() > 0)
  }

  test("checkpoint restart: windowed-agg state recovers across a stop/restart boundary") {
    // Phase 1 replays the FIRST HALF of the chunks under a checkpoint and stops
    // (AvailableNow drains only what exists); phase 2 adds the remaining chunks
    // plus the sentinels and restarts FROM THE SAME CHECKPOINT. Windows whose
    // events straddle the boundary can only be correct if phase 2 recovers
    // phase 1's aggregation state and source offsets — the exactly-once restart
    // contract a 100 TB pipeline leans on after any executor/driver loss.
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt").toFile.getAbsolutePath
    val out = java.nio.file.Files.createTempDirectory("ckpt_out").toFile.getAbsolutePath
    val staged = java.nio.file.Files.createTempDirectory("ckpt_in").toFile
    val all = new java.io.File(replayDir).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    val base = System.currentTimeMillis()
    def stage(files: Seq[java.io.File], seq0: Int): Unit =
      files.zipWithIndex.foreach { case (f, i) =>
        placeWithMtime(f, new java.io.File(staged, f.getName), base, seq0 + i, move = false)
      }
    def runOnce(): Unit = {
      val q = EventStreams.tumblingCounts(replaySource(staged.getAbsolutePath))
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.write.mode("append").parquet(out)
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(300000), "checkpointed stream did not finish")
    }
    val half = all.length / 2
    stage(all.take(half).toSeq, 0)
    runOnce()
    val afterPhase1 = spark.read.parquet(out).count()
    stage(all.drop(half).toSeq, half)
    runOnce()
    val streamed = spark.read.parquet(out).filter(col("event_type") =!= "sentinel")
    val batch = EventStreams.tumblingCounts(batchEvents)
      .filter(col("event_type") =!= "sentinel")
    assert(canon(streamed) == canon(batch),
      "restart from checkpoint must produce exactly the batch result")
    // the restart genuinely continued (phase 2 emitted the flushed windows) and
    // did not re-emit: row count strictly grew and no window appears twice
    assert(streamed.count() > afterPhase1)
    val dups = streamed.groupBy(col("window_start"), col("event_type"))
      .count().filter(col("count") > 1).count()
    assert(dups == 0, "no window may be emitted twice across the restart")
  }

  test("dropDuplicatesWithinWatermark: retry duplicates with drifted timestamps collapse") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ev(id: Long, t: String, typ: String) =
      Event(id, java.sql.Timestamp.valueOf(t), 1L, typ, 1.0)
    val input = MemoryStream[Event]
    val q = EventStreams.dedupWithinWatermark(input.toDS().toDF())
      .writeStream.format("memory").queryName("dedup_ww").outputMode("append").start()
    // first arrivals + a retry 3 minutes later with a DRIFTED timestamp —
    // plain dropDuplicates on (event_id, ts) would pass the retry through
    input.addData(Seq(
      ev(1, "2024-01-01 09:00:00", "a"), ev(1, "2024-01-01 09:03:00", "a"),
      ev(2, "2024-01-01 09:10:00", "b")))
    q.processAllAvailable()
    // another retry of id 1 in a later micro-batch, still inside the horizon
    input.addData(Seq(
      ev(1, "2024-01-01 09:20:00", "a"),
      ev(3, "2024-01-02 00:00:00", "z")))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dedup_ww").select(col("event_id")).as[Long].collect().toSeq
    assert(ids.sorted == Seq(1L, 2L, 3L), s"got $ids")
  }

  test("stream-static broadcast enrichment join: replay equals batch") {
    // static dim derived from the batch user universe; sentinel replay rows
    // carry user_ids outside it, so the inner join drops them symmetrically
    val tiers = batchEvents.select(col("user_id")).distinct()
      .withColumn("tier", concat(lit("T"), col("user_id") % 4))
    val streamed = replay("enrich", "append")(EventStreams.enrichStreamStatic(_, tiers))
    val batch = EventStreams.enrichStreamStatic(batchEvents, tiers)
    assert(canon(streamed) == canon(batch))
    assert(streamed.count() > 0)
  }

  test("stream-stream interval join (self-join): replay equals batch") {
    // the batch side of this transform is the declared, DuckDB-hash-matched
    // q79_stream_interval_join — so this replay test plus q79's oracle pin the
    // streaming operator's semantics end to end
    val streamed = replay("ssjoin", "append")(EventStreams.purchaseClickJoin(_))
    val batch = EventStreams.purchaseClickJoin(batchEvents)
    assert(canon(streamed) == canon(batch))
    assert(streamed.count() > 0, "fixture must produce at least one purchase-click pair")
    val q79 = graft.Registry.byName("q79_stream_interval_join").fn(spark, "/root/testdata/sf0.001")
    assert(q79.columns.toSeq == Seq("purchase_id", "user_id", "p_ts", "click_id", "c_ts"),
      "declared q79 must expose the same join output (formatted)")
  }

  test("LEFT OUTER stream-stream interval join: replay equals batch, nulls flushed") {
    // heartbeat purchase+click rows push the final watermark past every real
    // purchase (plain sentinels can't — see heartbeatReplayDir), so every
    // withheld null-extension is proven unmatched and emitted before the
    // AvailableNow stream finishes
    val streamed = replay("ssleftjoin", "append", heartbeatReplayDir)(
      EventStreams.purchaseClickLeftJoin(_)).filter(col("user_id") >= 0)
    val batch = EventStreams.purchaseClickLeftJoin(batchEvents)
    assert(canon(streamed) == canon(batch))
    assert(streamed.filter(col("click_id").isNull).count() > 0,
      "fixture must produce unattributed purchases (the outer half)")
    assert(streamed.filter(col("click_id").isNotNull).count() > 0)
  }

  test("FULL OUTER stream-stream interval join: replay equals batch, both halves flushed") {
    // same heartbeat discipline as the left-outer case, but BOTH null-extended
    // halves must flush: unattributed purchases (click side null) and orphan
    // clicks (purchase side null). user_key coalesces the two user columns,
    // so heartbeat rows filter out even when one side is null-extended.
    val streamed = replay("ssfulljoin", "append", heartbeatReplayDir)(
      EventStreams.purchaseClickFullJoin(_)).filter(col("user_key") >= 0)
    val batch = EventStreams.purchaseClickFullJoin(batchEvents).filter(col("user_key") >= 0)
    assert(canon(streamed) == canon(batch))
    assert(streamed.filter(col("click_id").isNull).count() > 0,
      "fixture must produce unattributed purchases")
    assert(streamed.filter(col("purchase_id").isNull).count() > 0,
      "fixture must produce orphan clicks (the full-outer half left_outer lacks)")
    assert(streamed.filter(col("purchase_id").isNotNull && col("click_id").isNotNull).count() > 0)
  }

  test("watermark drops late data in streaming that batch would count") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ev(id: Long, t: String, typ: String) =
      Event(id, java.sql.Timestamp.valueOf(t), 1L, typ, 1.0)
    val input = MemoryStream[Event]
    val agg = EventStreams.tumblingCounts(
      input.toDS().toDF(), watermark = "1 hour")
    val q = agg.writeStream.format("memory").queryName("late").outputMode("append").start()
    // batch 1: events up to 12:00 -> after the batch, watermark = 12:00 - 1h = 11:00
    input.addData(Seq(
      ev(1, "2024-01-01 09:05:00", "a"),
      ev(2, "2024-01-01 12:00:00", "a")))
    q.processAllAvailable()
    // batch 2: an event at 09:07 is 2h behind the watermark -> DROPPED;
    // one at 11:30 is within the watermark -> kept
    input.addData(Seq(
      ev(3, "2024-01-01 09:07:00", "a"),
      ev(4, "2024-01-01 11:30:00", "a")))
    q.processAllAvailable()
    // advance watermark far enough to flush every open window
    input.addData(Seq(ev(5, "2024-01-02 00:00:00", "z")))
    q.processAllAvailable()
    q.stop()
    val counts = spark.table("late")
      .select(date_format(col("window_start"), "HH:mm").as("w"), col("n"))
      .as[(String, Long)].collect().toMap
    assert(counts("09:00") == 1, s"late event must be dropped, got $counts") // only id 1
    assert(counts("11:30") == 1) // id 4 kept
    // the batch plan over the same rows counts the late event
    val batch = EventStreams.tumblingCounts(Seq(
      ev(1, "2024-01-01 09:05:00", "a"), ev(2, "2024-01-01 12:00:00", "a"),
      ev(3, "2024-01-01 09:07:00", "a"), ev(4, "2024-01-01 11:30:00", "a")).toDF())
      .select(date_format(col("window_start"), "HH:mm").as("w"), col("n"))
      .as[(String, Long)].collect().toMap
    assert(batch("09:00") == 2, "batch keeps both 09:0x events")
  }

  test("flatMapGroupsWithState running stats equal batch Welford per user") {
    runningStatsCase("userstats")(EventStreams.runningUserStats)
  }

  test("EVENT-TIME state timeout: sessions close exactly when the watermark passes the gap") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ev(id: Long, ms: Long, user: Long) =
      Event(id, new java.sql.Timestamp(ms), user, "t", 1.0)
    val input = MemoryStream[Event]
    val q = EventStreams.timeoutSessions(input.toDS(), gapMs = 5000L)
      .writeStream.format("memory").queryName("to_sessions").outputMode("append").start()
    def sessions = spark.table("to_sessions")
      .as[EventStreams.SessionSummary].collect()
      .map(s => (s.user_id, s.n_events, s.start_ms, s.end_ms)).sorted.toSeq
    try {
      // batch 1: user 1 has an open 3-event session; user 2 a 1-event one
      input.addData(ev(1, 1000, 1), ev(2, 2000, 1), ev(3, 3000, 1), ev(4, 1000, 2))
      q.processAllAvailable()
      assert(sessions === Seq.empty, "no watermark has passed any gap yet")
      // batch 2: user 1's 20000 closes its own session IN-batch (gap inside
      // the data); user 2 goes idle — its timeout (6000) can only fire once
      // the watermark (now 20000) is applied at the NEXT batch
      input.addData(ev(5, 20000, 1))
      q.processAllAvailable()
      assert(sessions.contains((1L, 3L, 1000L, 3000L)),
        s"in-batch gap must close user 1's first session: $sessions")
      // watermark 20000 now armed: user 2's 6000 fires (extra no-data batch)
      assert(sessions.contains((2L, 1L, 1000L, 1000L)),
        s"watermark past 6000 must time out user 2's session: $sessions")
      // batch 3: push the watermark past user 1's open-session timeout (25000)
      input.addData(ev(6, 40000, 3))
      q.processAllAvailable()
      assert(sessions.contains((1L, 1L, 20000L, 20000L)),
        s"watermark past 25000 must time out user 1's second session: $sessions")
      assert(sessions.size === 3, s"user 3's session must still be OPEN: $sessions")
    } finally q.stop()
  }

  test("late-but-in-watermark events never rewind timeoutSessions bounds") {
    // with watermarkDelay > 0 a LATER batch can legally deliver an event
    // older than state.lastMs; the session must absorb it without shrinking
    // its armed timeout or rewinding start/end (the clamp in timeoutSessions)
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ev(id: Long, ms: Long, user: Long) =
      Event(id, new java.sql.Timestamp(ms), user, "t", 1.0)
    val input = MemoryStream[Event]
    val q = EventStreams.timeoutSessions(input.toDS(), gapMs = 5000L,
        watermarkDelay = "10 seconds")
      .writeStream.format("memory").queryName("late_sessions")
      .outputMode("append").start()
    try {
      input.addData(ev(1, 1000, 1), ev(2, 5000, 1))
      q.processAllAvailable()
      // batch 2: t=2000 is older than lastMs=5000 but inside the watermark
      input.addData(ev(3, 2000, 1))
      q.processAllAvailable()
      // close everything: watermark jumps past lastMs + gap
      input.addData(ev(4, 50000, 9))
      q.processAllAvailable()
      val got = spark.table("late_sessions")
        .as[EventStreams.SessionSummary].collect()
        .map(s => (s.user_id, s.n_events, s.start_ms, s.end_ms)).toSet
      assert(got.contains((1L, 3L, 1000L, 5000L)),
        s"late event must extend the session without rewinding end_ms: $got")
    } finally q.stop()
  }

  test("streaming Dataset.observe: per-batch metrics sum to the exact batch totals") {
    // the streaming half of the observability row (MetricsSpec pins batch
    // observe): metrics ride the micro-batch execution — no second pass over
    // the stream — and surface per batch in QueryProgress.observedMetrics;
    // their accumulation across ALL batches must equal one batch recompute.
    import spark.implicits._
    import scala.collection.JavaConverters._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Double)]()
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(
        e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(
        e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
        val m = e.progress.observedMetrics.get("ev_metrics")
        if (m != null) seen.add((m.getLong(0), m.getDouble(1)))
      }
    }
    spark.streams.addListener(listener)
    try {
      val input = MemoryStream[Event]
      val q = input.toDS().toDF()
        .observe("ev_metrics", count(lit(1)).as("n"), sum(col("value")).as("sv"))
        .writeStream.format("memory").queryName("obs_sink").outputMode("append").start()
      val events = (1 to 60).map(i =>
        Event(i.toLong, new java.sql.Timestamp(1700000000000L + i * 1000L),
          i % 7L, "t", i * 0.5))
      events.grouped(20).foreach { chunk => input.addData(chunk); q.processAllAvailable() }
      q.stop()
      // listener delivery is async: wait until all three batches reported
      val deadline = System.currentTimeMillis() + 30000
      while (seen.asScala.map(_._1).sum < 60 && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      val rows = seen.asScala.toSeq
      assert(rows.map(_._1).sum === 60L, s"observed row counts must cover every batch: $rows")
      assert(math.abs(rows.map(_._2).sum - events.map(_.value).sum) < 1e-9,
        "observed sums must accumulate to the exact batch total")
      assert(rows.size >= 2, "metrics must arrive per micro-batch, not once")
    } finally spark.streams.removeListener(listener)
  }

  test("transformWithState Misra-Gries: streamed candidates keep the n/k superset guarantee") {
    // q124's sketch family in the streaming plane: per-event-type MG state
    // advanced across micro-batches must still contain every user whose true
    // frequency (over everything replayed so far) exceeds n/k, with state
    // bounded by k. Planted Zipf-ish skew so the guarantee is non-vacuous:
    // heavy users genuinely dominate, the tail genuinely evicts.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val k = 16
      val rnd = new scala.util.Random(23)
      var id = 0L
      val events: Seq[Event] = Seq("view", "click", "purchase").flatMap { t =>
        val heavy = (0 until 4).flatMap(i => Seq.fill(240 - 40 * i)(i.toLong))
        val tail = (0 until 120).flatMap(i => Seq.fill(rnd.nextInt(3) + 1)(100L + i))
        rnd.shuffle(heavy ++ tail).map { u =>
          id += 1
          Event(id, new java.sql.Timestamp(1700000000000L + id * 1000L), u, t, 1.0)
        }
      }
      val input = MemoryStream[Event]
      val q = EventStreams.runningHeavyHitters(input.toDS(), k)
        .writeStream.format("memory").queryName("hh_tws").outputMode("update").start()
      events.grouped(math.max(1, events.length / 4)).foreach { chunk =>
        input.addData(chunk)
        q.processAllAvailable()
      }
      q.stop()
      // last update per event type is the final sketch state
      val fin = spark.table("hh_tws")
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("event_type"))
            .orderBy(col("n_seen").desc)))
        .filter(col("rn") === 1)
        .select("event_type", "n_seen", "candidates")
        .as[(String, Long, Seq[String])].collect()
      assert(fin.map(_._1).toSet == Set("view", "click", "purchase"))
      fin.foreach { case (t, nSeen, cands) =>
        val exact = events.filter(_.event_type == t).groupBy(_.user_id.toString)
          .view.mapValues(_.size.toLong).toMap
        val n = exact.valuesIterator.sum
        assert(nSeen == n, s"$t: n_seen must count every replayed row")
        val mustHave = exact.collect { case (u, c) if c * k > n => u }.toSet
        assert(mustHave.nonEmpty, s"$t: fixture must plant real heavy hitters")
        assert(mustHave.subsetOf(cands.toSet),
          s"$t: missing heavy hitters ${mustHave -- cands.toSet}")
        assert(cands.size <= k, s"$t: state exceeded k counters")
        assert(exact.size > k, s"$t: fixture must force eviction (distinct > k)")
      }
    } finally saved.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  test("transformWithState running stats equal batch Welford per user (Spark 4 API)") {
    // the new API's typed state handles need the RocksDB state store provider
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try runningStatsCase("userstats_tws")(EventStreams.runningUserStatsTws)
    finally saved.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  /** Shared body: feed events in three micro-batches through a per-user running
    * stats operator and compare each user's final state to exact two-pass batch
    * statistics. */
  private def runningStatsCase(sink: String)(
      op: org.apache.spark.sql.Dataset[Event] => org.apache.spark.sql.Dataset[EventStreams.UserStats]): Unit = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val events = batchEvents.as[Event].collect().toSeq.sortBy(_.ts.getTime)
    val input = MemoryStream[Event]
    val q = op(input.toDS())
      .writeStream.format("memory").queryName(sink).outputMode("update").start()
    // feed in three micro-batches to force incremental state updates + merges
    events.grouped(math.max(1, events.length / 3)).foreach { chunk =>
      input.addData(chunk)
      q.processAllAvailable()
    }
    q.stop()
    // last update per user is the final state
    val finalStats = spark.table(sink)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
          .orderBy(col("n").desc)))
      .filter(col("rn") === 1)
      .select("user_id", "n", "mean", "variance")
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

    val batch = events.groupBy(_.user_id).map { case (u, es) =>
      val vals = es.map(_.value)
      val mean = vals.sum / vals.size
      val varS = if (vals.size > 1) vals.map(v => (v - mean) * (v - mean)).sum / (vals.size - 1) else 0.0
      u -> ((vals.size.toLong, mean, varS))
    }
    assert(finalStats.keySet == batch.keySet)
    batch.foreach { case (u, (n, m, v)) =>
      val (sn, sm, sv) = finalStats(u)
      assert(sn == n, s"user $u n")
      assert(math.abs(sm - m) < 1e-9, s"user $u mean")
      assert(math.abs(sv - v) / math.max(1.0, v) < 1e-9, s"user $u variance")
    }
  }
}
