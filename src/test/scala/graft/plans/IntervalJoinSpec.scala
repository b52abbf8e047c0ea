package graft.plans

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.DataFrame

/** IntervalJoinRewrite: exactness vs the naive nested-loop plan (nulls, inverted
  * bands, negatives, strict bounds), plan shape (band join must NOT be nested-loop
  * once the rule is on), and the do-not-touch guard for joins Spark already
  * hash-joins.
  *
  * Every measurement builds a FRESH DataFrame: QueryExecution caches the optimized
  * plan, so re-collecting one DF after toggling the rule would silently reuse the
  * old plan and compare naive against naive. */
class IntervalJoinSpec extends SparkSpec {

  /** Tests narrow the bucket width (7/10/11…) for their fixtures; restore the
    * suite baseline after EVERY test — including failing ones, where the in-test
    * trailing restore never runs and the narrow width would cascade into
    * unrelated later tests. */
  override protected def withFixture(test: NoArgTest): org.scalatest.Outcome =
    try super.withFixture(test)
    finally spark.conf.set(IntervalJoinRewrite.WidthKey, "3600")

  private def withRule[A](body: => A): A = {
    GraftExtensions.install(spark)
    spark.conf.set(IntervalJoinRewrite.EnabledKey, "true")
    try body finally spark.conf.set(IntervalJoinRewrite.EnabledKey, "false")
  }

  /** Naive baselines must FORCE the rule off: q68 (exercised by PlanSpec's corpus
    * smoke in the same JVM-wide session) installs the rule and enables it, so
    * relying on the default would compare rewritten against rewritten when suites
    * run in that order. */
  private def withoutRule[A](body: => A): A = {
    spark.conf.set(IntervalJoinRewrite.EnabledKey, "false")
    body
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  /** Fresh band join over numeric values each call; strict toggles > / < bounds. */
  private def numericJoin(strict: Boolean = false): DataFrame = {
    import spark.implicits._
    // points: null, negatives, exact bucket-boundary values
    val pts = Seq(
      (1L, Some(0.0)), (2L, Some(5.0)), (3L, Some(-7.25)), (4L, Some(99.9)),
      (5L, None), (6L, Some(10.0)), (7L, Some(-100.0)), (8L, Some(42.0)))
      .toDF("pid", "v")
    // intervals: null bounds, an inverted band, a wide band, a point band
    val ivs = Seq(
      (10L, Some(-10.0), Some(0.0)),
      (11L, Some(4.5), Some(10.0)),
      (12L, Some(50.0), Some(40.0)),       // inverted -> empty
      (13L, None, Some(100.0)),            // null lo -> empty
      (14L, Some(0.0), None),              // null hi -> empty
      (15L, Some(-1000.0), Some(1000.0)),  // covers everything non-null
      (16L, Some(42.0), Some(42.0)))       // point band
      .toDF("iid", "lo", "hi")
    if (strict) pts.join(ivs, pts("v") > ivs("lo") && pts("v") < ivs("hi"))
    else pts.join(ivs, pts("v") >= ivs("lo") && pts("v") <= ivs("hi"))
  }

  private def tsJoin(): DataFrame = {
    import spark.implicits._
    def ts(s: String) = Timestamp.valueOf(s)
    val pts = Seq(
      (1L, ts("2024-01-01 00:00:30")),
      (2L, ts("2024-01-01 01:59:59")),
      (3L, ts("1969-12-31 23:59:00")),  // negative unix micros
      (4L, ts("2024-06-01 12:00:00")))
      .toDF("pid", "t")
    val ivs = Seq(
      (10L, ts("2024-01-01 00:00:00"), ts("2024-01-01 02:00:00")),
      (11L, ts("1969-12-31 00:00:00"), ts("1970-01-01 00:00:00")),
      (12L, ts("2030-01-01 00:00:00"), ts("2020-01-01 00:00:00")))  // inverted
      .toDF("iid", "lo", "hi")
    pts.join(ivs, pts("t") >= ivs("lo") && pts("t") <= ivs("hi"))
  }

  /** The split plan keeps a nested-loop FALLBACK branch for unbucketable interval
    * rows (NaN/infinite bounds, over-wide bands); with none present AQE observes the
    * branch is empty and prunes it, so the FINAL plan must be nested-loop-free. The
    * executedPlan string also prints the pre-AQE initial plan (where the guarded
    * fallback legitimately appears) — assert on the final section only. */
  private def assertRewritten(df: DataFrame): Unit = {
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"band join still nested-loop in the final plan:\n$plan")
    assert(plan.contains("__graft_ij_bucket"), s"rewrite did not fire:\n$plan")
  }

  test("numeric band join matches the naive plan exactly, and is rewritten") {
    spark.conf.set(IntervalJoinRewrite.WidthKey, "10")
    val naive = withoutRule(sortedRows(numericJoin()))
    val bucketed = withRule {
      val df = numericJoin()
      assertRewritten(df)
      sortedRows(numericJoin())
    }
    assert(bucketed == naive)
    assert(naive.nonEmpty)
  }

  test("strict bounds are preserved") {
    val naive = withoutRule(sortedRows(numericJoin(strict = true)))
    val bucketed = withRule {
      assertRewritten(numericJoin(strict = true))
      sortedRows(numericJoin(strict = true))
    }
    assert(bucketed == naive)
    // boundary rows (v == lo or v == hi) must be excluded
    assert(!naive.exists(r => r.contains("[8,42.0,16,")))
    // but the non-strict variant does include the point band match
    assert(withoutRule(sortedRows(numericJoin())).exists(_.contains("[8,42.0,16,")))
  }

  test("without the rule a band join IS nested-loop (the test means something)") {
    val df = numericJoin()
    withoutRule(df.collect())
    val off = df.queryExecution.executedPlan.toString
    assert(off.contains("BroadcastNestedLoopJoin") || off.contains("CartesianProduct"))
    assert(!off.contains("__graft_ij_bucket"))
  }

  test("timestamp band join matches naive, including pre-1970 points") {
    spark.conf.set(IntervalJoinRewrite.WidthKey, "3600")
    val naive = withoutRule(sortedRows(tsJoin()))
    val bucketed = withRule {
      assertRewritten(tsJoin())
      sortedRows(tsJoin())
    }
    assert(bucketed == naive)
    assert(naive.exists(_.startsWith("[3,")), "pre-1970 match must survive bucketing")
  }

  test("joins with an equi conjunct are left alone") {
    import spark.implicits._
    def mkJoin(): DataFrame = {
      val a = Seq((1L, 5.0), (2L, 9.0)).toDF("k", "v")
      val b = Seq((1L, 0.0, 10.0), (2L, 6.0, 10.0)).toDF("k2", "lo", "hi")
      a.join(b, a("k") === b("k2") && a("v") >= b("lo") && a("v") <= b("hi"))
    }
    withRule {
      val df = mkJoin()
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("__graft_ij_bucket"), s"rule must not touch equi joins:\n$plan")
      assert(sortedRows(mkJoin()) == Seq("[1,5.0,1,0.0,10.0]", "[2,9.0,2,6.0,10.0]"))
    }
  }

  test("q68 (declared band-join query) is rewritten, not nested-loop") {
    spark.conf.unset(IntervalJoinRewrite.WidthKey) // exercise auto-derivation
    val df = graft.Registry.byName("q68_band_join_rule").fn(spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"q68's final plan must ride the rewrite (empty fallback pruned by AQE):\n${plan.take(600)}")
    assert(plan.contains("__graft_ij_bucket"))
    // the fixed 2-minute band auto-derives W = 120 s = 120,000,000 micros with no
    // conf set — visible as the floor-division divisor in the bucket expressions
    assert(plan.contains("120000000"),
      s"expected auto-derived 120 s bucket width in:\n${plan.take(900)}")
    spark.conf.set(IntervalJoinRewrite.EnabledKey, "false")
  }

  test("randomized equivalence: rewritten results equal naive on generated data") {
    import spark.implicits._
    val rnd = new scala.util.Random(42) // fixed seed: deterministic spec
    for (round <- 0 until 3) {
      // magnitudes chosen to straddle bucket boundaries at every width below;
      // ~10% nulls on each field; bands from inverted (negative span) to wide
      def v(): Option[Double] =
        if (rnd.nextInt(10) == 0) None else Some((rnd.nextDouble() - 0.5) * 2000)
      val pts = (1 to 60).map(i => (i.toLong, v())).toDF("pid", "v")
      val ivs = (1 to 40).map { i =>
        val lo = v()
        val hi = lo.map(_ + (rnd.nextDouble() - 0.2) * 300)
        (i.toLong + 1000, lo, hi)
      }.toDF("iid", "lo", "hi")
      def joined() = pts.join(ivs, pts("v") >= ivs("lo") && pts("v") <= ivs("hi"))
      val naive = withoutRule(sortedRows(joined()))
      for (w <- Seq("7", "250", "10000")) {
        spark.conf.set(IntervalJoinRewrite.WidthKey, w)
        val got = withRule { assertRewritten(joined()); sortedRows(joined()) }
        assert(got == naive, s"round=$round width=$w diverged")
      }
    }
    spark.conf.set(IntervalJoinRewrite.WidthKey, "3600")
  }

  test("date band join matches naive (width rounds up to whole days)") {
    import spark.implicits._
    def d(s: String) = java.sql.Date.valueOf(s)
    def mkJoin(): DataFrame = {
      val pts = Seq(
        (1L, d("2024-01-15")), (2L, d("2024-03-01")),
        (3L, d("1969-06-30")),  // negative unix days
        (4L, d("2024-12-31")))
        .toDF("pid", "dt")
      val ivs = Seq(
        (10L, d("2024-01-01"), d("2024-01-31")),
        (11L, d("1969-01-01"), d("1969-12-31")),
        (12L, d("2024-06-01"), d("2024-05-01")))  // inverted
        .toDF("iid", "lo", "hi")
      pts.join(ivs, pts("dt") >= ivs("lo") && pts("dt") <= ivs("hi"))
    }
    spark.conf.set(IntervalJoinRewrite.WidthKey, (86400 * 7).toString) // weekly buckets
    val naive = withoutRule(sortedRows(mkJoin()))
    val bucketed = withRule { assertRewritten(mkJoin()); sortedRows(mkJoin()) }
    assert(bucketed == naive)
    assert(naive.exists(_.startsWith("[3,")), "pre-1970 date match must survive")
    spark.conf.set(IntervalJoinRewrite.WidthKey, "3600")
  }

  test("SQL-text band joins (BETWEEN) are rewritten too — no API opt-in") {
    import spark.implicits._
    Seq((1L, 5.0), (2L, 42.0), (3L, 99.0)).toDF("pid", "v")
      .createOrReplaceTempView("ij_pts")
    Seq((10L, 0.0, 10.0), (11L, 40.0, 50.0)).toDF("iid", "lo", "hi")
      .createOrReplaceTempView("ij_ivs")
    def q() = spark.sql(
      "SELECT pid, iid FROM ij_pts JOIN ij_ivs ON v BETWEEN lo AND hi")
    spark.conf.set(IntervalJoinRewrite.WidthKey, "10")
    val naive = withoutRule(sortedRows(q()))
    val bucketed = withRule { assertRewritten(q()); sortedRows(q()) }
    assert(bucketed == naive && naive == Seq("[1,10]", "[2,11]"))
    spark.conf.set(IntervalJoinRewrite.WidthKey, "3600")
  }

  test("semi, anti, and left-outer band joins rewrite exactly (fixed integral band)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def pts() = ((1 to 80).map(i =>
      (i.toLong, if (i % 11 == 0) None else Some(rnd.nextInt(2000).toLong))) :+
      (99L, None)).toDF("pid", "v")
    def ivs() = ((1 to 30).map(i =>
      (i.toLong + 500, if (i % 7 == 0) None else Some(rnd.nextInt(2000).toLong))) :+
      (599L, None)).toDF("iid", "lo")
    // fixed-width integral band: hi = lo + 50 (statically bounded, no fallback).
    // Width 7 makes every band straddle 8+ bucket boundaries — a width larger
    // than the data range would put everything in bucket 0 and pass vacuously.
    spark.conf.set(IntervalJoinRewrite.WidthKey, "7")
    def joined(tpe: String) = {
      val (p, iv) = (pts(), ivs())
      p.join(iv, p("v") >= iv("lo") && p("v") <= iv("lo") + 50, tpe)
    }
    for (tpe <- Seq("left_semi", "left_anti", "left_outer")) {
      // fresh deterministic data per plan build: re-seed so both runs see the same rows
      rnd.setSeed(7)
      val naive = withoutRule(sortedRows(joined(tpe)))
      rnd.setSeed(7)
      val rewritten = withRule {
        val df = joined(tpe)
        assertRewritten(df)
        rnd.setSeed(7)
        sortedRows(joined(tpe))
      }
      assert(rewritten == naive, s"$tpe diverged")
      assert(naive.nonEmpty, s"$tpe fixture must produce rows")
    }
    spark.conf.set(IntervalJoinRewrite.WidthKey, "3600")
  }

  test("point-on-right semi/anti rewrite exactly via id-collapse (incl. duplicates)") {
    import spark.implicits._
    // Interval side is the PRESERVED left side. Fixture stresses the collapse:
    //  - iid 10 spans many buckets and contains points in SEVERAL buckets — its
    //    exploded copies match more than once and must collapse to ONE output row;
    //  - iid 10 appears TWICE (duplicate row) — semi/anti must preserve multiplicity;
    //  - iid 12 has a null lo (matches nothing: semi drops it, anti keeps it);
    //  - iid 13 matches nothing (anti keeps it).
    def p() = Seq((1L, 5L), (2L, 100L), (3L, 40L), (4L, 75L)).toDF("pid", "v")
    def iv() = Seq(
      (10L, Some(0L)), (10L, Some(0L)), (11L, Some(90L)),
      (12L, None: Option[Long]), (13L, Some(5000L))).toDF("iid", "lo")
    spark.conf.set(IntervalJoinRewrite.WidthKey, "7")
    def joined(tpe: String) = {
      val (ivd, pd) = (iv(), p())
      ivd.join(pd, pd("v") >= ivd("lo") && pd("v") <= ivd("lo") + 110, tpe)
    }
    for (tpe <- Seq("left_semi", "left_anti")) {
      val naive = withoutRule(sortedRows(joined(tpe)))
      val rewritten = withRule {
        assertRewritten(joined(tpe))
        sortedRows(joined(tpe))
      }
      assert(rewritten == naive, s"$tpe diverged: $rewritten vs $naive")
    }
    // pin the exact semantics, duplicates included
    assert(withoutRule(sortedRows(joined("left_semi"))) ==
      Seq("[10,0]", "[10,0]", "[11,90]"))
    assert(withoutRule(sortedRows(joined("left_anti"))) ==
      Seq("[12,null]", "[13,5000]"))
    spark.conf.set(IntervalJoinRewrite.WidthKey, "3600")
  }

  test("right-outer band join rewrites exactly (point on preserved right)") {
    import spark.implicits._
    def p() = Seq(
      (1L, Some(5L)), (2L, Some(100L)), (3L, Some(9999L)), // 3 matches nothing
      (4L, None: Option[Long])).toDF("pid", "v")            // null point -> null-extended
    def iv() = Seq((10L, Some(0L)), (11L, Some(90L)), (12L, None: Option[Long]))
      .toDF("iid", "lo")
    spark.conf.set(IntervalJoinRewrite.WidthKey, "7")
    def joined() = {
      val (ivd, pd) = (iv(), p())
      ivd.join(pd, pd("v") >= ivd("lo") && pd("v") <= ivd("lo") + 50, "right_outer")
    }
    val naive = withoutRule(sortedRows(joined()))
    val rewritten = withRule {
      assertRewritten(joined())
      sortedRows(joined())
    }
    assert(rewritten == naive, s"right_outer diverged: $rewritten vs $naive")
    // unmatched preserved rows null-extend exactly once
    assert(naive.count(_.startsWith("[null,null,3,")) == 1)
    assert(naive.count(_.startsWith("[null,null,4,")) == 1)
    spark.conf.set(IntervalJoinRewrite.WidthKey, "3600")
  }

  test("full-outer band join rewrites exactly (both orientations, incl. duplicates)") {
    import spark.implicits._
    // stresses both recoveries: pts 3/4 match nothing (unmatched point rows kept
    // once), iid 12/13 match nothing (one null-extension per interval row, not
    // per exploded copy), iid 10 duplicated (multiplicity preserved), iid 10
    // matches points in multiple buckets (matched pairs not deduped)
    def p() = Seq(
      (1L, Some(5L)), (2L, Some(100L)), (3L, Some(9999L)),
      (4L, None: Option[Long])).toDF("pid", "v")
    def iv() = Seq(
      (10L, Some(0L)), (10L, Some(0L)), (11L, Some(90L)),
      (12L, None: Option[Long]), (13L, Some(5000L))).toDF("iid", "lo")
    spark.conf.set(IntervalJoinRewrite.WidthKey, "7")
    for (pointLeft <- Seq(true, false)) {
      def joined() = {
        val (ivd, pd) = (iv(), p())
        val cond = pd("v") >= ivd("lo") && pd("v") <= ivd("lo") + 110
        if (pointLeft) pd.join(ivd, cond, "full_outer")
        else ivd.join(pd, cond, "full_outer")
      }
      val naive = withoutRule(sortedRows(joined()))
      val rewritten = withRule {
        assertRewritten(joined())
        sortedRows(joined())
      }
      assert(rewritten == naive, s"full_outer pointLeft=$pointLeft diverged:\n$rewritten\nvs\n$naive")
      // exactly one null-extension per unmatched row on each side
      assert(naive.count(_.contains("9999")) == 1)
      assert(naive.count(_.startsWith(if (pointLeft) "[null,null,13," else "[13,5000,null,")) == 1)
    }
    spark.conf.set(IntervalJoinRewrite.WidthKey, "3600")
  }

  test("id-tagged rewrites decline when the tagged side is not retry-stable") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, min}
    // Interval side rooted at an AGGREGATE: a shuffle below the id projection
    // means monotonic ids could differ across partial stage retries (fetch
    // failure / speculation), so the id-collapse rewrites must DECLINE — the
    // join stays nested-loop and exact — unless the user opts in via
    // allowUnstableTags. Duplicate pre-agg rows make the aggregate non-trivial.
    def p() = Seq((1L, 5L), (2L, 100L)).toDF("pid", "v")
    def iv() = Seq((10L, 0L), (10L, 7L), (11L, 90L), (13L, 5000L))
      .toDF("iid0", "lo0")
      .groupBy(col("iid0")).agg(min(col("lo0")).as("lo"))
      .select(col("iid0").as("iid"), col("lo"))
    def joined(tpe: String) = {
      val (ivd, pd) = (iv(), p())
      ivd.join(pd, pd("v") >= ivd("lo") && pd("v") <= ivd("lo") + 110, tpe)
    }
    spark.conf.set(IntervalJoinRewrite.WidthKey, "7")
    for (tpe <- Seq("left_semi", "left_anti", "full_outer")) {
      val naive = withoutRule(sortedRows(joined(tpe)))
      assert(naive.nonEmpty, s"$tpe fixture must produce rows")
      val declined = withRule {
        val df = joined(tpe)
        df.collect()
        val plan = df.queryExecution.executedPlan.toString
        assert(!plan.contains("__graft_ij_id"),
          s"$tpe must decline id-tagging over an aggregate-rooted side:\n$plan")
        sortedRows(joined(tpe))
      }
      assert(declined == naive, s"$tpe declined-path diverged")
      val forced = withRule {
        spark.conf.set(IntervalJoinRewrite.UnstableTagsKey, "true")
        try {
          assertRewritten(joined(tpe))
          sortedRows(joined(tpe))
        } finally spark.conf.unset(IntervalJoinRewrite.UnstableTagsKey)
      }
      assert(forced == naive, s"$tpe forced rewrite diverged")
    }
  }

  test("randomized point-on-right semi/anti and right-outer equal naive") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    for (round <- 0 until 2) {
      val ptRows = (1 to 70).map(i =>
        (i.toLong, if (i % 9 == 0) None else Some(rnd.nextInt(1500).toLong)))
      val ivRows = (1 to 40).map(i =>
        (i.toLong + 500, if (i % 7 == 0) None else Some(rnd.nextInt(1500).toLong)))
      def pts() = ptRows.toDF("pid", "v")
      def ivs() = ivRows.toDF("iid", "lo")
      spark.conf.set(IntervalJoinRewrite.WidthKey, "11")
      for (tpe <- Seq("left_semi", "left_anti", "right_outer", "full_outer")) {
        def joined() = {
          val (ivd, pd) = (ivs(), pts())
          ivd.join(pd, pd("v") >= ivd("lo") && pd("v") <= ivd("lo") + 100, tpe)
        }
        val naive = withoutRule(sortedRows(joined()))
        val rewritten = withRule { assertRewritten(joined()); sortedRows(joined()) }
        assert(rewritten == naive, s"round=$round $tpe diverged")
        assert(naive.nonEmpty)
      }
    }
    spark.conf.set(IntervalJoinRewrite.WidthKey, "3600")
  }

  test("IEEE specials and giant bands: fallback branch keeps results exact") {
    import spark.implicits._
    val inf = Double.PositiveInfinity
    def mkJoin(): DataFrame = {
      val pts = Seq(
        (1L, Some(5.0)), (2L, Some(1e14)), (3L, Some(Double.NaN)),
        (4L, Some(-inf)), (5L, Some(inf)), (6L, None))
        .toDF("pid", "v")
      val ivs = Seq(
        (10L, Some(0.0), Some(inf)),          // infinite upper bound
        (11L, Some(-inf), Some(10.0)),        // infinite lower bound
        (12L, Some(0.0), Some(Double.NaN)),   // NaN bound (Spark: NaN > everything)
        (13L, Some(0.0), Some(1e15)),         // giant band >> maxFanout buckets
        (14L, Some(4.0), Some(6.0)),          // ordinary band, bucketed branch
        (15L, None, Some(inf)))               // null lo
        .toDF("iid", "lo", "hi")
      pts.join(ivs, pts("v") >= ivs("lo") && pts("v") <= ivs("hi"))
    }
    spark.conf.set(IntervalJoinRewrite.WidthKey, "10")
    val naive = withoutRule(sortedRows(mkJoin()))
    val rewritten = withRule {
      val df = mkJoin()
      df.collect()
      val full = df.queryExecution.executedPlan.toString
      assert(full.contains("__graft_ij_bucket"), "rewrite must fire")
      sortedRows(mkJoin())
    }
    assert(rewritten == naive)
    // sanity on the semantics themselves: NaN upper bound admits every point >= lo
    // under Spark's NaN-greatest ordering, including a NaN point
    assert(naive.exists(_.startsWith("[3,NaN,12,")), "NaN point must match NaN-bounded band")
    assert(naive.exists(_.startsWith("[2,")), "giant band must keep its matches")
    spark.conf.set(IntervalJoinRewrite.WidthKey, "3600")
  }

  test("bucket width does not affect results, only plans") {
    val naive = withoutRule(sortedRows(numericJoin()))
    for (w <- Seq("0.5", "1", "100", "100000")) {
      spark.conf.set(IntervalJoinRewrite.WidthKey, w)
      val got = withRule {
        assertRewritten(numericJoin())
        sortedRows(numericJoin())
      }
      assert(got == naive, s"width=$w diverged")
    }
    spark.conf.set(IntervalJoinRewrite.WidthKey, "3600")
  }
}
