package graft.catalog

import java.nio.file.Files

import graft.SparkSpec

/** Pins for top-k segment pruning (GraftTopKPrune): `ORDER BY x DESC
  * LIMIT k` reads only the segments whose zone range can reach the top k,
  * via a sound zone-stat threshold — and every soundness gate (delete
  * vectors, ascending order, statless guarantees, under-k tables) falls back
  * to the full scan instead of risking a wrong answer. */
class TopKPruneSpec extends SparkSpec {

  private lazy val root = {
    val d = Files.createTempDirectory("graft_topk_spec")
    spark.conf.set("spark.sql.catalog.gtk", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gtk.root", d.toString)
    d
  }

  private def sql(q: String) = spark.sql(q)

  private def plannedSegs(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.executedPlan.collectLeaves().collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        def filesOf(p: org.apache.spark.sql.connector.read.InputPartition): Seq[String] = p match {
          case f: org.apache.spark.sql.execution.datasources.FilePartition =>
            f.files.map(pf => java.nio.file.Paths.get(
              new java.net.URI(pf.filePath.toString).getPath).getParent.getFileName.toString).toSeq
          case GraftDvPartition(inner, _, _) => filesOf(inner)
          case _ => Nil
        }
        b.scan.toBatch.planInputPartitions().toSeq.flatMap(filesOf)
    }.flatten.distinct

  private def mk(table: String, withNulls: Boolean = false): Unit = {
    root
    sql(s"DROP TABLE IF EXISTS gtk.ns.$table")
    sql(s"CREATE TABLE gtk.ns.$table (k BIGINT, score BIGINT) USING parquet")
    // 8 segments with stacked score ranges: [0,1000), [1000,2000), ...
    (0 until 8).foreach { w =>
      val nullCase =
        if (withNulls) s"CASE WHEN id % 5 = 0 THEN NULL ELSE id END" else "id"
      sql(s"""INSERT INTO gtk.ns.$table
              SELECT id, $nullCase FROM range(${w * 1000}, ${w * 1000 + 1000})""")
    }
  }

  test("ORDER BY score DESC LIMIT k plans only the segments that can reach the top k") {
    mk("t1")
    val q = "SELECT k, score FROM gtk.ns.t1 ORDER BY score DESC LIMIT 5"
    val df = sql(q)
    assert(plannedSegs(df).size === 1,
      s"top-5 must plan ONE segment (the top range), got ${plannedSegs(df)}")
    assert(df.collect().map(_.getLong(1)).toSeq === (7995L to 7999L).reverse)
    // a LIMIT spanning two segments keeps exactly two
    val q2 = "SELECT score FROM gtk.ns.t1 ORDER BY score DESC LIMIT 1500"
    assert(plannedSegs(sql(q2)).size === 2, plannedSegs(sql(q2)).toString)
    assert(sql(q2).count() === 1500L)
    // NULLS LAST is the desc default: nulls can never displace the cut
    mk("tn", withNulls = true)
    val qn = "SELECT score FROM gtk.ns.tn ORDER BY score DESC LIMIT 5"
    assert(plannedSegs(sql(qn)).size === 1)
    assert(sql(qn).collect().map(_.getLong(0)).toSeq ===
      (7000L until 8000L).filter(_ % 5 != 0).sorted.reverse.take(5))
  }

  test("ASC NULLS LAST mirror: bottom-k plans only the reachable segments (r19)") {
    mk("ta")
    val q = "SELECT k, score FROM gtk.ns.ta ORDER BY score ASC NULLS LAST LIMIT 5"
    val df = sql(q)
    assert(plannedSegs(df).size === 1,
      s"bottom-5 must plan ONE segment (the bottom range), got ${plannedSegs(df)}")
    assert(df.collect().map(_.getLong(1)).toSeq === (0L to 4L))
    // spanning two segments keeps exactly two
    val q2 = "SELECT score FROM gtk.ns.ta ORDER BY score ASC NULLS LAST LIMIT 1500"
    assert(plannedSegs(sql(q2)).size === 2, plannedSegs(sql(q2)).toString)
    assert(sql(q2).count() === 1500L)
    // with nulls: τ's ≥ k non-null guarantee keeps dropping them sound
    mk("tan", withNulls = true)
    val qn = "SELECT score FROM gtk.ns.tan ORDER BY score ASC NULLS LAST LIMIT 5"
    assert(plannedSegs(sql(qn)).size === 1)
    assert(sql(qn).collect().map(_.getLong(0)).toSeq ===
      (0L until 1000L).filter(_ % 5 != 0).sorted.take(5))
  }

  test("a WHERE on the sort column COMPOSES with τ instead of voiding it (r19)") {
    mk("tw")
    // floor filter: top-k within [2000, ∞) — τ still cuts to the top segment
    val q = """SELECT score FROM gtk.ns.tw WHERE score >= 2000
               ORDER BY score DESC LIMIT 5"""
    assert(plannedSegs(sql(q)).size === 1, plannedSegs(sql(q)).toString)
    assert(sql(q).collect().map(_.getLong(0)).toSeq === (7995L to 7999L).reverse)
    // ceiling filter: only fully-contained segments vouch; τ cuts within
    // the highest contained band (the filter itself prunes the rest)
    val q2 = """SELECT score FROM gtk.ns.tw WHERE score < 3000
                ORDER BY score DESC LIMIT 5"""
    assert(plannedSegs(sql(q2)).size === 1, plannedSegs(sql(q2)).toString)
    assert(sql(q2).collect().map(_.getLong(0)).toSeq === (2995L to 2999L).reverse)
    // bottom-k under a floor composes through the ASC mirror too
    val q3 = """SELECT score FROM gtk.ns.tw WHERE score > 999
                ORDER BY score ASC NULLS LAST LIMIT 5"""
    assert(plannedSegs(sql(q3)).size === 1, plannedSegs(sql(q3)).toString)
    assert(sql(q3).collect().map(_.getLong(0)).toSeq === (1000L to 1004L))
  }

  test("non-sort-column predicates compose via ZONE CONTAINMENT (r20)") {
    root
    sql("DROP TABLE IF EXISTS gtk.ns.tc")
    sql("CREATE TABLE gtk.ns.tc (k BIGINT, lang STRING, score BIGINT) USING parquet")
    // 4 'en' segments with stacked score bands + 2 'de' segments overlapping
    // the top band: under `WHERE lang = 'en'` the en segments are FULLY
    // CONTAINED (they vouch), the de segments are fully outside (the pushed
    // filter zone-prunes them), so τ cuts to the top en band alone
    (0 until 4).foreach { w =>
      sql(s"""INSERT INTO gtk.ns.tc
              SELECT id, 'en', id FROM range(${w * 1000}, ${w * 1000 + 1000})""")
    }
    sql("INSERT INTO gtk.ns.tc SELECT id + 10000, 'de', id FROM range(3000, 4000)")
    sql("INSERT INTO gtk.ns.tc SELECT id + 20000, 'de', id FROM range(9000, 10000)")
    val q = """SELECT k, score FROM gtk.ns.tc WHERE lang = 'en'
               ORDER BY score DESC LIMIT 5"""
    assert(plannedSegs(sql(q)).size === 1,
      s"top-5 WHERE lang='en' must plan ONE segment, got ${plannedSegs(sql(q))}")
    assert(sql(q).collect().map(_.getLong(1)).toSeq === (3995L to 3999L).reverse)
    // a MIXED segment (partially overlapping the predicate) scans but does
    // not vouch: its survivor count is unknowable from bounds alone
    sql("DROP TABLE IF EXISTS gtk.ns.tm")
    sql("CREATE TABLE gtk.ns.tm (k BIGINT, grp BIGINT, score BIGINT) USING parquet")
    // seg A: grp 0/1 mixed, scores [2000,3000) — NOT contained under grp=0
    sql("INSERT INTO gtk.ns.tm SELECT id, id % 2, id + 2000 FROM range(0, 1000)")
    // seg B: grp 0 pure, scores [0,1000) — contained, vouches
    sql("INSERT INTO gtk.ns.tm SELECT id, 0, id FROM range(0, 1000)")
    val qm = "SELECT score FROM gtk.ns.tm WHERE grp = 0 ORDER BY score DESC LIMIT 600"
    // B alone vouches 1000 ≥ 600 → τ = 0: nothing prunes (A might hold the
    // real top rows, and it DOES — the answer must include A's grp-0 rows)
    assert(plannedSegs(sql(qm)).size === 2)
    val got = sql(qm).collect().map(_.getLong(0)).toSeq
    assert(got.take(3) === Seq(2998L, 2996L, 2994L),
      "mixed segment's surviving rows must win the top-k")
    // a date-range predicate on a second column composes the same way
    sql("DROP TABLE IF EXISTS gtk.ns.td")
    sql("CREATE TABLE gtk.ns.td (ds DATE, score BIGINT) USING parquet")
    sql("""INSERT INTO gtk.ns.td
           SELECT DATE'2024-01-15', id FROM range(0, 1000)""")
    sql("""INSERT INTO gtk.ns.td
           SELECT DATE'2024-02-15', id + 1000 FROM range(0, 1000)""")
    sql("""INSERT INTO gtk.ns.td
           SELECT DATE'2023-12-15', id + 2000 FROM range(0, 1000)""")
    val qd = """SELECT score FROM gtk.ns.td WHERE ds >= DATE'2024-01-01'
                ORDER BY score DESC LIMIT 5"""
    assert(plannedSegs(sql(qd)).size === 1, plannedSegs(sql(qd)).toString)
    assert(sql(qd).collect().map(_.getLong(0)).toSeq === (1995L to 1999L).reverse)
  }

  test("per-segment DV counts keep τ tight under a skewed delete wave (r20)") {
    root
    sql("DROP TABLE IF EXISTS gtk.ns.tdv")
    sql("""CREATE TABLE gtk.ns.tdv (k BIGINT, score BIGINT) USING parquet
           TBLPROPERTIES ('graft.delete-mode' = 'merge-on-read')""")
    (0 until 4).foreach { w =>
      sql(s"INSERT INTO gtk.ns.tdv SELECT id, id FROM range(${w * 1000}, ${w * 1000 + 1000})")
    }
    // ONE delete wave: guts the bottom segment (900 rows) but touches the
    // top segment barely (5 rows). The dv's TOTAL count is 905 — the old
    // per-directory penalty would subtract 905 from the TOP segment too
    // (guarantee 95 < k) and τ would fall back to the next band; the
    // per-segment counts recorded at commit subtract exactly 5, so the top
    // segment still vouches for k=100 and the plan keeps ONE segment.
    sql("DELETE FROM gtk.ns.tdv WHERE score < 900 OR score >= 3995")
    val q = "SELECT score FROM gtk.ns.tdv ORDER BY score DESC LIMIT 100"
    assert(plannedSegs(sql(q)).size === 1,
      s"exact per-segment dv counts must keep the top segment vouching, got ${plannedSegs(sql(q))}")
    assert(sql(q).collect().map(_.getLong(0)).toSeq ===
      (3895L until 3995L).reverse)
  }

  test("STRING sort columns prune on exact ASCII bounds; foreign bounds refuse (r20)") {
    root
    sql("DROP TABLE IF EXISTS gtk.ns.ts")
    sql("CREATE TABLE gtk.ns.ts (k BIGINT, url STRING) USING parquet")
    // 3 segments in disjoint collation bands: a*, m*, x* (self-written →
    // exactness-flagged bounds)
    Seq("a", "m", "x").foreach { p =>
      sql(s"""INSERT INTO gtk.ns.ts
              SELECT id, concat('$p', lpad(CAST(id AS STRING), 4, '0'))
              FROM range(0, 1000)""")
    }
    val q = "SELECT url FROM gtk.ns.ts ORDER BY url DESC LIMIT 5"
    assert(plannedSegs(sql(q)).size === 1,
      s"string top-5 must plan the x* segment alone, got ${plannedSegs(sql(q))}")
    assert(sql(q).collect().map(_.getString(0)).toSeq ===
      (995 to 999).reverse.map(i => f"x$i%04d"))
    // bottom-k mirror
    val q2 = "SELECT url FROM gtk.ns.ts ORDER BY url ASC NULLS LAST LIMIT 5"
    assert(plannedSegs(sql(q2)).size === 1)
    assert(sql(q2).collect().map(_.getString(0)).toSeq ===
      (0 to 4).map(i => f"a$i%04d"))
    // FOREIGN bounds (add_files import decodes strExact = false) cannot
    // VOUCH for a string τ — brackets of unknown origin never anchor the
    // cut. The imported z* segment holds the true top-5; had its bounds
    // been trusted, τ = its min and ONE segment would plan. Instead τ comes
    // from the best self-written band (x*), whose bound keeps the foreign
    // segment scannable: 2 segments plan, and the answer is still the
    // import's rows — refusal costs IO, never correctness.
    val ext = Files.createTempDirectory("gtk_ext")
    spark.range(0, 1000).selectExpr("id AS k",
      "concat('z', lpad(CAST(id AS STRING), 4, '0')) AS url")
      .coalesce(1).write.mode("overwrite").parquet(ext.toString)
    sql(s"CALL gtk.system.add_files('ns.ts', '$ext')")
    val q3 = sql("SELECT url FROM gtk.ns.ts ORDER BY url DESC LIMIT 5")
    assert(plannedSegs(q3).size === 2,
      s"foreign bounds must not vouch (1 seg would mean they did), got ${plannedSegs(q3)}")
    assert(q3.collect().map(_.getString(0)).toSeq ===
      (995 to 999).reverse.map(i => f"z$i%04d"))
  }

  test("LIMIT k OFFSET m (pagination) prunes with τ built for k+m (r20)") {
    mk("tp")
    // page 2 of a 50-row page: positions 51..100 — τ for 100 still cuts to
    // the top segment (1000 rows), and the page content is exact
    val q = "SELECT score FROM gtk.ns.tp ORDER BY score DESC LIMIT 50 OFFSET 50"
    assert(plannedSegs(sql(q)).size === 1,
      s"page-2 top-100 must plan ONE segment, got ${plannedSegs(sql(q))}")
    assert(sql(q).collect().map(_.getLong(0)).toSeq ===
      (7900L until 7950L).sorted.reverse)
    // a window REACHING past one segment's guarantee keeps two segments
    val q2 = "SELECT score FROM gtk.ns.tp ORDER BY score DESC LIMIT 100 OFFSET 950"
    assert(plannedSegs(sql(q2)).size === 2, plannedSegs(sql(q2)).toString)
    assert(sql(q2).collect().map(_.getLong(0)).toSeq ===
      (6950L until 7050L).sorted.reverse)
  }

  test("Long.MinValue segment min cannot poison τ (r19 regression)") {
    root
    sql("DROP TABLE IF EXISTS gtk.ns.tmin")
    sql("CREATE TABLE gtk.ns.tmin (k BIGINT, score BIGINT) USING parquet")
    // A: [0,999), B: [1000,1999), C: {MinValue, MinValue+1, 5000} — under
    // the old negated sort C's min overflowed to the HIGHEST rank and its 3
    // rows vouched for τ=1000 at k=1002, pruning segment A which holds the
    // true 1002nd value (999)
    sql("INSERT INTO gtk.ns.tmin SELECT id, id FROM range(0, 1000)")
    sql("INSERT INTO gtk.ns.tmin SELECT id, id FROM range(1000, 2000)")
    sql(s"""INSERT INTO gtk.ns.tmin VALUES
            (9000, ${Long.MinValue}), (9001, ${Long.MinValue} + 1), (9002, 5000)""")
    val q = "SELECT score FROM gtk.ns.tmin ORDER BY score DESC LIMIT 1002"
    val got = sql(q).collect().map(_.getLong(0)).toSeq
    assert(got.length === 1002)
    assert(got.last === 999L,
      s"the 1002nd value must be 999 from the bottom segment, got ${got.last}")
  }

  test("soundness gates fall back to the full scan") {
    mk("t2")
    // the kill switch disables the rule session-wide (r20)
    spark.conf.set("spark.graft.topk.prune", "false")
    try assert(plannedSegs(sql(
      "SELECT score FROM gtk.ns.t2 ORDER BY score DESC LIMIT 5")).size === 8)
    finally spark.conf.set("spark.graft.topk.prune", "true")
    assert(plannedSegs(sql("SELECT score FROM gtk.ns.t2 ORDER BY score DESC LIMIT 5")).size === 1)
    // ASC (NULLS FIRST default) is refused
    assert(plannedSegs(sql("SELECT score FROM gtk.ns.t2 ORDER BY score ASC LIMIT 5")).size === 8)
    // a user WHERE invalidates the row-count guarantee
    assert(plannedSegs(sql(
      "SELECT score FROM gtk.ns.t2 WHERE k % 2 = 0 ORDER BY score DESC LIMIT 5")).size === 8)
    // k larger than the table keeps everything (and stays correct)
    assert(sql("SELECT score FROM gtk.ns.t2 ORDER BY score DESC LIMIT 100000").count() === 8000L)
    // DELETE VECTORS weaken the guarantees (r19): the gutted top segment
    // vouches for only its LIVE rows (rows - footer-counted dv positions),
    // so τ reaches into the next segment — and the cross-segment answer
    // stays exact while segments below τ still prune
    sql("DROP TABLE IF EXISTS gtk.ns.t3")
    sql("""CREATE TABLE gtk.ns.t3 (k BIGINT, score BIGINT) USING parquet
           TBLPROPERTIES ('graft.delete-mode' = 'merge-on-read')""")
    (0 until 4).foreach { w =>
      sql(s"INSERT INTO gtk.ns.t3 SELECT id, id FROM range(${w * 1000}, ${w * 1000 + 1000})")
    }
    sql("DELETE FROM gtk.ns.t3 WHERE score >= 3005") // guts the top segment: 5 live
    val top = sql("SELECT score FROM gtk.ns.t3 ORDER BY score DESC LIMIT 10")
    assert(top.collect().map(_.getLong(0)).toSeq === (2995L to 3004L).reverse,
      "the DV-weakened τ must still produce the exact cross-segment answer")
    // the weakened τ (top segment vouches 5 of k=10 → τ = seg2's min 2000)
    // was INJECTED: the optimized plan carries the composed bound
    val opt = top.queryExecution.optimizedPlan.toString
    assert(opt.contains(">= 2000"),
      s"expected the DV-weakened τ=2000 filter in the plan:\n$opt")
  }
}
