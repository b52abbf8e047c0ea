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
        b.scan.toBatch.planInputPartitions().toSeq.flatMap {
          case f: org.apache.spark.sql.execution.datasources.FilePartition =>
            f.files.map(p => java.nio.file.Paths.get(
              new java.net.URI(p.filePath.toString).getPath).getParent.getFileName.toString)
          case _ => Nil
        }
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
