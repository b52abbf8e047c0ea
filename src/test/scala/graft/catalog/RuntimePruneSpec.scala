package graft.catalog

import java.nio.file.Files

import graft.SparkSpec

/** Pins for runtime (join-driven) SEGMENT pruning (GraftRuntimePrune via
  * SupportsRuntimeV2Filtering): a selective dimension filter becomes a
  * fact-side IN predicate at execution time, and the fact scan re-plans over
  * only the segments whose committed zone bounds admit the surviving keys —
  * dynamic partition pruning for the graft segment layout. */
class RuntimePruneSpec extends SparkSpec {

  private lazy val root = {
    val d = Files.createTempDirectory("graft_rtp_spec")
    spark.conf.set("spark.sql.catalog.grt", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.grt.root", d.toString)
    // the size gates (default 1M committed rows / 32 segments) would keep
    // these toy fixtures from advertising — the pins exercise the machinery
    spark.conf.set("spark.graft.runtime.prune.minRows", "0")
    spark.conf.set("spark.graft.runtime.prune.minSegments", "0")
    d
  }

  override def afterAll(): Unit = {
    spark.conf.unset("spark.graft.runtime.prune.minRows")
    spark.conf.unset("spark.graft.runtime.prune.minSegments")
    super.afterAll()
  }

  private def sql(q: String) = spark.sql(q)

  /** Rows actually read by the scan of `t` (post-execution AQE-final plan;
    * the traversal descends into adaptive + query-stage wrappers, which hide
    * their subtrees from plain collect). */
  private def scanRows(df: org.apache.spark.sql.DataFrame, t: String): Long = {
    df.collect()
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def all(p: SparkPlan): Seq[SparkPlan] = (p match {
      case a: AdaptiveSparkPlanExec => all(a.executedPlan)
      case q: QueryStageExec => all(q.plan)
      case other => other.children.flatMap(all)
    }) :+ p
    val scans = all(df.queryExecution.executedPlan).collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec
          if b.toString.contains(s"grt.ns.$t") =>
        b.metrics.get("numOutputRows").map(_.value).getOrElse(-1L)
    }
    scans.headOption.getOrElse(-1L)
  }

  private def mk(): Unit = {
    root
    sql("DROP TABLE IF EXISTS grt.ns.fact")
    sql("DROP TABLE IF EXISTS grt.ns.dim")
    sql("CREATE TABLE grt.ns.fact (k BIGINT, d BIGINT, v BIGINT) USING parquet")
    // 8 segments, each a distinct d value: zone bounds are min = max = d
    (0 until 8).foreach { d =>
      sql(s"INSERT INTO grt.ns.fact SELECT id, $d, id % 100 FROM range(${d * 1000}, ${d * 1000 + 1000})")
    }
    sql("CREATE TABLE grt.ns.dim (d BIGINT, name STRING) USING parquet")
    sql("""INSERT INTO grt.ns.dim VALUES (0,'a'),(1,'b'),(2,'x'),(3,'c'),
           (4,'d'),(5,'x'),(6,'e'),(7,'f')""")
  }

  test("a selective dim filter runtime-prunes fact SEGMENTS through zone bounds") {
    mk()
    val q = """SELECT CAST(SUM(f.v) AS BIGINT) AS s, COUNT(*) AS n
               FROM grt.ns.fact f JOIN grt.ns.dim m ON f.d = m.d
               WHERE m.name = 'x'"""
    val df = sql(q)
    val expected = df.collect().toSeq.map(_.toSeq)
    val read = scanRows(sql(q), "fact")
    assert(read === 2000L,
      s"runtime pruning must read only the 2 matching segments' 2000 rows, read $read\n" +
        sql(q).queryExecution.executedPlan)
    // the plan carries the dynamic-pruning subquery on the fact scan
    val planStr = { val d2 = sql(q); d2.collect(); d2.queryExecution.executedPlan.toString }
    assert(planStr.toLowerCase.contains("dynamicpruning"),
      s"expected a dynamic pruning filter on the fact scan:\n$planStr")
    // answers identical with the whole DPP machinery off
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "false")
    try {
      val off = sql(q)
      assert(off.collect().toSeq.map(_.toSeq) === expected)
      assert(scanRows(sql(q), "fact") === 8000L, "without DPP the scan reads everything")
    } finally
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    // the SIZE GATE: below minRows committed rows nothing advertises — the
    // subquery tax is not worth a toy-scale skip
    spark.conf.set("spark.graft.runtime.prune.minRows", "1000000000")
    try assert(scanRows(sql(q), "fact") === 8000L, "size-gated tables must not advertise")
    finally spark.conf.set("spark.graft.runtime.prune.minRows", "0")
  }

  test("an EMPTY build side prunes every segment; the zero-dir re-plan answers 0 rows") {
    mk()
    val q = """SELECT COUNT(*) AS n
               FROM grt.ns.fact f JOIN grt.ns.dim m ON f.d = m.d
               WHERE m.name = 'no_such_name'"""
    assert(sql(q).collect().head.getLong(0) === 0L)
    assert(scanRows(sql(q), "fact") <= 0L,
      "an empty IN-list must drop every fact segment")
  }

  test("runtime pruning composes with delete vectors: MOR live rows of matching segments only") {
    root
    sql("DROP TABLE IF EXISTS grt.ns.factm")
    sql("""CREATE TABLE grt.ns.factm (k BIGINT, d BIGINT, v BIGINT) USING parquet
           TBLPROPERTIES ('graft.delete-mode' = 'merge-on-read')""")
    (0 until 8).foreach { d =>
      sql(s"INSERT INTO grt.ns.factm SELECT id, $d, id % 100 FROM range(${d * 1000}, ${d * 1000 + 1000})")
    }
    sql("DELETE FROM grt.ns.factm WHERE k % 10 = 0") // a DV on every segment
    sql("DROP TABLE IF EXISTS grt.ns.dimm")
    sql("CREATE TABLE grt.ns.dimm (d BIGINT, name STRING) USING parquet")
    sql("""INSERT INTO grt.ns.dimm VALUES (0,'a'),(1,'b'),(2,'x'),(3,'c'),
           (4,'d'),(5,'x'),(6,'e'),(7,'f')""")
    val q = """SELECT COUNT(*) AS n
               FROM grt.ns.factm f JOIN grt.ns.dimm m ON f.d = m.d
               WHERE m.name = 'x'"""
    assert(sql(q).collect().head.getLong(0) === 1800L) // 2 segments x 900 live
    val read = scanRows(sql(q), "factm")
    assert(read === 1800L,
      s"DV runtime pruning must read only the 2 matching segments' live rows, read $read")
  }

  test("a STRING join key prunes through exactness-flagged byte-wise bounds (r19)") {
    root
    sql("DROP TABLE IF EXISTS grt.ns.facts")
    sql("DROP TABLE IF EXISTS grt.ns.dims")
    sql("CREATE TABLE grt.ns.facts (k BIGINT, region STRING, v BIGINT) USING parquet")
    // 8 segments, each a distinct region value: string zone bounds are
    // min = max = the value, exactness-flagged by the self-written harvest
    (0 until 8).foreach { r =>
      sql(s"""INSERT INTO grt.ns.facts
              SELECT id, 'region_$r', id % 100 FROM range(${r * 1000}, ${r * 1000 + 1000})""")
    }
    sql("CREATE TABLE grt.ns.dims (region STRING, name STRING) USING parquet")
    sql("""INSERT INTO grt.ns.dims VALUES ('region_0','a'),('region_1','b'),
           ('region_2','x'),('region_3','c'),('region_4','d'),('region_5','x'),
           ('region_6','e'),('region_7','f')""")
    val q = """SELECT CAST(SUM(f.v) AS BIGINT) AS s, COUNT(*) AS n
               FROM grt.ns.facts f JOIN grt.ns.dims m ON f.region = m.region
               WHERE m.name = 'x'"""
    val df = sql(q)
    val expected = df.collect().toSeq.map(_.toSeq)
    val read = scanRows(sql(q), "facts")
    assert(read === 2000L,
      s"string runtime pruning must read only the 2 matching segments, read $read\n" +
        sql(q).queryExecution.executedPlan)
    // answers identical with the machinery off
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "false")
    try assert(sql(q).collect().toSeq.map(_.toSeq) === expected)
    finally spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
  }

  test("a LARGE string build side collapses to one sound range probe (r19)") {
    root
    sql("DROP TABLE IF EXISTS grt.ns.factl")
    sql("DROP TABLE IF EXISTS grt.ns.diml")
    sql("CREATE TABLE grt.ns.factl (k BIGINT, region STRING, v BIGINT) USING parquet")
    // 8 segments with zero-padded DISJOINT string ranges r0000.. r7999
    (0 until 8).foreach { w =>
      sql(s"""INSERT INTO grt.ns.factl
              SELECT id, concat('r', lpad(CAST(id AS STRING), 4, '0')), id % 100
              FROM range(${w * 1000}, ${w * 1000 + 1000})""")
    }
    sql("CREATE TABLE grt.ns.diml (region STRING, pad BIGINT) USING parquet")
    // the SELECTIVE dim filter (pad = 1) still keeps > 256 distinct build
    // values, all within segments 2 and 3's ranges: the exact-probe budget
    // overflows, the collapse probes [min,max] per segment instead — still
    // pruning the other six
    sql("""INSERT INTO grt.ns.diml
           SELECT concat('r', lpad(CAST(id AS STRING), 4, '0')),
                  CASE WHEN id BETWEEN 2500 AND 3499 THEN 1 ELSE 0 END
           FROM range(0, 8000)""")
    val q = """SELECT COUNT(*) AS n FROM grt.ns.factl f
               JOIN grt.ns.diml m ON f.region = m.region WHERE m.pad = 1"""
    assert(sql(q).collect().head.getLong(0) === 1000L)
    val read = scanRows(sql(q), "factl")
    assert(read === 2000L,
      s"the collapsed string range must keep only segments 2-3, read $read")
  }

  test("an unprunable runtime predicate keeps every segment (no false pruning)") {
    mk()
    // every segment contains v values across the full range — zone bounds on
    // v cannot exclude anything; the join must still answer correctly
    val q = """SELECT COUNT(*) AS n
               FROM grt.ns.fact f JOIN (SELECT DISTINCT v FROM grt.ns.fact WHERE v < 3) s
               ON f.v = s.v"""
    val n = sql(q).collect().head.getLong(0)
    assert(n === 8 * 10 * 3, s"got $n") // 3 v-values x 10 hits per 1000-row wave x 8 waves
  }
}
