package graft.catalog

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}

/** CBO CONSUMPTION pin: a 3-table join's ORDER (not just broadcast choice)
  * provably follows the catalog's committed statistics (numRows + NDV
  * reported through SupportsReportStatistics / column sketches).
  *
  * Requires `spark.sql.cbo.enabled` + `spark.sql.cbo.joinReorder.enabled`
  * (both default FALSE in Spark 4.1): CostBasedJoinReorder only fires when
  * every base relation carries a rowCount, which graft tables get from
  * commit-time zone stats — so the reorder observed here is fed exclusively
  * by the catalog's own reporting (parquet's fallback reports bytes, not
  * rows, and the DP reorder would stay off). */
class CboJoinOrderSpec extends SparkSpec {

  private lazy val root = {
    val d = Files.createTempDirectory("graft_cbo_spec")
    spark.conf.set("spark.sql.catalog.gcbo", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcbo.root", d.toString)
    d
  }

  private def sql(q: String) = spark.sql(q)

  test("a skewed range predicate flips the join order only when KLL sketches say so (r18)") {
    root
    // dimc.w is SKEWED: 1990 of 2000 rows hold w < 10, ten outliers spread to
    // 10000. The predicate `w >= 10` keeps 0.5% of dimc.
    //   - min/max only (uniform interpolation over [0, 10000]): estimated
    //     selectivity ~99.9% -> filtered dimc ~1998 rows -> joining the
    //     50-key dimd first is cheaper -> innermost join = dimd;
    //   - with the KLL histogram: the mass above 10 is ~1 bin of 64 ->
    //     filtered dimc ~tens of rows -> joining dimc first is cheaper ->
    //     innermost join = dimc.
    // Same data, same query — only the sketch flips the order.
    def build(withKll: Boolean): Unit = {
      Seq("fact2", "dimc", "dimd").foreach(t => sql(s"DROP TABLE IF EXISTS gcbo.ns.$t"))
      val kll = if (withKll) ", 'graft.stats.kll' = '*'" else ""
      sql("""CREATE TABLE gcbo.ns.fact2 (ka BIGINT, kb BIGINT, v BIGINT) USING parquet
             TBLPROPERTIES ('graft.stats.ndv' = '*')""")
      sql("INSERT INTO gcbo.ns.fact2 SELECT id % 2000, id % 200, id FROM range(0, 10000)")
      sql(s"""CREATE TABLE gcbo.ns.dimc (a BIGINT, w BIGINT) USING parquet
             TBLPROPERTIES ('graft.stats.ndv' = '*'$kll)""")
      sql("""INSERT INTO gcbo.ns.dimc
             SELECT id, CASE WHEN id < 1990 THEN id % 10 ELSE (id - 1989) * 1000 END
             FROM range(0, 2000)""")
      sql("""CREATE TABLE gcbo.ns.dimd (b BIGINT, u BIGINT) USING parquet
             TBLPROPERTIES ('graft.stats.ndv' = '*')""")
      // 50 of fact's 200 kb values, covering the ka >= 1990 rows' kb range
      // (190..199) so the 3-way join is non-empty
      sql("INSERT INTO gcbo.ns.dimd SELECT id + 150, id FROM range(0, 50)")
    }
    val q = """SELECT SUM(f.v) AS s
               FROM gcbo.ns.fact2 f
               JOIN gcbo.ns.dimc dc ON f.ka = dc.a
               JOIN gcbo.ns.dimd dd ON f.kb = dd.b
               WHERE dc.w >= 10"""
    def innermost(plan: LogicalPlan): Seq[String] = {
      val inner = plan.collect {
        case j: Join if !j.children.exists(_.exists(_.isInstanceOf[Join])) => j
      }
      assert(inner.nonEmpty, s"no join in:\n$plan")
      inner.head.collectLeaves().map(_.toString)
    }
    val expect = (0L until 10000L)
      .filter(i => i % 200 >= 150)                 // dimd keys
      .filter(i => i % 2000 >= 1990)               // dimc rows with w >= 10
      .sum
    val (cboOn, joinReorder) =
      (spark.conf.get("spark.sql.cbo.enabled"),
        spark.conf.get("spark.sql.cbo.joinReorder.enabled"))
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      build(withKll = false)
      val without = innermost(sql(q).queryExecution.optimizedPlan)
      assert(without.exists(_.contains("dimd")) && !without.exists(_.contains("dimc")),
        s"without sketches the uniform estimate keeps dimc big -> dimd joins first, got $without")
      assert(sql(q).collect().head.getLong(0) === expect)
      build(withKll = true)
      val withH = innermost(sql(q).queryExecution.optimizedPlan)
      assert(withH.exists(_.contains("dimc")) && !withH.exists(_.contains("dimd")),
        s"the KLL histogram must expose the skew -> filtered dimc joins first, got $withH")
      assert(sql(q).collect().head.getLong(0) === expect)
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", cboOn)
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", joinReorder)
    }
  }

  test("a skewed JOIN KEY flips the join order only when both sides carry KLL histograms (r20)") {
    root
    // fact.ka is SKEWED: 9900 rows hold the ten hot keys 0..9, the other 100
    // rows one tail key each (10..109, ndv 110). dimc holds EXACTLY the ten
    // hot keys; dimd covers 100 of kb's 200 uniform values.
    //   - NDV-only equi-join pricing: |f⋈dimc| = 10000·10/max(110,10) ≈ 909
    //     (assumes uniform keys — 10× under the true 9900), vs |f⋈dimd| =
    //     5000 → dimc joins innermost;
    //   - with KLL histograms on BOTH sides of the ka join, Spark's
    //     histogram join estimation weighs the overlapping bins — the hot
    //     bins carry ~9900 rows → dimd (5000) joins innermost instead.
    // Same data, same query — only the committed sketches flip the order.
    def build(withKll: Boolean): Unit = {
      Seq("fact3", "dimc3", "dimd3").foreach(t => sql(s"DROP TABLE IF EXISTS gcbo.ns.$t"))
      val kll = if (withKll) ", 'graft.stats.kll' = '*'" else ""
      sql(s"""CREATE TABLE gcbo.ns.fact3 (ka BIGINT, kb BIGINT, v BIGINT) USING parquet
             TBLPROPERTIES ('graft.stats.ndv' = '*'$kll)""")
      sql("""INSERT INTO gcbo.ns.fact3
             SELECT CASE WHEN id < 9900 THEN id % 10 ELSE 10 + (id - 9900) END,
                    id % 200, id
             FROM range(0, 10000)""")
      sql(s"""CREATE TABLE gcbo.ns.dimc3 (a BIGINT, w BIGINT) USING parquet
             TBLPROPERTIES ('graft.stats.ndv' = '*'$kll)""")
      sql("INSERT INTO gcbo.ns.dimc3 SELECT id, id * 7 FROM range(0, 10)")
      sql(s"""CREATE TABLE gcbo.ns.dimd3 (b BIGINT, u BIGINT) USING parquet
             TBLPROPERTIES ('graft.stats.ndv' = '*'$kll)""")
      sql("INSERT INTO gcbo.ns.dimd3 SELECT id, id FROM range(0, 100)")
    }
    val q = """SELECT SUM(f.v) AS s
               FROM gcbo.ns.fact3 f
               JOIN gcbo.ns.dimc3 dc ON f.ka = dc.a
               JOIN gcbo.ns.dimd3 dd ON f.kb = dd.b"""
    def innermost(plan: LogicalPlan): Seq[String] = {
      val inner = plan.collect {
        case j: Join if !j.children.exists(_.exists(_.isInstanceOf[Join])) => j
      }
      assert(inner.nonEmpty, s"no join in:\n$plan")
      inner.head.collectLeaves().map(_.toString)
    }
    val expect = (0L until 9900L).filter(_ % 200 < 100).sum
    val (cboOn, joinReorder, hist) =
      (spark.conf.get("spark.sql.cbo.enabled"),
        spark.conf.get("spark.sql.cbo.joinReorder.enabled"),
        spark.conf.get("spark.sql.statistics.histogram.enabled", "false"))
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      build(withKll = false)
      val without = innermost(sql(q).queryExecution.optimizedPlan)
      assert(without.exists(_.contains("dimc3")) && !without.exists(_.contains("dimd3")),
        s"NDV-only pricing must put the (under-estimated) dimc3 join innermost, got $without")
      assert(sql(q).collect().head.getLong(0) === expect)
      build(withKll = true)
      val withH = innermost(sql(q).queryExecution.optimizedPlan)
      assert(withH.exists(_.contains("dimd3")) && !withH.exists(_.contains("dimc3")),
        s"KLL histograms must expose the hot-key blowup -> dimd3 joins first, got $withH")
      assert(sql(q).collect().head.getLong(0) === expect)
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", cboOn)
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", joinReorder)
      spark.conf.set("spark.sql.statistics.histogram.enabled", hist)
    }
  }

  test("a selective STRING predicate flips the join order only with the stats present (r19)") {
    root
    def innermost(plan: LogicalPlan): Seq[String] = {
      val inner = plan.collect {
        case j: Join if !j.children.exists(_.exists(_.isInstanceOf[Join])) => j
      }
      assert(inner.nonEmpty, s"no join in:\n$plan")
      inner.head.collectLeaves().map(_.toString)
    }
    def build(withNdv: Boolean): Unit = {
      Seq("facts", "dims", "dimt").foreach(t => sql(s"DROP TABLE IF EXISTS gcbo.ns.$t"))
      val ndv = if (withNdv) " TBLPROPERTIES ('graft.stats.ndv' = '*')" else ""
      sql(s"""CREATE TABLE gcbo.ns.facts (ka BIGINT, kb BIGINT, v BIGINT)
              USING parquet$ndv""")
      sql("INSERT INTO gcbo.ns.facts SELECT id % 2000, id % 200, id FROM range(0, 10000)")
      // dims.name: 2000 distinct zero-padded strings
      sql(s"CREATE TABLE gcbo.ns.dims (a BIGINT, name STRING) USING parquet$ndv")
      sql("""INSERT INTO gcbo.ns.dims
             SELECT id, concat('n', lpad(CAST(id AS STRING), 4, '0')) FROM range(0, 2000)""")
      sql(s"CREATE TABLE gcbo.ns.dimt (b BIGINT, u BIGINT) USING parquet$ndv")
      sql("INSERT INTO gcbo.ns.dimt SELECT id + 150, id FROM range(0, 50)")
    }
    // EQUALITY: priced at 1/ndv THROUGH the reported distinctCount — one
    // matching dims row => dims joins innermost; without NDV sketches the
    // predicate is unpriceable (strings carry no numeric range) and the
    // 50-row dimt stays the cheaper first join
    val qEq = """SELECT SUM(f.v) AS s
                 FROM gcbo.ns.facts f
                 JOIN gcbo.ns.dims ds ON f.ka = ds.a
                 JOIN gcbo.ns.dimt dt ON f.kb = dt.b
                 WHERE ds.name = 'n1990'"""
    val expectEq = (0L until 10000L)
      .filter(i => i % 200 >= 150).filter(i => i % 2000 == 1990).sum
    val (cboOn, joinReorder) =
      (spark.conf.get("spark.sql.cbo.enabled"),
        spark.conf.get("spark.sql.cbo.joinReorder.enabled"))
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      build(withNdv = false)
      val without = innermost(sql(qEq).queryExecution.optimizedPlan)
      assert(without.exists(_.contains("dimt")) && !without.exists(_.contains("dims")),
        s"without NDV the string equality is unpriceable -> dimt first, got $without")
      assert(sql(qEq).collect().head.getLong(0) === expectEq)
      build(withNdv = true)
      val withNdv = innermost(sql(qEq).queryExecution.optimizedPlan)
      assert(withNdv.exists(_.contains("dims")) && !withNdv.exists(_.contains("dimt")),
        s"with NDV the equality prices at 1/2000 -> filtered dims first, got $withNdv")
      assert(sql(qEq).collect().head.getLong(0) === expectEq)
      // RANGE: strings have no numeric range for FilterEstimation — the
      // SCAN prices it instead, by exact-bounds byte-prefix overlap
      // (stringRangeRefined). 'n1990' <= name keeps 10 of 2000 names.
      val qRange = """SELECT SUM(f.v) AS s
                      FROM gcbo.ns.facts f
                      JOIN gcbo.ns.dims ds ON f.ka = ds.a
                      JOIN gcbo.ns.dimt dt ON f.kb = dt.b
                      WHERE ds.name >= 'n1990'"""
      val expectRange = (0L until 10000L)
        .filter(i => i % 200 >= 150).filter(i => i % 2000 >= 1990).sum
      val withExact = innermost(sql(qRange).queryExecution.optimizedPlan)
      assert(withExact.exists(_.contains("dims")) && !withExact.exists(_.contains("dimt")),
        s"exact string bounds must price the range tiny -> dims first, got $withExact")
      assert(sql(qRange).collect().head.getLong(0) === expectRange)
      // the refinement is gated on EXACTNESS: the same rows imported via
      // add_files carry foreign (non-exact) bounds — no refinement, no flip
      sql("DROP TABLE IF EXISTS gcbo.ns.dimsf")
      sql("""CREATE TABLE gcbo.ns.dimsf (a BIGINT, name STRING) USING parquet
             TBLPROPERTIES ('graft.stats.ndv' = '*')""")
      val raw = java.nio.file.Files.createTempDirectory(root, "cbo_raw")
      sql("SELECT a, name FROM gcbo.ns.dims").coalesce(2)
        .write.mode("overwrite").parquet(raw.toString)
      sql(s"CALL gcbo.system.add_files('ns.dimsf', '$raw')")
      val qForeign = qRange.replace("gcbo.ns.dims ", "gcbo.ns.dimsf ")
      val foreign = innermost(sql(qForeign).queryExecution.optimizedPlan)
      assert(foreign.exists(_.contains("dimt")) && !foreign.exists(_.contains("dimsf")),
        s"foreign bounds must not price the range -> dimt stays first, got $foreign")
      assert(sql(qForeign).collect().head.getLong(0) === expectRange)
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", cboOn)
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", joinReorder)
    }
  }

  test("3-table join order follows graft-reported numRows/NDV under CBO") {
    root
    sql("DROP TABLE IF EXISTS gcbo.ns.fact")
    sql("DROP TABLE IF EXISTS gcbo.ns.dima")
    sql("DROP TABLE IF EXISTS gcbo.ns.dimb")
    // fact: 10k rows; ka has 2000 distinct values (all matched by dima),
    // kb has 100 distinct values of which dimb holds only 10 — so
    // fact⋈dimb estimates ~1k rows (10k·10/max(100,10)) while fact⋈dima
    // estimates ~10k (10k·2000/max(2000,2000)): the cheap plan joins dimb
    // FIRST even though the SQL text joins dima first
    sql("""CREATE TABLE gcbo.ns.fact (ka BIGINT, kb BIGINT, v BIGINT) USING parquet
           TBLPROPERTIES ('graft.stats.ndv' = '*')""")
    sql("""INSERT INTO gcbo.ns.fact
           SELECT id % 2000, id % 100, id FROM range(0, 10000)""")
    sql("""CREATE TABLE gcbo.ns.dima (a BIGINT, aname STRING) USING parquet
           TBLPROPERTIES ('graft.stats.ndv' = '*')""")
    sql("INSERT INTO gcbo.ns.dima SELECT id, concat('a', id) FROM range(0, 2000)")
    sql("""CREATE TABLE gcbo.ns.dimb (b BIGINT, bname STRING) USING parquet
           TBLPROPERTIES ('graft.stats.ndv' = '*')""")
    sql("INSERT INTO gcbo.ns.dimb SELECT id, concat('b', id) FROM range(0, 10)")

    def innermostJoinLeaves(plan: LogicalPlan): Seq[String] = {
      val inner = plan.collect {
        case j: Join if !j.children.exists(_.exists(_.isInstanceOf[Join])) => j
      }
      assert(inner.nonEmpty, s"no join in:\n$plan")
      inner.head.collectLeaves().map(_.toString)
    }

    val q = """SELECT SUM(f.v) AS s
               FROM gcbo.ns.fact f
               JOIN gcbo.ns.dima da ON f.ka = da.a
               JOIN gcbo.ns.dimb db ON f.kb = db.b"""

    val (cboOn, joinReorder) =
      (spark.conf.get("spark.sql.cbo.enabled"),
        spark.conf.get("spark.sql.cbo.joinReorder.enabled"))
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      val optimized = sql(q).queryExecution.optimizedPlan
      val leaves = innermostJoinLeaves(optimized)
      assert(leaves.exists(_.contains("dimb")),
        s"CBO must reorder the selective dimb join innermost; innermost joins " +
          s"$leaves\nplan:\n$optimized")
      assert(!leaves.exists(_.contains("dima")),
        s"dima must join AFTER the selective dimb join, got innermost $leaves")
      // and the reordered plan still computes the right answer
      assert(sql(q).collect().head.getLong(0) ===
        (0L until 10000L).filter(_ % 100 < 10).sum)
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", cboOn)
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", joinReorder)
    }
  }
}
