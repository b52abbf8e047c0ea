package graft.catalog

import graft.SparkSpec

/** Pins for ATOMIC CTAS / RTAS (GraftStaging, StagingTableCatalog): atomic
  * CREATE ... AS SELECT, CREATE OR REPLACE swapping under readers, failure
  * atomicity (the old table survives a mid-write abort; a failed CTAS leaves
  * no table), history-reset contract, write-path parity (constraints fire on
  * staged writes), and stale-residue reclaim. */
class StagedTableSpec extends SparkSpec {

  private lazy val root = {
    val d = java.nio.file.Files.createTempDirectory("graft_stg")
    spark.conf.set("spark.sql.catalog.gstg", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gstg.root", d.toString)
    d
  }

  private def sql(q: String) = spark.sql(q)

  test("atomic CTAS: creates, loads, and round-trips data") {
    root
    sql("DROP TABLE IF EXISTS gstg.ns.c1")
    sql("CREATE TABLE gstg.ns.c1 USING parquet AS SELECT id AS k, id * 2 AS v FROM range(100)")
    assert(sql("SELECT COUNT(*), SUM(v) FROM gstg.ns.c1").collect().head.toSeq === Seq(100L, 9900L))
  }

  test("CREATE OR REPLACE TABLE AS SELECT swaps schema and data atomically") {
    root
    sql("DROP TABLE IF EXISTS gstg.ns.r1")
    sql("CREATE TABLE gstg.ns.r1 USING parquet AS SELECT id AS k FROM range(10)")
    sql("INSERT INTO gstg.ns.r1 SELECT id + 100 FROM range(5)") // snapshot 2
    sql("""CREATE OR REPLACE TABLE gstg.ns.r1 USING parquet AS
           SELECT CAST(id AS STRING) AS name, id * 10 AS score FROM range(7)""")
    val rows = sql("SELECT name, score FROM gstg.ns.r1 ORDER BY score").collect()
    assert(rows.length === 7 && rows.head.getString(0) === "0",
      "the replacement's schema and rows serve immediately")
    // history is discarded by contract: pre-replace snapshots are gone
    intercept[Exception] { sql("SELECT * FROM gstg.ns.r1 VERSION AS OF 1").collect() }
  }

  test("failure atomicity: a mid-write RTAS failure leaves the OLD table intact") {
    root
    sql("DROP TABLE IF EXISTS gstg.ns.r2")
    sql("CREATE TABLE gstg.ns.r2 USING parquet AS SELECT id AS k, id AS v FROM range(50)")
    intercept[Exception] {
      sql("""CREATE OR REPLACE TABLE gstg.ns.r2 USING parquet AS
             SELECT id AS k, CAST(raise_error('boom') AS BIGINT) AS v FROM range(50)""")
    }
    assert(sql("SELECT COUNT(*) FROM gstg.ns.r2").collect().head.getLong(0) === 50L,
      "the old definition must survive an aborted replacement untouched")
    assert(sql("SELECT SUM(v) FROM gstg.ns.r2").collect().head.getLong(0) === 1225L)
  }

  test("failure atomicity: a failed plain CTAS leaves NO table behind") {
    root
    sql("DROP TABLE IF EXISTS gstg.ns.c2")
    intercept[Exception] {
      sql("""CREATE TABLE gstg.ns.c2 USING parquet AS
             SELECT CAST(raise_error('boom') AS BIGINT) AS v FROM range(10)""")
    }
    intercept[Exception] { sql("SELECT * FROM gstg.ns.c2").collect() }
    // and the name is immediately reusable — no residue squats on it
    sql("CREATE TABLE gstg.ns.c2 USING parquet AS SELECT id AS v FROM range(3)")
    assert(sql("SELECT COUNT(*) FROM gstg.ns.c2").collect().head.getLong(0) === 3L)
  }

  test("staged writes run the normal gate: CHECK constraints fail the CTAS") {
    root
    sql("DROP TABLE IF EXISTS gstg.ns.c3")
    // v2 CTAS carries properties through to the staged createTable — the
    // check is validated at stage time and enforced by the staged write
    intercept[Exception] {
      sql("""CREATE TABLE gstg.ns.c3 USING parquet
             TBLPROPERTIES ('graft.check.pos' = 'v > 10')
             AS SELECT id AS v FROM range(5)""")
    }
    intercept[Exception] { sql("SELECT * FROM gstg.ns.c3").collect() }
  }

  test("REPLACE of a partitioned table redefines layout; SPJ survives") {
    root
    sql("DROP TABLE IF EXISTS gstg.ns.p1")
    sql("CREATE TABLE gstg.ns.p1 USING parquet AS SELECT id AS k FROM range(10)")
    sql("""CREATE OR REPLACE TABLE gstg.ns.p1 (k BIGINT, geo STRING)
           USING parquet PARTITIONED BY (geo)""")
    sql("INSERT INTO gstg.ns.p1 SELECT id, CASE WHEN id % 2 = 0 THEN 'us' ELSE 'eu' END FROM range(40)")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    // AVG needs rows, so this pins the grouped SCAN of the replaced layout
    // (a COUNT would serve from the r16 zero-IO stats rollup instead)
    val df = sql("SELECT geo, AVG(k) AS a FROM gstg.ns.p1 GROUP BY geo")
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!p.contains("Exchange hashpartitioning"),
      s"the replaced table's partition-pure layout must group:\n$p")
  }

  test("stale staged residue is reclaimed; fresh staging is not") {
    root
    val dir = root.resolve("ns").resolve("stale1")
    java.nio.file.Files.createDirectories(dir)
    GraftMeta.write(dir, GraftMeta(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.LongType))),
      current = 0L, snapshots = Map(0L -> Nil),
      props = Map(GraftStaging.StagedProp ->
        (System.currentTimeMillis() - 2 * GraftStaging.GraceMs).toString)))
    // invisible...
    intercept[Exception] { sql("SELECT * FROM gstg.ns.stale1").collect() }
    // ...and reclaimable: CREATE takes the name over the stale residue
    sql("CREATE TABLE gstg.ns.stale1 USING parquet AS SELECT id AS v FROM range(4)")
    assert(sql("SELECT COUNT(*) FROM gstg.ns.stale1").collect().head.getLong(0) === 4L)
    // a FRESH staged meta is protected — CREATE collides
    val dir2 = root.resolve("ns").resolve("fresh1")
    java.nio.file.Files.createDirectories(dir2)
    GraftMeta.write(dir2, GraftMeta(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.LongType))),
      current = 0L, snapshots = Map(0L -> Nil),
      props = Map(GraftStaging.StagedProp -> System.currentTimeMillis().toString)))
    intercept[Exception] {
      sql("CREATE TABLE gstg.ns.fresh1 USING parquet AS SELECT id AS v FROM range(4)")
    }
    // invisibility covers EVERY read path, time travel included
    intercept[Exception] { sql("SELECT * FROM gstg.ns.fresh1 VERSION AS OF 0").collect() }
  }
}
