package graft.catalog

import java.nio.file.Files

import graft.SparkSpec

/** Pins for GENERATED COLUMNS (GraftGenerate.scala): NULL fills, explicit
  * matching values pass, explicit wrong values fail the job atomically,
  * derived PARTITIONING routes on filled values, streaming writes fill,
  * CREATE-time validation, and the add_files refusal. */
class GeneratedColumnsSpec extends SparkSpec {

  private lazy val root = {
    val d = Files.createTempDirectory("graft_gen_spec")
    spark.conf.set("spark.sql.catalog.ggc", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.ggc.root", d.toString)
    d
  }

  private def sql(q: String) = spark.sql(q)
  private def count(q: String): Long = sql(q).collect().head.getLong(0)

  test("NULL fills, explicit matching passes, explicit wrong fails with nothing published") {
    root
    sql("DROP TABLE IF EXISTS ggc.ns.t1")
    sql("""CREATE TABLE ggc.ns.t1 (k BIGINT, amt BIGINT, bucket BIGINT) USING parquet
      TBLPROPERTIES ('graft.generate.bucket' = 'k % 10')""")
    sql("INSERT INTO ggc.ns.t1 VALUES (17, 100, CAST(NULL AS BIGINT))") // fills -> 7
    sql("INSERT INTO ggc.ns.t1 VALUES (23, 200, 3)")                    // explicit, matches
    assert(sql("SELECT bucket FROM ggc.ns.t1 WHERE k = 17").head().getLong(0) === 7L)
    val before = count("SELECT count(*) c FROM ggc.ns.t1")
    val ex = intercept[Exception] {
      sql("INSERT INTO ggc.ns.t1 VALUES (31, 300, 9)") // wrong: 31 % 10 = 1
    }
    assert(ex.getMessage.contains("generated column") ||
      ex.getCause != null && ex.getCause.getMessage.contains("generated column"))
    assert(count("SELECT count(*) c FROM ggc.ns.t1") === before, "failed job must publish nothing")
  }

  test("derived partitioning: generation fills BEFORE the partition router") {
    sql("DROP TABLE IF EXISTS ggc.ns.t2")
    sql("""CREATE TABLE ggc.ns.t2 (ts TIMESTAMP, v BIGINT, day DATE) USING parquet
      PARTITIONED BY (day)
      TBLPROPERTIES ('graft.generate.day' = 'CAST(ts AS DATE)')""")
    sql("""INSERT INTO ggc.ns.t2 VALUES
      (TIMESTAMP'2024-03-01 10:00:00', 1, CAST(NULL AS DATE)),
      (TIMESTAMP'2024-03-01 23:59:59', 2, CAST(NULL AS DATE)),
      (TIMESTAMP'2024-03-02 00:00:01', 3, CAST(NULL AS DATE))""")
    assert(count("SELECT count(*) c FROM ggc.ns.t2 WHERE day = DATE'2024-03-01'") === 2)
    // partition-pure segments: one per derived day
    val meta = GraftMeta.read(root.resolve("ns").resolve("t2"))
    val suffixes = meta.snapshots(meta.current).flatMap(GraftPartitions.suffixOf)
    assert(suffixes.toSet.size === 2, s"expected 2 day partitions: $suffixes")
  }

  test("streaming appends fill generated columns") {
    import spark.implicits._
    sql("DROP TABLE IF EXISTS ggc.ns.t3")
    sql("""CREATE TABLE ggc.ns.t3 (k BIGINT, twice BIGINT) USING parquet
      TBLPROPERTIES ('graft.generate.twice' = 'k * 2')""")
    val dir = Files.createTempDirectory("ggc_stream").toString
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long](spark)
    mem.addData(5L, 6L)
    val q = mem.toDF().selectExpr("value AS k", "CAST(NULL AS BIGINT) AS twice")
      .writeStream.option("checkpointLocation", dir)
      .toTable("ggc.ns.t3")
    q.processAllAvailable(); q.stop()
    assert(sql("SELECT sum(twice) s FROM ggc.ns.t3").head().getLong(0) === 22L)
  }

  test("CREATE-time validation: unknown column, bad type, generation chains refused") {
    sql("DROP TABLE IF EXISTS ggc.ns.bad")
    val e1 = intercept[Exception] {
      sql("""CREATE TABLE ggc.ns.bad (k BIGINT) USING parquet
        TBLPROPERTIES ('graft.generate.nope' = 'k + 1')""") }
    assert(e1.getMessage.contains("no such column"))
    val e2 = intercept[Exception] {
      sql("""CREATE TABLE ggc.ns.bad (k BIGINT, s STRING) USING parquet
        TBLPROPERTIES ('graft.generate.s' = 'does_not_exist + 1')""") }
    assert(e2.getMessage.contains("does not analyze"))
    val e3 = intercept[Exception] {
      sql("""CREATE TABLE ggc.ns.bad (k BIGINT, a BIGINT, b BIGINT) USING parquet
        TBLPROPERTIES ('graft.generate.a' = 'k + 1', 'graft.generate.b' = 'a + 1')""") }
    assert(e3.getMessage.contains("chains are not supported"))
  }

  test("implicit tz-dependent coercion (TIMESTAMP expr filling a DATE column) fills at write") {
    // the coercion Cast must be built WITH the session timezone: without it
    // the expression stays unresolved, CREATE passes, and every write then
    // dies inside UnsafeProjection creation — the exact validated-at-CREATE
    // contract violation ADVICE r11 flagged
    sql("DROP TABLE IF EXISTS ggc.ns.t6")
    sql("""CREATE TABLE ggc.ns.t6 (ts TIMESTAMP, day DATE) USING parquet
      TBLPROPERTIES ('graft.generate.day' = 'ts')""")
    sql("INSERT INTO ggc.ns.t6 VALUES (TIMESTAMP'2024-03-01 10:00:00', CAST(NULL AS DATE))")
    assert(sql("SELECT day FROM ggc.ns.t6").head().getDate(0).toString === "2024-03-01")
  }

  test("add_files refuses generated-column tables") {
    import spark.implicits._
    sql("DROP TABLE IF EXISTS ggc.ns.t5")
    sql("""CREATE TABLE ggc.ns.t5 (k BIGINT, twice BIGINT) USING parquet
      TBLPROPERTIES ('graft.generate.twice' = 'k * 2')""")
    val raw = root.resolve("raw_gen")
    Seq((1L, 99L)).toDF("k", "twice").write.mode("overwrite").parquet(raw.toString)
    val ex = intercept[Exception] {
      sql(s"CALL ggc.system.add_files('ns.t5', '$raw')") }
    assert(ex.getMessage.contains("GENERATED columns"))
  }
}
