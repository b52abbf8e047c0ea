package graft.catalog

import graft.SparkSpec

/** Pins for the documentation-metadata DDL: COMMENT ON TABLE (set/clear),
  * ALTER COLUMN ... COMMENT on top-level and NESTED members, persistence
  * across reloads, and the neighboring surfaces that already worked
  * (TRUNCATE, SHOW CREATE TABLE) staying green. */
class CommentDdlSpec extends SparkSpec {

  private lazy val root = {
    val d = java.nio.file.Files.createTempDirectory("graft_cmt")
    spark.conf.set("spark.sql.catalog.gcmt", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcmt.root", d.toString)
    d
  }
  private def sql(q: String) = spark.sql(q)

  test("COMMENT ON TABLE sets, survives reload, and clears") {
    root
    sql("CREATE TABLE gcmt.ns.t (k BIGINT, info STRUCT<v: BIGINT>) USING parquet")
    sql("COMMENT ON TABLE gcmt.ns.t IS 'corpus staging table'")
    // SHOW TBLPROPERTIES hides reserved keys; DESCRIBE EXTENDED surfaces it
    def tableComment: Option[String] =
      sql("DESCRIBE TABLE EXTENDED gcmt.ns.t").collect()
        .find(_.getString(0) == "Comment").map(_.getString(1))
    assert(tableComment === Some("corpus staging table"))
    sql("COMMENT ON TABLE gcmt.ns.t IS NULL")
    assert(tableComment === None, "IS NULL must clear the comment")
  }

  test("ALTER COLUMN COMMENT: top-level and nested members, metadata-only") {
    root
    sql("INSERT INTO gcmt.ns.t SELECT id, named_struct('v', id * 2) FROM range(5)")
    sql("ALTER TABLE gcmt.ns.t ALTER COLUMN k COMMENT 'the key'")
    sql("ALTER TABLE gcmt.ns.t ALTER COLUMN info.v COMMENT 'nested value'")
    val sch = sql("SELECT * FROM gcmt.ns.t").schema
    assert(sch("k").getComment() === Some("the key"))
    assert(sch("info").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]("v")
      .getComment() === Some("nested value"))
    // data still reads — the change was metadata-only
    assert(sql("SELECT SUM(info.v) FROM gcmt.ns.t").collect().head.getLong(0) === 20L)
    intercept[Exception] { sql("ALTER TABLE gcmt.ns.t ALTER COLUMN nope COMMENT 'x'") }
  }

  test("TRUNCATE TABLE and SHOW CREATE TABLE work on graft tables") {
    root
    sql("CREATE TABLE gcmt.ns.t2 (k BIGINT) USING parquet")
    sql("INSERT INTO gcmt.ns.t2 SELECT id FROM range(10)")
    sql("TRUNCATE TABLE gcmt.ns.t2")
    assert(sql("SELECT COUNT(*) FROM gcmt.ns.t2").collect().head.getLong(0) === 0L)
    val ddl = sql("SHOW CREATE TABLE gcmt.ns.t2").collect().head.getString(0)
    assert(ddl.contains("CREATE TABLE") && ddl.contains("k BIGINT"))
  }
}
