package graft.catalog

import graft.SparkSpec

/** Pins for `MERGE WITH SCHEMA EVOLUTION` (TableCapability
  * .AUTOMATIC_SCHEMA_EVOLUTION): Spark's ResolveMergeIntoSchemaEvolution
  * evolves the target through the catalog's OWN alterTable arms before the
  * row-level write plans, so every DDL guard (nullable null-fill, widen-only,
  * dropped-name retirement, recursive field-id assignment) applies to
  * merge-driven evolution identically — including nested struct members. */
class MergeSchemaEvolutionSpec extends SparkSpec {

  private lazy val root = {
    val d = java.nio.file.Files.createTempDirectory("graft_mevo")
    spark.conf.set("spark.sql.catalog.gmev", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gmev.root", d.toString)
    d
  }

  private def sql(q: String) = spark.sql(q)

  test("new source column evolves the target; pre-merge rows null-fill it") {
    root
    sql("DROP TABLE IF EXISTS gmev.ns.t1")
    sql("CREATE TABLE gmev.ns.t1 (k BIGINT, v BIGINT) USING parquet")
    sql("INSERT INTO gmev.ns.t1 VALUES (1, 10), (2, 20)")
    sql("SELECT * FROM VALUES (2L, 25L, 'x2'), (3L, 30L, 'x3') AS s(k, v, tag)")
      .createOrReplaceTempView("mevo_src1")
    sql("""MERGE WITH SCHEMA EVOLUTION INTO gmev.ns.t1 t USING mevo_src1 s ON t.k = s.k
           WHEN MATCHED THEN UPDATE SET *
           WHEN NOT MATCHED THEN INSERT *""")
    val rows = sql("SELECT k, v, tag FROM gmev.ns.t1 ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) "-" else r.getString(2)))
    assert(rows.toSeq === Seq((1L, 10L, "-"), (2L, 25L, "x2"), (3L, 30L, "x3")))
    // the evolved column went through AddColumn: it carries a fresh field id
    val meta = GraftMeta.read(root.resolve("ns").resolve("t1"))
    assert(GraftFieldIds.fieldAt(meta.schema, Seq("tag")).exists(GraftFieldIds.hasId))
  }

  test("NESTED source member evolves the target struct through the nested ADD arm") {
    root
    sql("DROP TABLE IF EXISTS gmev.ns.t2")
    sql("CREATE TABLE gmev.ns.t2 (k BIGINT, info STRUCT<a: BIGINT>) USING parquet")
    sql("INSERT INTO gmev.ns.t2 VALUES (1, named_struct('a', 10L))")
    sql("""SELECT * FROM VALUES (2L, named_struct('a', 20L, 'b', 99L))
           AS s(k, info)""").createOrReplaceTempView("mevo_src2")
    sql("""MERGE WITH SCHEMA EVOLUTION INTO gmev.ns.t2 t USING mevo_src2 s ON t.k = s.k
           WHEN NOT MATCHED THEN INSERT *""")
    val rows = sql("SELECT k, info.a, info.b FROM gmev.ns.t2 ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
    assert(rows.toSeq === Seq((1L, 10L, -1L), (2L, 20L, 99L)),
      "pre-merge rows must null-fill the evolved nested member")
  }

  test("WITHOUT the keyword, the schema never changes (extra source column ignored by *)") {
    root
    sql("DROP TABLE IF EXISTS gmev.ns.t3")
    sql("CREATE TABLE gmev.ns.t3 (k BIGINT, v BIGINT) USING parquet")
    sql("SELECT * FROM VALUES (1L, 1L, 'x') AS s(k, v, extra)")
      .createOrReplaceTempView("mevo_src3")
    // INSERT * expands against the TARGET schema, so the extra source column
    // is dropped silently — the evolution is strictly opt-in via the keyword
    sql("""MERGE INTO gmev.ns.t3 t USING mevo_src3 s ON t.k = s.k
           WHEN NOT MATCHED THEN INSERT *""")
    assert(sql("SELECT * FROM gmev.ns.t3").schema.fieldNames.toSeq === Seq("k", "v"))
    assert(sql("SELECT v FROM gmev.ns.t3 WHERE k = 1").collect().head.getLong(0) === 1L)
  }

  test("evolution cannot resurrect a DROPPED column name — the retirement guard holds") {
    root
    sql("DROP TABLE IF EXISTS gmev.ns.t4")
    sql("CREATE TABLE gmev.ns.t4 (k BIGINT, v BIGINT, old BIGINT) USING parquet")
    sql("INSERT INTO gmev.ns.t4 VALUES (1, 10, 5)")
    sql("ALTER TABLE gmev.ns.t4 DROP COLUMN old")
    sql("SELECT * FROM VALUES (2L, 20L, 7L) AS s(k, v, old)")
      .createOrReplaceTempView("mevo_src4")
    val e = intercept[Exception] {
      sql("""MERGE WITH SCHEMA EVOLUTION INTO gmev.ns.t4 t USING mevo_src4 s ON t.k = s.k
             WHEN NOT MATCHED THEN INSERT *""")
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("previously dropped"), s"expected the retirement guard, got: $msgs")
  }
}
