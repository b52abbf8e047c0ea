package graft.catalog

import graft.SparkSpec

/** Pins for VARIANT columns riding the graft catalog (q291's engine half):
  * the open-variant binary lands as parquet (metadata, value) groups through
  * the NORMAL gated write path, so every engine mechanism must either carry
  * it verbatim or stay indifferent to it — nothing variant-specific exists
  * in the write path, and these pins prove nothing needs to. */
class VariantSpec extends SparkSpec {

  private lazy val root = {
    val d = java.nio.file.Files.createTempDirectory("graft_variant_spec")
    spark.conf.set("spark.sql.catalog.gvar", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gvar.root", d.toString)
    d
  }

  private def sql(q: String) = spark.sql(q)

  test("variant columns round-trip byte-faithfully through the graft write path") {
    root
    sql("DROP TABLE IF EXISTS gvar.ns.v1")
    sql("CREATE TABLE gvar.ns.v1 (k BIGINT, v VARIANT) USING parquet")
    sql("""INSERT INTO gvar.ns.v1
           SELECT id, PARSE_JSON('{"a": ' || id || ', "s": "x' || id || '", "arr": [1, ' || id || ']}')
           FROM range(0, 50)""")
    // logical round trip: every typed path extracts exactly; to_json
    // re-renders the stored binary (object keys come back SORTED — the
    // variant builder canonicalizes dictionaries), so a corrupted byte
    // cannot hide
    val bad = sql("""SELECT COUNT(*) AS n FROM gvar.ns.v1
      WHERE VARIANT_GET(v, '$.a', 'bigint') != k
         OR VARIANT_GET(v, '$.s', 'string') != 'x' || k
         OR VARIANT_GET(v, '$.arr[1]', 'bigint') != k
         OR TO_JSON(v) != '{"a":' || k || ',"arr":[1,' || k || '],"s":"x' || k || '"}'""")
    assert(bad.collect().head.getLong(0) === 0L)
  }

  test("COW rewrites carry variant rows verbatim; heterogeneous shapes coexist") {
    root
    sql("DROP TABLE IF EXISTS gvar.ns.v2")
    sql("CREATE TABLE gvar.ns.v2 (k BIGINT, v VARIANT) USING parquet")
    // two shapes in one column: flat numbers and nested objects
    sql("INSERT INTO gvar.ns.v2 SELECT id, PARSE_JSON(CAST(id AS STRING)) FROM range(0, 20)")
    sql("""INSERT INTO gvar.ns.v2
           SELECT id, PARSE_JSON('{"nested": {"x": ' || id || '}}') FROM range(20, 40)""")
    // a copy-on-write DELETE rewrites the survivors' segment: the untouched
    // variant rows must come out byte-identical on the other side
    sql("DELETE FROM gvar.ns.v2 WHERE k % 4 = 0")
    // TRY_VARIANT_GET: the root of the nested shape is an object, not a
    // number — the strict form raises INVALID_VARIANT_CAST across shapes
    val rows = sql("""SELECT k,
        TRY_VARIANT_GET(v, '$', 'bigint') AS flat,
        TRY_VARIANT_GET(v, '$.nested.x', 'bigint') AS nested
      FROM gvar.ns.v2 ORDER BY k""").collect()
    assert(rows.length === 30)
    rows.foreach { r =>
      val k = r.getLong(0)
      assert(k % 4 != 0)
      if (k < 20) assert(r.getLong(1) === k && r.isNullAt(2))
      else assert(r.isNullAt(1) && r.getLong(2) === k)
    }
  }

  test("zone harvest skips the variant column; scalar siblings keep full pushdown") {
    root
    sql("DROP TABLE IF EXISTS gvar.ns.v3")
    sql("CREATE TABLE gvar.ns.v3 (k BIGINT, v VARIANT) USING parquet")
    sql("INSERT INTO gvar.ns.v3 SELECT id, PARSE_JSON('{\"a\":' || id || '}') FROM range(0, 100)")
    sql("INSERT INTO gvar.ns.v3 SELECT id, PARSE_JSON('{\"a\":' || id || '}') FROM range(100, 200)")
    // COUNT(*)/MIN/MAX on the scalar sibling still serve METADATA-ONLY: the
    // variant column's absence from the zone walk must not poison the
    // segment's stats entry
    val q = "SELECT COUNT(*) AS n, MIN(k) AS mn, MAX(k) AS mx FROM gvar.ns.v3"
    val plan = sql(q).queryExecution.executedPlan.toString
    assert(plan.contains("graft-stats-agg"),
      s"scalar aggregates beside a variant column must stay zero-IO:\n$plan")
    val r = sql(q).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((200L, 0L, 199L)))
    // ... and a zone-prunable predicate on the sibling still drops segments
    // (1 of 2 planned) while extracting typed paths from the kept one
    val pruned = sql("""SELECT CAST(SUM(VARIANT_GET(v, '$.a', 'bigint')) AS BIGINT) AS s
                        FROM gvar.ns.v3 WHERE k >= 150""")
    assert(pruned.collect().head.getLong(0) === (150L until 200L).sum)
    val scanned = pruned.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString
    assert(!scanned.contains("seg-1-") || !scanned.contains("seg-2-"),
      s"the k<100 segment must be zone-pruned:\n${scanned.take(400)}")
  }

  test("shredded variant statistics: a generated column extracting a path zone-prunes segments") {
    root
    // the Delta variant-shredding story composed from existing machinery:
    // `graft.generate.k = variant_get(v, '$.k', 'bigint')` fills a REGULAR
    // bigint column from the variant path at write, the zone walk harvests
    // it like any scalar, and a predicate on the extracted path drops whole
    // segments at plan time — semi-structured data with typed data skipping
    sql("DROP TABLE IF EXISTS gvar.ns.v5")
    sql("""CREATE TABLE gvar.ns.v5 (eid BIGINT, k BIGINT, v VARIANT) USING parquet
           TBLPROPERTIES ('graft.generate.k' = 'variant_get(v, ''$.k'', ''bigint'')')""")
    sql("""INSERT INTO gvar.ns.v5
           SELECT id, NULL, PARSE_JSON('{"k": ' || id || '}') FROM range(0, 100)""")
    sql("""INSERT INTO gvar.ns.v5
           SELECT id, NULL, PARSE_JSON('{"k": ' || id || '}') FROM range(100, 200)""")
    val probe = sql("SELECT eid FROM gvar.ns.v5 WHERE k >= 150")
    val planned = probe.queryExecution.executedPlan.collectLeaves().collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.scan.toBatch.planInputPartitions().toSeq.flatMap {
          case f: org.apache.spark.sql.execution.datasources.FilePartition =>
            f.files.map(p => java.nio.file.Paths.get(
              new java.net.URI(p.filePath.toString).getPath).getParent.getFileName.toString)
          case _ => Nil
        }
    }.flatten.distinct
    assert(planned.size === 1,
      s"the k<100 segment must zone-prune via the EXTRACTED path, planned $planned")
    assert(probe.count() === 50L)
    // the filled value always matches the stored variant
    assert(sql("""SELECT COUNT(*) FROM gvar.ns.v5
                  WHERE k != VARIANT_GET(v, '$.k', 'bigint')""").collect().head.getLong(0) === 0L)
  }

  test("schema evolution beside a variant column stays metadata-only") {
    root
    sql("DROP TABLE IF EXISTS gvar.ns.v4")
    sql("CREATE TABLE gvar.ns.v4 (k BIGINT, v VARIANT) USING parquet")
    sql("INSERT INTO gvar.ns.v4 SELECT id, PARSE_JSON('[' || id || ']') FROM range(0, 10)")
    sql("ALTER TABLE gvar.ns.v4 ADD COLUMNS (tag STRING)")
    sql("INSERT INTO gvar.ns.v4 SELECT id, PARSE_JSON('[' || id || ']'), 'new' FROM range(10, 20)")
    val r = sql("""SELECT COUNT(*) AS n, COUNT(tag) AS nt,
                          CAST(SUM(VARIANT_GET(v, '$[0]', 'bigint')) AS BIGINT) AS s
                   FROM gvar.ns.v4""").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((20L, 10L, (0L until 20L).sum)))
  }
}
