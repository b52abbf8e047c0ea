package graft.catalog

import java.nio.file.Files

import graft.SparkSpec

/** Pin for the legacy `zc<digits>` partition-suffix ambiguity gate (r20,
  * ADVICE): a segment written BEFORE the encodeString zc-escape whose
  * string partition value literally matches `zc<digits>` kept the raw
  * suffix, which today's parsers read as a z-order CELL TAIL — partition-
  * scoped reads and DML would silently miss it while new writes of the
  * same value land under the escaped `%7Ac...` form. Table load must
  * REFUSE such a layout (partitioned + never-clustered + cell-tail-shaped
  * suffix) with the remediation named, never serve a silently incomplete
  * partition view. */
class LegacyZcSuffixSpec extends SparkSpec {

  private lazy val root = {
    val d = Files.createTempDirectory("graft_zcleg_spec")
    spark.conf.set("spark.sql.catalog.gzc", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gzc.root", d.toString)
    d
  }

  private def sql(q: String) = spark.sql(q)

  test("a pre-escape zc-valued segment refuses at load; escaped writes keep working") {
    root
    sql("DROP TABLE IF EXISTS gzc.ns.t1")
    sql("""CREATE TABLE gzc.ns.t1 (k BIGINT, tag STRING) USING parquet
           PARTITIONED BY (tag)""")
    // today's writer ESCAPES the ambiguous value: suffix %7Ac3, reads fine
    sql("INSERT INTO gzc.ns.t1 VALUES (1, 'zc3'), (2, 'plain')")
    assert(sql("SELECT count(*) c FROM gzc.ns.t1 WHERE tag = 'zc3'")
      .collect().head.getLong(0) === 1L)
    val dir = root.resolve("ns").resolve("t1")
    val meta = GraftMeta.read(dir)
    val escaped = meta.snapshots(meta.current)
      .find(_.endsWith("%7Ac3")).getOrElse(fail("expected an escaped zc segment"))
    // forge the PRE-ESCAPE layout: rename the segment dir to the raw form
    // and point the meta at it — byte-identical to what an old writer left
    val legacy = escaped.stripSuffix("%7Ac3") + "zc3"
    Files.move(dir.resolve(escaped), dir.resolve(legacy))
    GraftMeta.mutate(dir) { m =>
      def fix(s: String) = if (s == escaped) legacy else s
      m.copy(snapshots = m.snapshots.map { case (v, ss) => v -> ss.map(fix) },
        zstats = m.zstats.map { case (s, z) => fix(s) -> z })
    }
    val e = intercept[IllegalStateException] { sql("SELECT * FROM gzc.ns.t1").collect() }
    assert(e.getMessage.contains("z-order cell tail"), e.getMessage)
    assert(e.getMessage.contains("never been clustered"), e.getMessage)
    assert(e.getMessage.contains("%7Ac"), "remediation must name the escaped form")
  }

  test("clustered tables' real cell tails keep loading (the gate keys on the routing spec)") {
    root
    sql("DROP TABLE IF EXISTS gzc.ns.t2")
    // PARTITIONED + clustered: per-partition cell segments (`<tuple>~zc<i>`)
    // are exactly the shape the gate must NOT flag — the persisted z-order
    // routing spec (GraftZOrder.ColsProp) is the discriminator
    sql("""CREATE TABLE gzc.ns.t2 (k BIGINT, a BIGINT, b BIGINT, p STRING)
           USING parquet PARTITIONED BY (p)""")
    sql("""INSERT INTO gzc.ns.t2
           SELECT id, id % 100, (id * 7) % 100, CASE WHEN id % 2 = 0 THEN 'x' ELSE 'y' END
           FROM range(0, 5000)""")
    sql("CALL gzc.system.rewrite_clustered('ns.t2', 'a,b', 4)")
    val meta = GraftMeta.read(root.resolve("ns").resolve("t2"))
    assert(meta.snapshots(meta.current).exists(s =>
      GraftPartitions.suffixOf(s).exists(GraftPartitions.hasCellTail)),
      s"fixture must produce cell-tail segments, got ${meta.snapshots(meta.current)}")
    assert(sql("SELECT count(*) c FROM gzc.ns.t2").collect().head.getLong(0) === 5000L)
    assert(sql("SELECT count(*) c FROM gzc.ns.t2 WHERE p = 'x'").collect().head.getLong(0) === 2500L)
  }
}
