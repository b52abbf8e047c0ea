package graft.catalog

import java.nio.file.{Files, Path}

import graft.SparkSpec

/** Pins for PARTITION EVOLUTION (GraftPartitions.SpecIdProp):
  * `ALTER TABLE ... SET TBLPROPERTIES('graft.partition-by'=...)` changes the
  * spec for FUTURE writes; existing segments keep their own layout and every
  * value-based path stays correct (zone-map pruning, COW DML); new suffixes
  * are spec-qualified (`<id>~<tuple>`) so cross-spec suffix collisions are
  * structurally impossible; the one suffix-keyed op (dynamic partition
  * overwrite) is refused while mixed, and full INSERT OVERWRITE migrates. */
class PartitionEvolutionSpec extends SparkSpec {

  private lazy val root = {
    val d = Files.createTempDirectory("graft_pevo_spec")
    spark.conf.set("spark.sql.catalog.gpe", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gpe.root", d.toString)
    d
  }

  private def sql(q: String) = spark.sql(q)
  private def count(q: String): Long = sql(q).collect().head.getLong(0)
  private def segs(t: String): Seq[String] = {
    val dir = root.resolve("ns").resolve(t)
    val meta = GraftMeta.read(dir)
    meta.snapshots(meta.current)
  }

  private def mk(t: String, partBy: String): Unit = {
    sql(s"DROP TABLE IF EXISTS gpe.ns.$t")
    val part = if (partBy.isEmpty) "" else s"PARTITIONED BY ($partBy)"
    sql(s"CREATE TABLE gpe.ns.$t (k BIGINT, st STRING, b STRING, amt BIGINT) USING parquet $part")
    sql(s"""INSERT INTO gpe.ns.$t VALUES
      (1, 'A', 'x', 10), (2, 'B', 'y', 20), (3, 'A', 'y', 30), (4, 'B', 'x', 40)""")
  }

  test("evolution changes FUTURE writes only; both layouts read correctly; new suffixes spec-qualified") {
    root
    mk("t1", "st")
    assert(segs("t1").forall(s => GraftPartitions.suffixOf(s).exists(x =>
      GraftPartitions.specIdOf(x) == 0L)))
    sql("ALTER TABLE gpe.ns.t1 SET TBLPROPERTIES('graft.partition-by'='b')")
    sql("INSERT INTO gpe.ns.t1 VALUES (5, 'A', 'x', 50), (6, 'B', 'z', 60)")
    // full content correct across mixed layouts
    assert(count("SELECT count(*) c FROM gpe.ns.t1") === 6)
    assert(count("SELECT sum(amt) s FROM gpe.ns.t1") === 210)
    // new segments carry the spec-1-qualified suffix; old keep spec 0
    val bySpec = segs("t1").groupBy(s =>
      GraftPartitions.suffixOf(s).map(GraftPartitions.specIdOf).getOrElse(-1L))
    assert(bySpec.keySet === Set(0L, 1L))
    assert(bySpec(1L).size === 2) // partition-pure per b value ('x', 'z')
    // predicates on BOTH generations' partition columns still return truth
    assert(count("SELECT sum(amt) s FROM gpe.ns.t1 WHERE st = 'A'") === 90)
    assert(count("SELECT sum(amt) s FROM gpe.ns.t1 WHERE b = 'x'") === 100)
  }

  test("zone maps prune mixed layouts: a predicate on either spec's column skips segments") {
    mk("t2", "st")
    sql("ALTER TABLE gpe.ns.t2 SET TBLPROPERTIES('graft.partition-by'='b')")
    sql("INSERT INTO gpe.ns.t2 VALUES (5, 'A', 'x', 50), (6, 'B', 'z', 60)")
    def planned(pred: String): Int = {
      val df = sql(s"SELECT k FROM gpe.ns.t2 WHERE $pred")
      df.queryExecution.executedPlan.collectLeaves().collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.scan.toBatch.planInputPartitions().toSeq.flatMap {
            case f: org.apache.spark.sql.execution.datasources.FilePartition =>
              f.files.map(x => java.nio.file.Paths.get(x.filePath.toString)
                .getParent.getFileName.toString)
            case _ => Nil
          }
      }.flatten.toSet.size
    }
    val total = segs("t2").size // 2 old (st A/B) + 2 new (b x/z)
    assert(total === 4)
    // st='A' keeps the old A segment + any NEW segment containing st='A' rows
    assert(planned("st = 'A'") < total)
    // b='z' keeps exactly the new z segment (old segments' b zone bounds exclude it)
    assert(planned("b = 'z'") === 1)
  }

  test("dynamic partition overwrite: refused while mixed, works after full migration") {
    import spark.implicits._
    mk("t3", "st")
    sql("ALTER TABLE gpe.ns.t3 SET TBLPROPERTIES('graft.partition-by'='b')")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      val ex = intercept[Exception] {
        sql("INSERT OVERWRITE gpe.ns.t3 VALUES (7, 'C', 'x', 70)")
      }
      assert(ex.getMessage.contains("MIXED-LAYOUT") ||
        (ex.getCause != null && ex.getCause.getMessage.contains("MIXED-LAYOUT")),
        s"expected the mixed-layout refusal, got: ${ex.getMessage}")
      // table unchanged by the refused write
      assert(count("SELECT count(*) c FROM gpe.ns.t3") === 4)
      // MIGRATE: full rewrite under the current spec via self INSERT OVERWRITE
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
      sql("CREATE OR REPLACE TEMP VIEW t3_all AS SELECT * FROM gpe.ns.t3")
      val rows = sql("SELECT * FROM gpe.ns.t3").collect()
      rows.toSeq.map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
        .toDF("k", "st", "b", "amt").createOrReplaceTempView("t3_snap")
      sql("INSERT OVERWRITE gpe.ns.t3 SELECT * FROM t3_snap")
      assert(GraftPartitions.mixedLayoutSegments(
        GraftMeta.read(root.resolve("ns").resolve("t3"))).isEmpty)
      // now dynamic overwrite works and replaces exactly the touched partition
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      sql("INSERT OVERWRITE gpe.ns.t3 VALUES (7, 'C', 'x', 70)")
      assert(count("SELECT count(*) c FROM gpe.ns.t3 WHERE b = 'x'") === 1)
      assert(count("SELECT count(*) c FROM gpe.ns.t3") === 3) // y-partition rows kept
    } finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
  }

  test("COW delete_where migrates touched rows to the current spec") {
    mk("t4", "st")
    sql("ALTER TABLE gpe.ns.t4 SET TBLPROPERTIES('graft.partition-by'='b')")
    // touches the old st='A' segment: survivors re-route under spec 1 (by b)
    sql("CALL gpe.system.delete_where('ns.t4', 'k = 1')")
    assert(count("SELECT count(*) c FROM gpe.ns.t4") === 3)
    assert(count("SELECT sum(amt) s FROM gpe.ns.t4") === 90)
    val specIds = segs("t4").map(s =>
      GraftPartitions.suffixOf(s).map(GraftPartitions.specIdOf).getOrElse(-1L)).toSet
    assert(specIds.contains(1L), s"rewritten rows must carry the new spec: ${segs("t4")}")
  }

  test("unpartitioned -> partitioned and back: UNSET departitions future writes") {
    mk("t5", "")
    sql("ALTER TABLE gpe.ns.t5 SET TBLPROPERTIES('graft.partition-by'='st')")
    sql("INSERT INTO gpe.ns.t5 VALUES (5, 'C', 'z', 50)")
    assert(segs("t5").exists(s => GraftPartitions.suffixOf(s).isDefined))
    assert(count("SELECT count(*) c FROM gpe.ns.t5") === 5)
    sql("ALTER TABLE gpe.ns.t5 UNSET TBLPROPERTIES('graft.partition-by')")
    sql("INSERT INTO gpe.ns.t5 VALUES (6, 'D', 'w', 60)")
    assert(count("SELECT count(*) c FROM gpe.ns.t5") === 6)
    val meta = GraftMeta.read(root.resolve("ns").resolve("t5"))
    assert(GraftPartitions.cols(meta.props).isEmpty)
    assert(GraftPartitions.specId(meta.props) === 2L)
  }

  test("evolution validation: unknown and unsupported-type columns refused") {
    mk("t6", "st")
    val e1 = intercept[Exception] {
      sql("ALTER TABLE gpe.ns.t6 SET TBLPROPERTIES('graft.partition-by'='nope')")
    }
    assert(e1.getMessage.contains("unknown partition column"))
    sql("DROP TABLE IF EXISTS gpe.ns.t7")
    sql("CREATE TABLE gpe.ns.t7 (k BIGINT, f DOUBLE) USING parquet")
    val e2 = intercept[Exception] {
      sql("ALTER TABLE gpe.ns.t7 SET TBLPROPERTIES('graft.partition-by'='f')")
    }
    assert(e2.getMessage.contains("unsupported type"))
  }

  test("compact groups by FULL suffix: per-spec groups survive, content identical") {
    mk("t8", "st")
    sql("ALTER TABLE gpe.ns.t8 SET TBLPROPERTIES('graft.partition-by'='b')")
    sql("INSERT INTO gpe.ns.t8 VALUES (5, 'A', 'x', 50)")
    sql("CALL gpe.system.compact('ns.t8')")
    assert(count("SELECT count(*) c FROM gpe.ns.t8") === 5)
    assert(count("SELECT sum(amt) s FROM gpe.ns.t8") === 150)
    // purity preserved within each generation's own layout
    val suffixes = segs("t8").flatMap(GraftPartitions.suffixOf)
    assert(suffixes.distinct.size === suffixes.size, s"purity lost: $suffixes")
  }
}
