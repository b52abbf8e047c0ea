package graft.catalog

import java.nio.file.{Files, Path}

import graft.SparkSpec

/** Pins for TAG refs — immutable named snapshots (GraftRefs.TagPrefix):
  * `create_tag` pins, `VERSION AS OF '<tag>'` reads, expire_snapshots retains
  * tagged snapshots, drop_tag frees them, the name namespace is shared with
  * branches, and clones don't carry tags (their snapshot ids are
  * source-lineage-relative). */
class TagSpec extends SparkSpec {

  private lazy val root = {
    val d = Files.createTempDirectory("graft_tag_spec")
    spark.conf.set("spark.sql.catalog.gtg", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gtg.root", d.toString)
    d
  }

  private def sql(q: String) = spark.sql(q)
  private def count(q: String): Long = sql(q).collect().head.getLong(0)

  private def mk(t: String): Unit = {
    sql(s"DROP TABLE IF EXISTS gtg.ns.$t")
    sql(s"CREATE TABLE gtg.ns.$t (k BIGINT, amt BIGINT) USING parquet")
    sql(s"INSERT INTO gtg.ns.$t VALUES (1, 10), (2, 20), (3, 30)")
  }

  test("tag pins a snapshot; later DML doesn't move it; t.tags lists it") {
    root
    mk("t1")
    sql("CALL gtg.system.create_tag('ns.t1', 'rel1')")
    sql("INSERT INTO gtg.ns.t1 VALUES (4, 40)")
    sql("DELETE FROM gtg.ns.t1 WHERE k = 1")
    assert(count("SELECT count(*) c FROM gtg.ns.t1") === 3)       // 2,3,4
    assert(count("SELECT count(*) c FROM gtg.ns.t1 VERSION AS OF 'rel1'") === 3) // 1,2,3
    assert(count("SELECT sum(amt) s FROM gtg.ns.t1 VERSION AS OF 'rel1'") === 60)
    val row = sql("SELECT * FROM gtg.ns.t1.tags").collect().head
    assert(row.getAs[String]("tag") === "rel1")
    assert(row.getAs[Long]("snapshot") === 1L)
  }

  test("expire_snapshots retains the tagged snapshot; drop_tag frees it") {
    mk("t2")
    sql("CALL gtg.system.create_tag('ns.t2', 'keepme')")
    sql("INSERT INTO gtg.ns.t2 VALUES (4, 40)")
    sql("INSERT INTO gtg.ns.t2 VALUES (5, 50)")
    sql("CALL gtg.system.expire_snapshots('ns.t2', keep_last => 1)")
    // the pinned snapshot survived maintenance — reads still serve v1 exactly
    assert(count("SELECT count(*) c FROM gtg.ns.t2 VERSION AS OF 'keepme'") === 3)
    // without the tag, the same expiry drops it
    sql("CALL gtg.system.drop_tag('ns.t2', 'keepme')")
    sql("CALL gtg.system.expire_snapshots('ns.t2', keep_last => 1)")
    val ex = intercept[Exception] {
      sql("SELECT count(*) FROM gtg.ns.t2 VERSION AS OF 'keepme'").collect()
    }
    assert(ex.getMessage.contains("keepme"))
  }

  test("structural immutability: a tag never resolves as a branch write target") {
    import spark.implicits._
    mk("t3")
    sql("CALL gtg.system.create_tag('ns.t3', 'frozen')")
    val ex = intercept[Exception] {
      Seq((9L, 90L)).toDF("k", "amt").write.format("parquet")
        .option("graft.branch", "frozen").mode("append").saveAsTable("gtg.ns.t3")
    }
    // the branch path looks up ref.* only — a tag name is simply "no branch"
    assert(ex.getMessage.contains("frozen") || ex.getCause != null &&
      ex.getCause.getMessage.contains("frozen"))
    assert(count("SELECT count(*) c FROM gtg.ns.t3 VERSION AS OF 'frozen'") === 3)
  }

  test("one namespace: tag/branch name collisions are refused both ways") {
    mk("t4")
    sql("CALL gtg.system.create_branch('ns.t4', 'shared')")
    val e1 = intercept[Exception] {
      sql("CALL gtg.system.create_tag('ns.t4', 'shared')")
    }
    assert(e1.getMessage.contains("branch"))
    sql("CALL gtg.system.create_tag('ns.t4', 'rel')")
    val e2 = intercept[Exception] {
      sql("CALL gtg.system.create_branch('ns.t4', 'rel')")
    }
    assert(e2.getMessage.contains("tag"))
    // duplicate tag also refused
    val e3 = intercept[Exception] {
      sql("CALL gtg.system.create_tag('ns.t4', 'rel')")
    }
    assert(e3.getMessage.contains("already exists"))
  }

  test("create_tag at an explicit historical snapshot; invalid snapshot refused") {
    mk("t5")
    sql("INSERT INTO gtg.ns.t5 VALUES (4, 40)")
    sql("CALL gtg.system.create_tag('ns.t5', 'old', snapshot => 1)")
    assert(count("SELECT count(*) c FROM gtg.ns.t5 VERSION AS OF 'old'") === 3)
    val ex = intercept[Exception] {
      sql("CALL gtg.system.create_tag('ns.t5', 'bad', snapshot => 99)")
    }
    assert(ex.getMessage.contains("no snapshot"))
  }

  test("clone does not carry tags (snapshot ids are source-lineage-relative)") {
    mk("t6")
    sql("CALL gtg.system.create_tag('ns.t6', 'rel6')")
    sql("CALL gtg.system.clone_table('ns.t6', 'ns.t6c')")
    assert(sql("SELECT * FROM gtg.ns.t6c.tags").collect().isEmpty)
    // the source keeps its tag
    assert(sql("SELECT * FROM gtg.ns.t6.tags").collect().length === 1)
  }
}
