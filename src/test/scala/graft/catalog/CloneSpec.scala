package graft.catalog

import java.nio.file.{Files, Path}

import graft.SparkSpec

/** Pins for zero-copy clone (GraftClone.scala): files are HARD-LINKED (same
  * inode, zero data bytes), the two tables evolve independently, source
  * maintenance can never break the clone (each side owns its links), DV'd
  * snapshots clone live-row-exact, and a historical snapshot clones as a
  * writable table. */
class CloneSpec extends SparkSpec {

  private lazy val root = {
    val d = Files.createTempDirectory("graft_clone_spec")
    spark.conf.set("spark.sql.catalog.gcl", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcl.root", d.toString)
    d
  }

  private def sql(q: String) = spark.sql(q)
  private def count(t: String): Long =
    sql(s"SELECT COUNT(*) c FROM gcl.ns.$t").collect().head.getLong(0)
  private def tdir(t: String): Path = root.resolve("ns").resolve(t)

  private def inode(p: Path): Any = Files.getAttribute(p, "unix:ino")

  private def mk(t: String): Unit = {
    sql(s"DROP TABLE IF EXISTS gcl.ns.$t")
    sql(s"""CREATE TABLE gcl.ns.$t (k BIGINT, amt BIGINT) USING parquet
            TBLPROPERTIES ('graft.delete-mode' = 'merge-on-read')""")
    sql(s"INSERT INTO gcl.ns.$t SELECT id, id * 10 FROM range(1, 21)")
  }

  test("clone shares inodes (zero data copy) and reads identically") {
    root
    mk("s1")
    val out = sql("CALL gcl.system.clone_table('ns.s1', 'ns.c1')").collect().head
    assert(out.getAs[Int]("files_linked") > 0)
    assert(count("c1") === count("s1"))
    // every cloned parquet file is the SAME inode as its source twin
    val srcSegs = GraftMeta.listDir(tdir("s1")).filter(p =>
      Files.isDirectory(p) && p.getFileName.toString.startsWith("seg-"))
    var checked = 0
    srcSegs.foreach { seg =>
      GraftMeta.listDir(seg).filter(_.getFileName.toString.endsWith(".parquet")).foreach { f =>
        val twin = tdir("c1").resolve(seg.getFileName.toString).resolve(f.getFileName.toString)
        assert(Files.exists(twin))
        assert(inode(f) === inode(twin), s"$f not hard-linked")
        checked += 1
      }
    }
    assert(checked > 0)
  }

  test("clone and source diverge independently") {
    root
    mk("s2")
    sql("CALL gcl.system.clone_table('ns.s2', 'ns.c2')")
    sql("DELETE FROM gcl.ns.c2 WHERE k <= 5")   // clone shrinks
    sql("INSERT INTO gcl.ns.s2 VALUES (100, 1)") // source grows
    assert(count("s2") === 21)
    assert(count("c2") === 15)
    // and a clone's zone maps came along: pruning metadata is populated
    val cm = GraftMeta.read(tdir("c2"))
    assert(cm.zstats.nonEmpty)
  }

  test("source expiry/compaction cannot break the clone (links own the bytes)") {
    root
    mk("s3")
    sql("CALL gcl.system.clone_table('ns.s3', 'ns.c3')")
    // source rewrites everything away and expires all old snapshots+segments
    sql("CALL gcl.system.compact('ns.s3')")
    sql("CALL gcl.system.expire_snapshots('ns.s3', keep_last => 1, orphan_retention_ms => 0)")
    assert(count("c3") === 20, "clone must survive source maintenance")
    assert(sql("SELECT sum(amt) s FROM gcl.ns.c3").collect().head.getLong(0) ===
      (1L to 20L).map(_ * 10).sum)
  }

  test("cloning a DV'd snapshot carries the delete vectors (no resurrection)") {
    root
    mk("s4")
    sql("DELETE FROM gcl.ns.s4 WHERE k % 2 = 0") // MOR: positional vector
    sql("CALL gcl.system.clone_table('ns.s4', 'ns.c4')")
    assert(count("c4") === 10)
    assert(sql("SELECT min(k) m FROM gcl.ns.c4").collect().head.getLong(0) === 1)
  }

  test("historical-snapshot clone: time travel you can write to") {
    root
    mk("s5")
    sql("INSERT INTO gcl.ns.s5 VALUES (999, 1)") // snapshot 2
    sql("CALL gcl.system.clone_table('ns.s5', 'ns.c5', snapshot => 1)")
    assert(count("c5") === 20, "clone reflects the PINNED snapshot, not current")
    sql("INSERT INTO gcl.ns.c5 VALUES (7777, 2)") // and it accepts writes
    assert(count("c5") === 21)
    assert(count("s5") === 21) // source untouched by the clone's write
  }

  test("clone refuses an existing target") {
    root
    mk("s6")
    sql("CALL gcl.system.clone_table('ns.s6', 'ns.c6')")
    val e = intercept[Exception](sql("CALL gcl.system.clone_table('ns.s6', 'ns.c6')"))
    assert(e.getMessage.contains("already exists"))
  }
}
