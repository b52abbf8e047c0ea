package graft.catalog

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** Pins for the NATIVE streaming sink (GraftStreamingWrite):
  * `writeStream.toTable("graft.ns.t")` with no foreachBatch glue — each
  * epoch is one named commit in the exactly-once registry, restart replay is
  * a no-op, partitioned tables get partition-pure per-epoch segments, and
  * CHECK constraints gate streamed rows. */
class StreamingSinkSpec extends SparkSpec {

  private lazy val root = {
    val d = Files.createTempDirectory("graft_ssink_spec")
    spark.conf.set("spark.sql.catalog.gss", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gss.root", d.toString)
    d
  }

  private def sql(q: String) = spark.sql(q)
  private def count(t: String): Long =
    sql(s"SELECT COUNT(*) c FROM gss.ns.$t").collect().head.getLong(0)

  private def drain(stream: MemoryStream[(Long, String, Long)], table: String,
                    ckpt: String): Unit = {
    import spark.implicits._
    val q = stream.toDS().toDF("k", "tag", "amt").writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .toTable(s"gss.ns.$table")
    assert(q.awaitTermination(300000), "stream did not drain")
  }

  test("writeStream.toTable lands epochs as named commits; restart replay is a no-op") {
    root
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    sql("DROP TABLE IF EXISTS gss.ns.t1")
    sql("CREATE TABLE gss.ns.t1 (k BIGINT, tag STRING, amt BIGINT) USING parquet")
    val ckpt = Files.createTempDirectory("gss_ckpt1").toString
    val stream = MemoryStream[(Long, String, Long)]
    stream.addData((1L, "a", 10L), (2L, "b", 20L))
    drain(stream, "t1", ckpt)
    assert(count("t1") === 2)
    // restart from the SAME checkpoint with more data: the old epoch must
    // not re-apply, the new one must land
    stream.addData((3L, "a", 30L))
    drain(stream, "t1", ckpt)
    assert(count("t1") === 3)
    assert(sql("SELECT sum(amt) s FROM gss.ns.t1").collect().head.getLong(0) === 60)
    // the epoch segments carry the exactly-once name shape
    val meta = GraftMeta.read(root.resolve("ns").resolve("t1"))
    assert(meta.committedNamed.keys.exists(_.startsWith("seg-str-")),
      s"expected str-named registry entries, got ${meta.committedNamed.keys}")
  }

  test("partitioned streaming sink: partition-pure per-epoch segments, pruning works") {
    root
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    sql("DROP TABLE IF EXISTS gss.ns.t2")
    sql("""CREATE TABLE gss.ns.t2 (k BIGINT, tag STRING, amt BIGINT)
           USING parquet PARTITIONED BY (tag)""")
    val ckpt = Files.createTempDirectory("gss_ckpt2").toString
    val stream = MemoryStream[(Long, String, Long)]
    stream.addData((1L, "a", 10L), (2L, "b", 20L), (3L, "a", 30L))
    drain(stream, "t2", ckpt)
    assert(count("t2") === 3)
    assert(sql("SELECT COUNT(*) c FROM gss.ns.t2 WHERE tag = 'a'")
      .collect().head.getLong(0) === 2)
    // one segment per partition value per epoch, each partition-pure
    val meta = GraftMeta.read(root.resolve("ns").resolve("t2"))
    val segs = meta.snapshots(meta.current)
    assert(segs.forall(_.contains(GraftPartitions.Marker.toString)),
      s"streamed segments must carry partition suffixes: $segs")
    assert(segs.size === 2)
  }

  test("CHECK constraints gate streamed rows; failed epoch publishes nothing") {
    root
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    sql("DROP TABLE IF EXISTS gss.ns.t3")
    sql("""CREATE TABLE gss.ns.t3 (k BIGINT, tag STRING, amt BIGINT) USING parquet
           TBLPROPERTIES ('graft.check.pos' = 'amt > 0')""")
    val ckpt = Files.createTempDirectory("gss_ckpt3").toString
    val stream = MemoryStream[(Long, String, Long)]
    stream.addData((1L, "a", 10L), (2L, "b", -5L))
    val q = stream.toDS().toDF("k", "tag", "amt").writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .toTable("gss.ns.t3")
    val e = intercept[Exception](q.awaitTermination(300000))
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("CHECK constraint 'pos'")))
    assert(count("t3") === 0, "failed epoch must publish nothing")
  }

  test("identity streaming appends: epochs allocate disjoint ids, survive restart") {
    root
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    sql("DROP TABLE IF EXISTS gss.ns.tid")
    sql("""CREATE TABLE gss.ns.tid
           (id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 100 INCREMENT BY 3),
            k BIGINT) USING parquet""")
    val ckpt = Files.createTempDirectory("gss_ckpt_id").toString
    val stream = MemoryStream[Long]
    def drainK(): Unit = {
      val q = stream.toDS().toDF("k").selectExpr("CAST(NULL AS BIGINT) AS id", "k")
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .toTable("gss.ns.tid")
      assert(q.awaitTermination(300000), "stream did not drain")
    }
    stream.addData(1L, 2L, 3L)
    drainK() // epoch 0
    val e0 = sql("SELECT id FROM gss.ns.tid").collect().map(_.getLong(0))
    assert(e0.length === 3 && e0.distinct.length === 3, "epoch 0 allocates unique ids")
    assert(e0.forall(id => id >= 100 && (id - 100) % 3 == 0), "ids on the start+k*step grid")
    // RESTART from the same checkpoint: replayed epoch is a no-op, the new
    // epoch allocates strictly beyond epoch 0 (high-water survived as a prop)
    stream.addData(4L, 5L)
    drainK() // epoch 1 (epoch 0 replay must not double-apply)
    val all = sql("SELECT id, k FROM gss.ns.tid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(all.length === 5, "replay must not re-append epoch 0")
    assert(all.map(_._1).distinct.length === 5, "ids unique ACROSS epochs")
    val e1 = all.filter(t => t._2 >= 4L).map(_._1)
    assert(e1.min > e0.max,
      "epoch 1 must allocate beyond epoch 0's maximum (per-epoch high-water)")
    // the allocation high-water is a committed table prop past every id
    val meta = GraftMeta.read(root.resolve("ns").resolve("tid"))
    val hw = meta.props("graft.identity.next.id").toLong
    assert(hw > all.map(_._1).max, s"high-water $hw must sit beyond all ids")
  }

  test("streamed result equals the equivalent batch append") {
    root
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    sql("DROP TABLE IF EXISTS gss.ns.t4s")
    sql("DROP TABLE IF EXISTS gss.ns.t4b")
    sql("CREATE TABLE gss.ns.t4s (k BIGINT, tag STRING, amt BIGINT) USING parquet")
    sql("CREATE TABLE gss.ns.t4b (k BIGINT, tag STRING, amt BIGINT) USING parquet")
    val rows = (1L to 50L).map(k => (k, if (k % 2 == 0) "e" else "o", k * 3))
    val ckpt = Files.createTempDirectory("gss_ckpt4").toString
    val stream = MemoryStream[(Long, String, Long)]
    stream.addData(rows: _*)
    drain(stream, "t4s", ckpt)
    rows.toDF("k", "tag", "amt").write.mode("append").saveAsTable("gss.ns.t4b")
    val a = sql("SELECT * FROM gss.ns.t4s ORDER BY k").collect().toSeq
    val b = sql("SELECT * FROM gss.ns.t4b ORDER BY k").collect().toSeq
    assert(a === b)
  }

  test("streaming into a z-ordered table routes epochs through cells (r17)") {
    root
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    sql("DROP TABLE IF EXISTS gss.ns.t5z")
    sql("CREATE TABLE gss.ns.t5z (k BIGINT, tag STRING, amt BIGINT) USING parquet")
    sql("INSERT INTO gss.ns.t5z SELECT id, 'x', (id * 13) % 500 FROM range(0, 1000)")
    // cluster on (k, amt): persists the routing spec
    sql("CALL gss.system.rewrite_clustered('ns.t5z', 'k,amt', 4)")
    val ckpt = Files.createTempDirectory("gss_ckpt5z").toString
    val stream = MemoryStream[(Long, String, Long)]
    stream.addData((2000L, "s", 100L), (2001L, "s", 400L), (2002L, "s", 499L))
    drain(stream, "t5z", ckpt)
    assert(count("t5z") === 1003)
    // the epoch landed per-CELL segments: every current segment carries a zc
    // suffix — continuous ingest keeps the grid, no unsuffixed epoch segment
    val meta = GraftMeta.read(root.resolve("ns").resolve("t5z"))
    val segs = meta.snapshots(meta.current)
    assert(segs.forall(_.contains(s"${GraftPartitions.Marker}zc")),
      s"epoch segments must be cell-suffixed, got ${segs.mkString(", ")}")
    // replay stays a no-op on the routed shape too
    drain(stream, "t5z", ckpt)
    assert(count("t5z") === 1003)
    // compact folds the epoch generations into the grid's 4 cells
    sql("CALL gss.system.compact('ns.t5z')")
    assert(GraftMeta.read(root.resolve("ns").resolve("t5z"))
      .snapshots.maxBy(_._1)._2.size <= 4)
    assert(sql("SELECT SUM(amt) FROM gss.ns.t5z WHERE k >= 2000").collect()
      .head.getLong(0) === 999L)
  }
}
