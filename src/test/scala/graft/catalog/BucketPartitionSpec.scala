package graft.catalog

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Pins for NATIVE bucket partitioning (`PARTITIONED BY (bucket(n, col))`,
  * GraftBucket + FunctionCatalog): bucket-pure routing, the headline
  * shuffle-free k-only join (transform resolution through the catalog's own
  * bucket function), COW re-routing, compaction purity, the callable
  * function, and the refusal matrix. */
class BucketPartitionSpec extends SparkSpec {

  private lazy val root = {
    val d = java.nio.file.Files.createTempDirectory("graft_bkt")
    spark.conf.set("spark.sql.catalog.gbkt", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gbkt.root", d.toString)
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
    d
  }
  private def sql(q: String) = spark.sql(q)

  private def shuffles(df: DataFrame): Int = {
    df.collect()
    "Exchange hashpartitioning".r
      .findAllIn(df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)).size
  }

  /** Every CURRENT segment's rows must hash (as LONG) to the segment's
    * bucket-id suffix — the purity invariant SPJ keys on. */
  private def assertPure(table: String, name: String, n: Int): Unit = {
    val segs = sql(s"SELECT segment FROM $table.segments WHERE in_current").collect()
      .map(_.getString(0))
    segs.foreach { seg =>
      GraftPartitions.suffixOf(seg).foreach { sfx =>
        val dir = root.resolve("ns").resolve(name).resolve(seg)
        val ks = spark.read.parquet(dir.toString).select("k").collect()
          .map(r => r.get(0).asInstanceOf[Number].longValue())
        ks.foreach(k => assert(GraftBucket.bucketOf(k, n) === sfx.toInt,
          s"row k=$k in segment $seg must hash to bucket ${sfx.toInt}"))
      }
    }
  }

  private lazy val fixture: Unit = {
    root
    sql("CREATE TABLE gbkt.ns.f1 (k BIGINT, v BIGINT) USING parquet PARTITIONED BY (bucket(8, k))")
    sql("CREATE TABLE gbkt.ns.f2 (k BIGINT, w BIGINT) USING parquet PARTITIONED BY (bucket(8, k))")
    sql("INSERT INTO gbkt.ns.f1 SELECT id, id * 3 FROM range(2000)")
    sql("INSERT INTO gbkt.ns.f2 SELECT id, id * 5 FROM range(1500)")
    sql("INSERT INTO gbkt.ns.f1 SELECT id + 10000, id FROM range(200)") // 2nd commit
  }

  test("writes land bucket-pure segments; every value hashes to its suffix") {
    fixture
    val segs = sql("SELECT segment FROM gbkt.ns.f1.segments").collect().map(_.getString(0))
    assert(segs.nonEmpty && segs.forall(_.contains("@")), "every segment carries a bucket suffix")
    val suffixes = segs.flatMap(s => GraftPartitions.suffixOf(s)).distinct
    assert(suffixes.forall(s => s.toInt >= 0 && s.toInt < 8))
    // purity: rows in each segment hash to exactly the segment's bucket id
    assertPure("gbkt.ns.f1", "f1", 8)
  }

  test("HEADLINE: join on k alone plans ZERO exchanges (no bucket conjunct needed)") {
    fixture
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = sql(
        """SELECT COUNT(*) AS n, SUM(f1.v + f2.w) AS s
           FROM gbkt.ns.f1 f1 JOIN gbkt.ns.f2 f2 ON f1.k = f2.k""")
      val n = shuffles(df)
      val row = df.collect().head
      assert(row.getLong(0) === 1500L, "the k-join result must be exact")
      assert(n === 0,
        "both scans report bucket(8, k); the k-join must co-partition with no exchange")
      // and the fallback plan agrees on the answer
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      val plain = sql(
        """SELECT COUNT(*) AS n, SUM(f1.v + f2.w) AS s
           FROM gbkt.ns.f1 f1 JOIN gbkt.ns.f2 f2 ON f1.k = f2.k""").collect().head
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      assert(row.toSeq === plain.toSeq)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("the bucket function is callable and matches the writer's routing") {
    fixture
    val rows = sql("SELECT k, gbkt.bucket(8, k) AS b FROM gbkt.ns.f1 LIMIT 50").collect()
    rows.foreach(r => assert(r.getInt(1) === GraftBucket.bucketOf(r.getLong(0), 8)))
    assert(sql("SELECT gbkt.bucket(16, 'hello') AS b").collect().head.getInt(0) ===
      GraftBucket.bucketOf(org.apache.spark.unsafe.types.UTF8String.fromString("hello"), 16))
  }

  test("one-side shuffle: a plain view hashes INTO the bucket layout via the function") {
    fixture
    // v2.bucketing.shuffle re-partitions ONLY the unreported side, evaluating
    // the catalog's bound bucket function inside Spark's exchange — the
    // strongest end-to-end proof the function IS the layout
    spark.conf.set("spark.sql.sources.v2.bucketing.shuffle.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.range(700).selectExpr("id AS k", "id * 11 AS z").createOrReplaceTempView("plainb")
      val df = sql(
        """SELECT COUNT(*) AS n, SUM(f1.v + p.z) AS s
           FROM gbkt.ns.f1 f1 JOIN plainb p ON f1.k = p.k""")
      assert(df.collect().head.getLong(0) === 700L)
      val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      assert("Exchange keygroupedpartitioning".r.findAllIn(plan).size === 1,
        s"the plain side must hash INTO the bucket grid (one keygrouped exchange):\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"neither side may plan an ordinary join shuffle:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }

  test("COW UPDATE re-routes a changed key to its new bucket; purity holds") {
    root
    sql("CREATE TABLE gbkt.ns.u1 (k BIGINT, v BIGINT) USING parquet PARTITIONED BY (bucket(4, k))")
    sql("INSERT INTO gbkt.ns.u1 SELECT id, id FROM range(100)")
    sql("UPDATE gbkt.ns.u1 SET k = k + 100000 WHERE v < 10") // keys move buckets
    assert(sql("SELECT COUNT(*) FROM gbkt.ns.u1").collect().head.getLong(0) === 100L)
    assertPure("gbkt.ns.u1", "u1", 4)
  }

  test("compaction keeps the bucket layout; SPJ still engages after") {
    fixture
    sql("CALL gbkt.system.compact('ns.f1')")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = sql(
        """SELECT COUNT(*) AS n FROM gbkt.ns.f1 f1 JOIN gbkt.ns.f2 f2 ON f1.k = f2.k""")
      assert(shuffles(df) === 0, "post-compaction segments must still report grouping")
      assert(df.collect().head.getLong(0) === 1500L)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("streaming appends land bucket-pure epochs; SPJ engages on the streamed table") {
    root
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    sql("CREATE TABLE gbkt.ns.s1 (k BIGINT, v BIGINT) USING parquet PARTITIONED BY (bucket(4, k))")
    val stream = MemoryStream[(Long, Long)]
    stream.addData((0L until 300L).map(i => (i, i * 2)): _*)
    val q = stream.toDS().toDF("k", "v").writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("gbkt_ck").toString)
      .trigger(Trigger.AvailableNow()).toTable("gbkt.ns.s1")
    q.awaitTermination(60000)
    assert(sql("SELECT COUNT(*) FROM gbkt.ns.s1").collect().head.getLong(0) === 300L)
    assertPure("gbkt.ns.s1", "s1", 4)
    // the streamed layout is a first-class SPJ side
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      sql("CREATE TABLE gbkt.ns.s2 (k BIGINT, w BIGINT) USING parquet PARTITIONED BY (bucket(4, k))")
      sql("INSERT INTO gbkt.ns.s2 SELECT id, id FROM range(200)")
      val df = sql("SELECT COUNT(*) AS n FROM gbkt.ns.s1 a JOIN gbkt.ns.s2 b ON a.k = b.k")
      assert(shuffles(df) === 0)
      assert(df.collect().head.getLong(0) === 200L)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("SHOW CREATE TABLE renders the bucket transform; the DDL round-trips") {
    fixture
    val ddl = sql("SHOW CREATE TABLE gbkt.ns.f1").collect().head.getString(0)
    assert(ddl.toLowerCase.contains("bucket(8, k)"),
      s"the reported transform must render in the DDL:\n$ddl")
    val roundTrip = ddl.replace("gbkt.ns.f1", "gbkt.ns.f1rt")
    sql(roundTrip)
    sql("INSERT INTO gbkt.ns.f1rt SELECT id, id FROM range(40)")
    assertPure("gbkt.ns.f1rt", "f1rt", 8)
  }

  test("refusal matrix: evolution, source-column DDL, MOR, add_files, dynamic overwrite") {
    fixture
    intercept[Exception] { sql("ALTER TABLE gbkt.ns.f1 RENAME COLUMN k TO key") }
    intercept[Exception] { sql("ALTER TABLE gbkt.ns.f1 DROP COLUMN k") }
    intercept[Exception] {
      sql("ALTER TABLE gbkt.ns.f1 SET TBLPROPERTIES ('graft.bucket-by' = 'v,4')")
    }
    intercept[Exception] {
      sql("ALTER TABLE gbkt.ns.f1 SET TBLPROPERTIES ('graft.partition-by' = 'v')")
    }
    intercept[Exception] {
      sql("ALTER TABLE gbkt.ns.f1 SET TBLPROPERTIES ('graft.update-mode' = 'merge-on-read')")
    }
    intercept[Exception] {
      sql("""CREATE TABLE gbkt.ns.bad (k BIGINT, v BIGINT) USING parquet
             PARTITIONED BY (bucket(4, k)) TBLPROPERTIES ('graft.delete-mode' = 'merge-on-read')""")
    }
    intercept[Exception] {
      sql("""CREATE TABLE gbkt.ns.bad2 (k BIGINT, geo STRING) USING parquet
             PARTITIONED BY (bucket(4, k), geo)""")
    }
    intercept[Exception] { // dynamic overwrite refuses on bucket tables
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try sql("INSERT OVERWRITE TABLE gbkt.ns.f1 SELECT id, id FROM range(5)")
      finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    }
    // integral widening of the source col IS allowed (hash promotes to long)
    sql("CREATE TABLE gbkt.ns.w1 (k INT, v BIGINT) USING parquet PARTITIONED BY (bucket(4, k))")
    sql("INSERT INTO gbkt.ns.w1 SELECT CAST(id AS INT), id FROM range(50)")
    sql("ALTER TABLE gbkt.ns.w1 ALTER COLUMN k TYPE BIGINT")
    sql("INSERT INTO gbkt.ns.w1 SELECT id + 1000000, id FROM range(50)")
    assert(sql("SELECT COUNT(DISTINCT k) FROM gbkt.ns.w1").collect().head.getLong(0) === 100L)
    assertPure("gbkt.ns.w1", "w1", 4)
  }
}
