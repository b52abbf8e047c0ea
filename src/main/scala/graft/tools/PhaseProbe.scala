package graft.tools

import org.apache.spark.sql.SparkSession

/** Phase-timing probe for a declared query's lifecycle statements (r18,
  * verdict item 5: root-cause q276_mv_minmax's min move). Runs the q276
  * statement sequence with a wall clock around every statement, twice, and
  * prints per-phase seconds — isolating WHICH phase (ingest, MOR DML, MV
  * refresh, readout) carries a regression that the end-to-end bench number
  * can only show in aggregate. */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftSparkExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.install(spark)
    spark.conf.set("spark.sql.catalog.graft", classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.root", java.nio.file.Files.createTempDirectory("probe276").toString)
    graft.Tables.orders(spark, sfDir).createOrReplaceTempView("po_orders")

    def phase(name: String)(sql: String): Unit = {
      val t0 = System.nanoTime()
      spark.sql(sql).count()
      println(f"[phase] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    (1 to 2).foreach { round =>
      println(s"== round $round ==")
      spark.sql("DROP TABLE IF EXISTS graft.lake.probe276_mv")
      spark.sql("DROP TABLE IF EXISTS graft.lake.probe276")
      phase("create")("""CREATE TABLE graft.lake.probe276 (k BIGINT, b BIGINT, price_c BIGINT)
        USING parquet
        TBLPROPERTIES ('graft.delete-mode' = 'merge-on-read',
                       'graft.update-mode' = 'merge-on-read')""")
      phase("insert_wave0")("""INSERT INTO graft.lake.probe276
        SELECT o_orderkey, o_orderkey % 23, CAST(FLOOR(o_totalprice * 100) AS BIGINT)
        FROM po_orders WHERE o_orderkey % 2 = 0""")
      phase("create_mv")("CALL graft.system.create_mv('lake.probe276_mv', 'lake.probe276', " +
        "keys => 'b', sums => 'price_c', mins => 'price_c', maxs => 'price_c')")
      phase("insert_wave1")("""INSERT INTO graft.lake.probe276
        SELECT o_orderkey, o_orderkey % 23, CAST(FLOOR(o_totalprice * 100) AS BIGINT)
        FROM po_orders WHERE o_orderkey % 2 = 1""")
      phase("mor_delete")("DELETE FROM graft.lake.probe276 WHERE k % 14 = 0")
      phase("mor_update")("UPDATE graft.lake.probe276 SET price_c = price_c * 3 WHERE k % 19 = 0")
      phase("refresh_mv")("CALL graft.system.refresh_mv('lake.probe276_mv')")
      phase("readout")("""SELECT b, n_rows, CAST(sum_price_c AS BIGINT) AS sum_price_c,
        min_price_c, max_price_c FROM graft.lake.probe276_mv ORDER BY b""")
    }
    spark.stop()
  }
}
