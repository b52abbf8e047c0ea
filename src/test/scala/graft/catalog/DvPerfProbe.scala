package graft.catalog

import org.apache.spark.sql.SparkSession

/** Scratch probe (test scope, not a test): measure the merge-on-read READ
  * penalty — a snapshot carrying any delete vector scans row-based instead
  * of vectorized-columnar — and its recovery via rewrite_deletes. Feeds the
  * SURVEY §6 numbers. */
object DvPerfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = java.nio.file.Files.createTempDirectory("dv_perf").toString
    spark.conf.set("spark.sql.catalog.gperf", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gperf.root", root)

    val sf = "/root/testdata/sf0.1"
    spark.read.parquet(s"$sf/lineitem.parquet").createOrReplaceTempView("li")
    spark.sql("""CREATE TABLE gperf.ns.li
      TBLPROPERTIES ('graft.delete-mode' = 'merge-on-read') AS
      SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice, l_shipdate FROM li""")
    val n = spark.sql("SELECT COUNT(*) FROM gperf.ns.li").head.getLong(0)
    println(s"rows = $n")

    def time(label: String, q: String, runs: Int = 5): Double = {
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        spark.sql(q).collect()
        (System.nanoTime() - t0) / 1e9
      }
      val med = times.sorted.apply(runs / 2)
      println(f"$label: median $med%.3f s (${times.map(t => f"$t%.2f").mkString(", ")})")
      med
    }

    // full-scan aggregate that cannot be served from stats (SUM)
    val q = "SELECT CAST(SUM(l_quantity) AS BIGINT), CAST(SUM(l_extendedprice) AS BIGINT) FROM gperf.ns.li"
    val clean = time("clean (vectorized)", q)
    val victim = spark.sql(
      "SELECT l_orderkey, l_partkey FROM gperf.ns.li ORDER BY l_orderkey, l_partkey LIMIT 1").head
    spark.sql(s"DELETE FROM gperf.ns.li WHERE l_orderkey = ${victim.getLong(0)} " +
      s"AND l_partkey = ${victim.getLong(1)}")
    val dv = spark.sql("SELECT * FROM gperf.ns.li.segments").collect()
    println("segments with vectors: " + dv.count(_.getInt(5) > 0))
    val dirty = time("1-row vector (row-based)", q)
    spark.sql("CALL gperf.system.rewrite_deletes('ns.li')")
    val restored = time("after rewrite_deletes (vectorized)", q)
    println(f"penalty = ${dirty / clean}%.2fx while dirty; restored ratio = ${restored / clean}%.2fx")
    spark.stop()
  }
}
