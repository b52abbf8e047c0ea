package graft.tools

import org.apache.spark.sql.SparkSession

/** Interleaved JIT-fair A/B for the zcell codegen contract (r18, verdict
  * item 6): the q301-shape routed APPEND timed alternately with the magic
  * `invoke` overloads (codegen'd Invoke in the distribution shuffle's hash)
  * and with the produceResult-only binding (row-boxed
  * ApplyFunctionExpression), in ONE JVM so JIT warm-up cannot masquerade as
  * the difference. Prints per-append seconds and the two medians. */
object ZCellAb {
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
    spark.conf.set("spark.sql.catalog.gab", classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gab.root",
      java.nio.file.Files.createTempDirectory("zcell_ab").toString)
    graft.Tables.orders(spark, sfDir).createOrReplaceTempView("ab_orders")

    spark.sql("CREATE TABLE gab.ns.zab (k BIGINT, a BIGINT, b BIGINT, cents BIGINT) USING parquet")
    spark.sql("""INSERT INTO gab.ns.zab
      SELECT o_orderkey, o_custkey % 1000, o_orderkey % 997,
             CAST(FLOOR(o_totalprice * 100) AS BIGINT)
      FROM ab_orders WHERE o_orderkey % 11 = 0""")
    spark.sql("CALL gab.system.rewrite_clustered('ns.zab', 'a,b', 8)")

    def append(wave: Int): Double = {
      val t0 = System.nanoTime()
      spark.sql(s"""INSERT INTO gab.ns.zab
        SELECT o_orderkey + ${wave * 100000000L}, o_custkey % 1000, o_orderkey % 997,
               CAST(FLOOR(o_totalprice * 100) AS BIGINT)
        FROM ab_orders WHERE o_orderkey % 11 = 1""")
      (System.nanoTime() - t0) / 1e9
    }
    // warm both paths once, then interleave 5 pairs
    System.setProperty("graft.zcell.nomagic", "false"); append(0)
    System.setProperty("graft.zcell.nomagic", "true"); append(1)
    val magic = scala.collection.mutable.ArrayBuffer.empty[Double]
    val boxed = scala.collection.mutable.ArrayBuffer.empty[Double]
    (0 until 5).foreach { i =>
      System.setProperty("graft.zcell.nomagic", "false")
      magic += append(2 + 2 * i)
      System.setProperty("graft.zcell.nomagic", "true")
      boxed += append(3 + 2 * i)
    }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.length / 2)
    println(f"[zcell-ab] magic-invoke appends: ${magic.map(t => f"$t%.3f").mkString(", ")}")
    println(f"[zcell-ab] produceResult appends: ${boxed.map(t => f"$t%.3f").mkString(", ")}")
    println(f"[zcell-ab] medians: magic=${med(magic.toSeq)}%.3f s, boxed=${med(boxed.toSeq)}%.3f s")
    spark.stop()
  }
}
