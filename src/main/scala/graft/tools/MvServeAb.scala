package graft.tools

import org.apache.spark.sql.SparkSession

/** Interleaved A/B for the MV SERVING win (r19, verdict item 6): the q304
  * aggregate over a FRESH materialized view, timed alternately with the
  * transparent rewrite ON (answers from the O(groups) MV) and OFF
  * (`spark.graft.mv.rewrite=false` — full fact-table aggregate), in ONE JVM
  * so JIT warm-up cannot masquerade as the difference. The q304 bench median
  * deliberately embeds the whole create+DML+refresh lifecycle; THIS probe
  * isolates the steady-state serving cost the feature exists for. Prints
  * per-run seconds, medians, and the ratio. */
object MvServeAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    // optional fact multiplier: lands `waves` offset copies of orders, so
    // the probe separates O(table) from O(groups) even where one orders
    // scan is fixed-overhead-dominated (sf0.1 reads ~0.5 s both ways)
    val waves = args.drop(1).headOption.map(_.toInt).getOrElse(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftSparkExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.install(spark)
    spark.conf.set("spark.sql.catalog.gmv", classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gmv.root",
      java.nio.file.Files.createTempDirectory("mv_ab").toString)
    graft.Tables.orders(spark, sfDir).createOrReplaceTempView("ab_orders")

    spark.sql("CREATE TABLE gmv.ns.fact (k BIGINT, b BIGINT, m BIGINT, cents BIGINT) USING parquet")
    (0 until waves).foreach { w =>
      spark.sql(s"""INSERT INTO gmv.ns.fact
        SELECT o_orderkey + ${w * 1000000000L}, o_custkey % 17, o_orderkey % 5,
               CAST(FLOOR(o_totalprice * 100) AS BIGINT)
        FROM ab_orders""")
    }
    val factRows = spark.sql("SELECT COUNT(*) FROM gmv.ns.fact").collect().head.getLong(0)
    println(s"[mv-ab] fact rows: $factRows (waves=$waves), groups: 85 (17x5)")
    spark.sql("CALL gmv.system.create_mv('ns.fact_mv', 'ns.fact', " +
      "keys => 'b,m', sums => 'cents', mins => 'cents', maxs => 'cents')")

    val q = """SELECT b, COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS total_c,
                      ROUND(AVG(cents), 2) AS avg_c, MIN(cents) AS mn, MAX(cents) AS mx
               FROM gmv.ns.fact WHERE m = 2 GROUP BY b ORDER BY b"""
    def run(): Double = {
      val t0 = System.nanoTime()
      spark.sql(q).collect()
      (System.nanoTime() - t0) / 1e9
    }
    // sanity: with the rewrite on, the plan must scan the MV, not the fact
    val plan = spark.sql(q).queryExecution.executedPlan.toString
    require(plan.contains("gmv.ns.fact_mv["),
      s"probe invalid — the rewrite did not serve from the MV:\n$plan")

    spark.conf.set("spark.graft.mv.rewrite", "true"); run()   // warm served path
    spark.conf.set("spark.graft.mv.rewrite", "false"); run()  // warm direct path
    val served = scala.collection.mutable.ArrayBuffer.empty[Double]
    val direct = scala.collection.mutable.ArrayBuffer.empty[Double]
    (0 until 5).foreach { _ =>
      spark.conf.set("spark.graft.mv.rewrite", "true");  served += run()
      spark.conf.set("spark.graft.mv.rewrite", "false"); direct += run()
    }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.length / 2)
    println(f"[mv-ab] served (rewrite on):  ${served.map(t => f"$t%.3f").mkString(", ")}")
    println(f"[mv-ab] direct (rewrite off): ${direct.map(t => f"$t%.3f").mkString(", ")}")
    println(f"[mv-ab] medians: served=${med(served.toSeq)}%.4f s, " +
      f"direct=${med(direct.toSeq)}%.4f s, " +
      f"ratio=${med(direct.toSeq) / med(served.toSeq)}%.1fx (sf=$sfDir)")

    // ---- second probe (r20): the STAR + COMPUTED-KEY shape -------------
    // "monthly revenue by region": fact ⋈ dim GROUP BY dim.name, month(d),
    // served from an MV keyed (region, month(d) AS m). Same interleaved
    // on/off discipline in the same JVM.
    spark.conf.set("spark.graft.mv.rewrite", "true")
    spark.sql("CREATE TABLE gmv.ns.fact2 (k BIGINT, region BIGINT, d DATE, cents BIGINT) USING parquet")
    (0 until waves).foreach { w =>
      spark.sql(s"""INSERT INTO gmv.ns.fact2
        SELECT o_orderkey + ${w * 1000000000L}, o_custkey % 12, o_orderdate,
               CAST(FLOOR(o_totalprice * 100) AS BIGINT)
        FROM ab_orders""")
    }
    spark.sql("CALL gmv.system.create_mv('ns.fact2_mv', 'ns.fact2', " +
      "keys => 'region, month(d) AS m', sums => 'cents')")
    spark.sql("""SELECT id AS region, concat('r', CAST(id AS STRING)) AS name
                 FROM range(0, 10)""").createOrReplaceTempView("ab_dim")
    val q2 = """SELECT dr.name, month(f.d) AS m, COUNT(*) AS n,
                       CAST(SUM(f.cents) AS BIGINT) AS total_c,
                       ROUND(AVG(f.cents), 2) AS avg_c
                FROM gmv.ns.fact2 f JOIN ab_dim dr ON f.region = dr.region
                GROUP BY dr.name, month(f.d) ORDER BY dr.name, m"""
    def run2(): Double = {
      val t0 = System.nanoTime()
      spark.sql(q2).collect()
      (System.nanoTime() - t0) / 1e9
    }
    val plan2 = spark.sql(q2).queryExecution.executedPlan.toString
    require(plan2.contains("gmv.ns.fact2_mv["),
      s"probe invalid — the star+computed rewrite did not serve:\n$plan2")
    spark.conf.set("spark.graft.mv.rewrite", "true"); run2()
    spark.conf.set("spark.graft.mv.rewrite", "false"); run2()
    val served2 = scala.collection.mutable.ArrayBuffer.empty[Double]
    val direct2 = scala.collection.mutable.ArrayBuffer.empty[Double]
    (0 until 5).foreach { _ =>
      spark.conf.set("spark.graft.mv.rewrite", "true");  served2 += run2()
      spark.conf.set("spark.graft.mv.rewrite", "false"); direct2 += run2()
    }
    println(f"[mv-ab-star] served (rewrite on):  ${served2.map(t => f"$t%.3f").mkString(", ")}")
    println(f"[mv-ab-star] direct (rewrite off): ${direct2.map(t => f"$t%.3f").mkString(", ")}")
    println(f"[mv-ab-star] medians: served=${med(served2.toSeq)}%.4f s, " +
      f"direct=${med(direct2.toSeq)}%.4f s, " +
      f"ratio=${med(direct2.toSeq) / med(served2.toSeq)}%.1fx (sf=$sfDir, waves=$waves)")
    spark.stop()
  }
}
