package graft

import org.apache.spark.sql.SparkSession

/** Scratch probe (test scope): print final AQE plans for the heaviest queries so
  * PlanSpec pins can be written against measured shapes. Not a test. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    for (q <- Seq("q03_star_join_revenue", "q36_lsh_candidates", "q44_cosine_neardup",
        "q60_ann_ivf", "q65_outer_join_variants", "q68_band_join_rule")) {
      val df = Registry.byName(q).fn(spark, sf)
      df.collect()
      val full = df.queryExecution.executedPlan.toString
      val fin = full.split("== Initial Plan ==")(0)
      println(s"===== $q =====")
      println(fin)
    }
    spark.stop()
  }
}
