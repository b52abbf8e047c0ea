package graft

import org.apache.spark.sql.SparkSession

/** Scratch probe (test scope): physical-plan audit of the round-15 analytics
  * queries at sf0.01 — join strategies and exchange counts. Not a test. */
object Round15PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.01"
    for (q <- Seq("q245_autocorrelation", "q247_rolling_distinct_users",
        "q250_product_quantization", "q255_rfm_segmentation",
        "q261_gini_coefficient")) {
      val df = Registry.byName(q).fn(spark, sf)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      println(s"===== $q =====")
      println("BroadcastHashJoin: " + plan.split("BroadcastHashJoin").length / 1)
      println("SortMergeJoin:     " + (plan.split("SortMergeJoin").length - 1))
      println("Exchange:          " + (plan.split("Exchange").length - 1))
      println("CartesianProduct:  " + (plan.split("CartesianProduct").length - 1))
      println(plan.take(1500))
    }
    spark.stop()
  }
}
