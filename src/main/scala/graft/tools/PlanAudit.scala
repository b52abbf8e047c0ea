package graft.tools
import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftSparkExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    for (n <- Seq("q297_identity_partitioned", "q298_string_minmax_zero_io",
                  "q299_table_function_inline", "q300_kll_quantile_stats",
                  "q301_clustered_steady_state")) {
      val df = graft.SparkEntry.queries(n)(spark, d)
      val p = df.queryExecution.executedPlan.toString
      println(s"===== $n =====")
      println(p.linesIterator.filter(l =>
        l.contains("Scan") || l.contains("Exchange") || l.contains("Join") ||
        l.contains("graft-stats-agg") || l.contains("WholeStageCodegen"))
        .take(14).mkString("\n"))
    }
    spark.stop()
  }
}
