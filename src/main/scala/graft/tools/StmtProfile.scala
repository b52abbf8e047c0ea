package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Generic per-statement profiler for ANY declared query (r21, guide §1:
  * measure first). A QueryExecutionListener prints every execution the query
  * triggers — each SQL command, procedure-internal action, write job — with
  * its duration and top plan node, so a multi-statement lifecycle fixture
  * (CREATE + INSERT waves + DML + refresh + readout) decomposes into the
  * phases that actually carry the time instead of one aggregate number.
  *
  * Usage: runMain graft.tools.StmtProfile <queryName> [sfDir] [runs]
  * Env: SPARK_GRAFT_CPUS (default 32). Output lines are `[stmt] ...` per
  * execution and `[run] total` per run; run 2+ is the JIT-warm signal.
  */
object StmtProfile {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(
      sys.error("usage: StmtProfile <queryName> [sfDir] [runs]"))
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftSparkExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.install(spark)
    val seq = new AtomicInteger()
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit = {
        val head = qe.logical.nodeName
        val detail = qe.logical.toString.linesIterator.take(1).mkString.take(110)
        println(f"[stmt] #${seq.incrementAndGet()}%03d ${durationNs / 1e9}%8.3f s  " +
          f"$funcName%-16s $head%-28s $detail")
      }
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit =
        println(s"[stmt] FAILED $funcName: ${exception.getMessage}")
    })
    val fn = graft.SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'"))
    (1 to runs).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      // listener delivery is async — give the bus a beat before the footer
      Thread.sleep(500)
      println(f"[run] $i: ${(System.nanoTime() - t0) / 1e9}%8.3f s ($n rows)")
    }
    spark.stop()
  }
}
