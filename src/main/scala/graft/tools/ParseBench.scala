package graft.tools

import org.apache.spark.sql.SparkSession

/** Isolated A/B for the GraftViewParser interceptor's per-statement cost
  * (VERDICT r16 "What's wrong #1"): parses the same statement through a
  * plain session's parser and a graft-extensions session's parser,
  * interleaved A/B/A/B so JIT warm-up and profile pollution cancel out.
  * Run: `sbt "runMain graft.tools.ParseBench"`. */
object ParseBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftSparkExtensions")
      .config("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
      .config("spark.sql.catalog.graft.root", "/tmp/parsebench_cat")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val withExt = spark.sessionState.sqlParser
    val plain = org.apache.spark.sql.classic.SparkSession
      .builder().master("local[4]").getOrCreate()
      .newSession().sessionState.sqlParser
    val sql = """SELECT c_custkey, substring_index(c_name, '-', 2) AS a,
                 overlay(c_name, 'XXXX', 10, 4) AS b, elt(c_custkey % 3 + 1, 'x','y','z') AS c,
                 format_number(c_acctbal, 0) AS d, soundex(c_mktsegment) AS e,
                 (SELECT max(o_totalprice) FROM orders WHERE o_custkey = c_custkey) AS f
                 FROM customer WHERE c_acctbal > 0 GROUP BY ALL HAVING count(*) > 1 ORDER BY 1"""
    def time(p: org.apache.spark.sql.catalyst.parser.ParserInterface, n: Int): Double = {
      val t0 = System.nanoTime()
      (1 to n).foreach(_ => p.parsePlan(sql))
      (System.nanoTime() - t0) / 1e3 / n
    }
    // interleaved warm-up so both parsers' code paths JIT together
    (1 to 4).foreach { _ => time(plain, 500); time(withExt, 500) }
    val rounds = (1 to 5).map(_ => (time(plain, 2000), time(withExt, 2000)))
    val p = rounds.map(_._1).min
    val w = rounds.map(_._2).min
    println(f"plain-parser:       $p%.1f us/statement (min of 5 rounds)")
    println(f"interceptor-parser: $w%.1f us/statement (min of 5 rounds)")
    println(f"interceptor tax:    ${w - p}%.1f us/statement")
    spark.stop()
  }
}
