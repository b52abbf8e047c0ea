package graft

import org.apache.spark.sql.SparkSession

/** Scratch probe (test scope, not a test): the driver's first gate — entry()
  * returns rows and the registry maps are consistent. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    println("ENTRY_ROWS=" + SparkEntry.entry(s).count())
    println("QUERIES=" + SparkEntry.queries.size + " ORACLES=" + SparkEntry.oracleSql.size)
    s.stop()
  }
}
