package graft.queries

import graft.{QDef, Tables => T}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scan/sink contract rows (SURVEY.md §2b): CSV and JSON round-trips with explicit
  * schemas, parquet sink, and the approximate-distinct aggregate. Round-trip queries
  * write the events projection to the format under test, read it back, and aggregate;
  * the DuckDB oracle computes the same aggregate from the original parquet — so the
  * sink, the scan, and schema fidelity are all on the hash-checked path.
  */
object SinkQueries {

  private def tmp(name: String): String =
    new java.io.File(System.getProperty("java.io.tmpdir"), s"graft_sink_$name").getAbsolutePath

  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  private def roundtripAgg(back: DataFrame): DataFrame =
    back.groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        round(sum(col("value")), 2).as("sum_value"),
        min(col("event_id")).as("min_id"),
        max(col("event_id")).as("max_id"))
      .orderBy(col("event_type"))

  private val aggSql =
    """SELECT event_type, COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users,
       ROUND(SUM(value), 2) AS sum_value,
       MIN(event_id) AS min_id, MAX(event_id) AS max_id
       FROM events GROUP BY event_type ORDER BY event_type"""

  /** CSV sink + scan with an explicit schema (no inference on the read). */
  private def q53(s: SparkSession, d: String): DataFrame = {
    val dir = tmp("events_csv")
    T.events(s, d).select("event_id", "user_id", "event_type", "value")
      .write.mode(SaveMode.Overwrite).option("header", "true").csv(dir)
    roundtripAgg(s.read.schema(eventsSchema).option("header", "true").csv(dir))
  }

  /** JSON-lines sink + scan with an explicit schema. */
  private def q54(s: SparkSession, d: String): DataFrame = {
    val dir = tmp("events_json")
    T.events(s, d).select("event_id", "user_id", "event_type", "value")
      .write.mode(SaveMode.Overwrite).json(dir)
    roundtripAgg(s.read.schema(eventsSchema).json(dir))
  }

  /** Parquet sink + scan (the write path Verify itself exercises, here declared). */
  private def q55(s: SparkSession, d: String): DataFrame = {
    val dir = tmp("lineitem_parquet")
    T.lineitem(s, d).filter(col("l_quantity") >= 25)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
      .write.mode(SaveMode.Overwrite).parquet(dir)
    s.read.parquet(dir)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sum_qty"))
      .orderBy(col("l_returnflag"))
  }

  private val q55Sql =
    """SELECT l_returnflag, COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS sum_qty
       FROM lineitem WHERE l_quantity >= 25
       GROUP BY l_returnflag ORDER BY l_returnflag"""

  /** HyperLogLog approximate distinct — declared rows-only (approx operators are
    * excluded from hash-match per the determinism conventions; the spec asserts the
    * estimate lands within rsd bounds of the exact count). */
  private def q56(s: SparkSession, d: String): DataFrame =
    T.lineitem(s, d)
      .agg(
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"))
      .orderBy(col("approx_parts"))

  val defs: Seq[QDef] = Seq(
    QDef("q53_csv_roundtrip", q53, Some(aggSql)),
    QDef("q54_json_roundtrip", q54, Some(aggSql)),
    QDef("q55_parquet_sink", q55, Some(q55Sql)),
    QDef("q56_approx_distinct", q56, None),
  )
}
