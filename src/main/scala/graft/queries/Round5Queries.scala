package graft.queries

import graft.{QDef, Tables => T}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-5 surface: the remaining scan/sink format (native XML), schema-drift
  * union semantics, and the sketch-then-recheck family — the 100 TB pattern where
  * an approximate, mergeable, single-pass structure (Bloom filter, Misra-Gries,
  * HLL) cuts the shuffle volume and an exact recheck restores deterministic
  * results. Also the iterative-graph operator (fixed-iteration PageRank) and the
  * binary-file multimodal ingestion path.
  *
  * All queries follow the SURVEY.md §2b determinism conventions.
  */
object Round5Queries {

  /** Scratch-path scheme shared with SinkQueries: unique per (sfDir, JVM) so spec
    * runs never race Verify; stable within a JVM so Overwrite keeps reruns clean. */
  private def tmp(name: String, sfDir: String): String =
    new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_r5_${name}_${Integer.toHexString(sfDir.hashCode)}_p${ProcessHandle.current().pid()}")
      .getAbsolutePath

  // --------------------------------------------------------------------------
  // q120: XML round-trip — Spark 4's NATIVE XML data source (rowTag-framed
  // records, its own parser/generator distinct from CSV/JSON/parquet/ORC).
  // Same contract shape as q53/q54/q91: write the events projection as XML,
  // read it back with an explicit schema (no inference), aggregate; the oracle
  // computes the same aggregate from the original parquet, so writer, reader,
  // and schema fidelity are all on the hash-checked path. XML is the one
  // text format where element ORDER inside a record is producer-defined, so
  // the read relies on name-addressed fields — exactly what the explicit
  // schema declares.
  // --------------------------------------------------------------------------
  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  private def q120(s: SparkSession, d: String): DataFrame = {
    val dir = tmp("events_xml", d)
    T.events(s, d).select("event_id", "user_id", "event_type", "value")
      .write.mode(SaveMode.Overwrite).option("rowTag", "event").xml(dir)
    s.read.schema(eventsSchema).option("rowTag", "event").xml(dir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        round(sum(col("value")), 2).as("sum_value"),
        min(col("event_id")).as("min_id"),
        max(col("event_id")).as("max_id"))
      .orderBy(col("event_type"))
  }

  private val q120Sql =
    """SELECT event_type, COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users,
       ROUND(SUM(value), 2) AS sum_value,
       MIN(event_id) AS min_id, MAX(event_id) AS max_id
       FROM events GROUP BY event_type ORDER BY event_type"""

  // --------------------------------------------------------------------------
  // q121: unionByName across drifted schemas — the union you actually run at
  // 100 TB, where epoch N+1 of a feed added a column and reordered the rest.
  // Positional UNION would silently pair o_custkey with o_orderkey; BY NAME
  // pairs columns by name and null-fills the column the old epoch lacks
  // (allowMissingColumns). The oracle is DuckDB's UNION ALL BY NAME, which has
  // the identical contract. Downstream agg proves the null-filled column
  // behaves as real SQL NULL (COUNT skips it).
  // --------------------------------------------------------------------------
  private def q121(s: SparkSession, d: String): DataFrame = {
    val o = T.orders(s, d)
    // epoch 1: pre-evolution shape — no priority column, one column order
    val epoch1 = o.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    // epoch 2: evolved shape — extra column, different column order
    val epoch2 = o.filter(col("o_orderkey") % 2 === 1)
      .select(col("o_custkey"), col("o_orderpriority"),
        col("o_totalprice"), col("o_orderkey"))
    epoch1.unionByName(epoch2, allowMissingColumns = true)
      .groupBy((col("o_custkey") % 10).as("cust_bucket"))
      .agg(
        count(lit(1)).as("n"),
        count(col("o_orderpriority")).as("n_with_priority"),
        round(sum(col("o_totalprice")), 2).as("sum_price"),
        max(col("o_orderkey")).as("max_key"))
      .orderBy(col("cust_bucket"))
  }

  private val q121Sql =
    """WITH unioned AS (
         SELECT o_orderkey, o_custkey, o_totalprice
         FROM orders WHERE o_orderkey % 2 = 0
         UNION ALL BY NAME
         SELECT o_custkey, o_orderpriority, o_totalprice, o_orderkey
         FROM orders WHERE o_orderkey % 2 = 1)
       SELECT o_custkey % 10 AS cust_bucket, COUNT(*) AS n,
         COUNT(o_orderpriority) AS n_with_priority,
         ROUND(SUM(o_totalprice), 2) AS sum_price,
         MAX(o_orderkey) AS max_key
       FROM unioned GROUP BY 1 ORDER BY 1"""

  val defs: Seq[QDef] = Seq(
    QDef("q120_xml_roundtrip", q120, Some(q120Sql)),
    QDef("q121_union_by_name", q121, Some(q121Sql)))
}
