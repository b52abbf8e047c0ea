package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md / FIXTURES.md §A).
  *
  * All queries receive `(spark, sfDir)` and read parquet from that directory, so the
  * same definition runs at any scale factor. At cluster scale these reads are plain
  * parquet scans — Catalyst handles column pruning + predicate pushdown into the scan.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  /** `events.ts` has shipped in two physical forms across testdata
    * generations: parquet TIMESTAMP(NANOS) (which Spark's vectorized reader
    * rejects — read as a raw long via the legacy flag and floor-divide to µs,
    * the same truncation DuckDB applies) and plain timestamp[us] written
    * without a timezone (read as TIMESTAMP_NTZ — cast to TIMESTAMP, identical
    * wall-clock under the pinned UTC session). Dispatch on the footer type so
    * either generation loads to the same µs-precision TIMESTAMP column. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}

/** One declared engine query: a Spark (DataFrame-first) definition plus, when the
  * semantics are ANSI-SQL-expressible, an equivalent DuckDB oracle query. The driver
  * hash-compares the two on sf0.01 (BASELINE.md t2 gate).
  *
  * Determinism conventions (SURVEY.md §2b): every query ends with ORDER BY on a unique
  * key or all columns; float outputs are ROUND(x, 2); timestamps are emitted as
  * formatted strings (never raw, to sidestep ns-vs-µs parquet differences); DuckDB
  * integer SUMs are cast back to BIGINT (DuckDB widens to HUGEINT).
  */
final case class QDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Registry {
  lazy val all: Seq[QDef] =
    queries.RelationalQueries.defs ++
      queries.ScalarQueries.defs ++
      queries.TextQueries.defs ++
      queries.VectorQueries.defs ++
      queries.EventQueries.defs ++
      queries.PipelineQueries.defs ++
      queries.SinkQueries.defs ++
      queries.ExtraQueries.defs ++
      queries.Round4Queries.defs ++
      queries.CorpusQueries.defs ++
      queries.Round5Queries.defs ++
      queries.Round6Queries.defs ++
      queries.Round7Queries.defs ++
      queries.LakeQueries.defs ++
      queries.Round8Queries.defs ++
      queries.Round9Queries.defs ++
      queries.Round12Queries.defs ++
      queries.Round10Queries.defs ++
      queries.Round11Queries.defs ++
      queries.Round13Queries.defs ++
      queries.Round14Queries.defs ++
      queries.Round15Queries.defs ++
      queries.Round16Queries.defs ++
      queries.Round17Queries.defs ++
      queries.Round18Queries.defs ++
      queries.Round19Queries.defs ++
      queries.Round20Queries.defs ++
      queries.Round21Queries.defs ++
      queries.Round22Queries.defs

  lazy val byName: Map[String, QDef] = all.map(q => q.name -> q).toMap
}
