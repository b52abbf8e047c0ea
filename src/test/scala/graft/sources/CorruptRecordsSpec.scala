package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Malformed-input handling on the CSV scan path — the ingestion contract that
  * matters when 100 TB of third-party exports inevitably contain broken lines:
  * PERMISSIVE (default) captures the raw line in a corrupt-record column,
  * DROPMALFORMED silently drops, FAILFAST aborts the scan.
  *
  * Two semantics this spec deliberately pins because they surprise people:
  *  - a TRUNCATED line (fewer columns than the schema) is malformed, same as a
  *    type-corrupt one — but its parsable prefix fields still populate;
  *  - `count()` under DROPMALFORMED can take the no-parse fast path (nothing
  *    requires parsed columns) and report the RAW line count — row-level drop
  *    only applies once parsed columns are materialized. Pipelines must count
  *    AFTER selecting real columns.
  */
class CorruptRecordsSpec extends SparkSpec {

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_corrupt").toFile
    val f = new java.io.File(d, "rows.csv")
    val w = new java.io.PrintWriter(f)
    // 3 good rows, 1 with a non-numeric id, 1 truncated
    try w.print(Seq(
      "1,alpha,10.5",
      "2,beta,20.25",
      "oops,gamma,30.0",
      "4,delta",
      "5,epsilon,50.75").mkString("\n"))
    finally w.close()
    d.getAbsolutePath
  }

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("score", DoubleType),
    StructField("_bad", StringType)))

  test("PERMISSIVE captures malformed lines in the corrupt-record column") {
    val df = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_bad")
      .csv(dir)
      .cache() // the corrupt column is populated during parsing; cache pins one parse
    try {
      assert(df.count() == 5, "every physical line must surface as a row")
      val bad = df.filter(col("_bad").isNotNull)
      // BOTH the type-corrupt and the truncated line are malformed
      assert(bad.count() == 2, "type-corrupt AND truncated lines are malformed")
      assert(bad.collect().map(_.getAs[String]("_bad")).sorted.toSeq ==
        Seq("4,delta", "oops,gamma,30.0"))
      // the truncated line still yields its parsable prefix fields
      val truncated = df.filter(col("name") === "delta").head
      assert(truncated.getAs[Long]("id") == 4L)
      assert(truncated.isNullAt(truncated.fieldIndex("score")))
      // the type-corrupt line null-fills the unparsable field
      val typeBad = df.filter(col("name") === "gamma").head
      assert(typeBad.isNullAt(typeBad.fieldIndex("id")))
      // fully clean rows carry no corrupt record
      assert(df.filter(col("_bad").isNull).count() == 3)
    } finally df.unpersist()
  }

  test("DROPMALFORMED keeps only fully parsable rows; FAILFAST aborts the scan") {
    val keepSchema = StructType(schema.fields.filter(_.name != "_bad"))
    val dropped = spark.read.schema(keepSchema)
      .option("mode", "DROPMALFORMED").csv(dir)
    // the no-parse fast path: a bare count sees the RAW line count — the drop
    // only happens once parsed columns are required
    assert(dropped.count() == 5, "bare count takes the no-parse fast path")
    assert(dropped.select("id", "name", "score").collect().length == 3,
      "materializing parsed columns drops both malformed lines")
    val failing = spark.read.schema(keepSchema)
      .option("mode", "FAILFAST").csv(dir)
    val e = intercept[org.apache.spark.SparkException] { failing.collect() }
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.toLowerCase.contains("malformed") || msg.contains("FAILFAST"),
      s"FAILFAST must abort on the malformed line: $msg")
  }
}
