package graft.catalog

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.types._

/** Probe (kept as a pin): Spark 4's native parquet TYPE WIDENING — reading a
  * file whose physical column is narrower than the requested schema. The
  * set that holds natively is the substrate an `ALTER COLUMN ... TYPE`
  * widening surface rides on. */
class TypeWideningProbeSpec extends SparkSpec {

  test("parquet reads widen int32->int64, float->double, smallint->int natively") {
    val dir = Files.createTempDirectory("widen").toString
    spark.range(3).selectExpr(
      "CAST(id AS INT) AS k", "CAST(id AS FLOAT) AS f",
      "CAST(id AS SMALLINT) AS s", "CAST(id AS INT) AS d")
      .write.mode("overwrite").parquet(dir)
    val wide = StructType(Seq(
      StructField("k", LongType), StructField("f", DoubleType),
      StructField("s", IntegerType), StructField("d", DecimalType(20, 0))))
    val rows = spark.read.schema(wide).parquet(dir)
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2), r.getDecimal(3).longValue()))
    assert(rows.toSeq === Seq((0L, 0.0, 0, 0L), (1L, 1.0, 1, 1L), (2L, 2.0, 2, 2L)))
  }

  test("int32->double and date->timestamp_ntz also widen") {
    val dir = Files.createTempDirectory("widen2").toString
    spark.sql("SELECT 1 AS k, DATE'2026-01-02' AS dt").write.mode("overwrite").parquet(dir)
    val wide = StructType(Seq(
      StructField("k", DoubleType), StructField("dt", TimestampNTZType)))
    val r = spark.read.schema(wide).parquet(dir).collect().head
    assert(r.getDouble(0) === 1.0)
    assert(r.getAs[java.time.LocalDateTime](1).toLocalDate.toString === "2026-01-02")
  }
}
