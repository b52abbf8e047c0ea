package graft.catalog

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Probe (kept as a pin): Spark's READ-side existence-default mechanism —
  * a StructField whose metadata carries EXISTS_DEFAULT fills that value
  * (not NULL) for files written before the column existed. This is the
  * substrate an `ADD COLUMN ... DEFAULT` catalog surface rides on. */
class ExistsDefaultProbeSpec extends SparkSpec {

  test("missing parquet column with EXISTS_DEFAULT metadata reads as the default") {
    val dir = Files.createTempDirectory("exdef").toFile.getAbsolutePath
    val pre = StructType(Seq(StructField("k", LongType)))
    spark.createDataFrame(java.util.Arrays.asList(Row(1L), Row(2L)), pre)
      .write.mode("overwrite").parquet(dir)
    val withDefault = StructType(Seq(
      StructField("k", LongType),
      StructField("score", LongType, nullable = true,
        new MetadataBuilder()
          .putString("EXISTS_DEFAULT", "42")
          .putString("CURRENT_DEFAULT", "42").build())))
    val rows = spark.read.schema(withDefault).parquet(dir)
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(rows.sorted.toSeq === Seq((1L, 42L), (2L, 42L)),
      s"EXISTS_DEFAULT must fill 42 for pre-ADD files, got ${rows.toSeq}")
  }
}
