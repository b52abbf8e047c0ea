package graft.catalog

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Scratch probe (kept as a pin): Spark's native parquet field-id resolution —
  * the mechanism the graft catalog's column RENAME rides on. Verifies, against
  * the actual Spark build, that (a) writes stamp footer field ids when the
  * schema carries `parquet.field.id` metadata, (b) with
  * `spark.sql.parquet.fieldId.read.enabled` a read schema carrying ids
  * resolves by ID (a renamed column still reads the old physical column), and
  * (c) filters pushed on the renamed name still return correct rows. */
class FieldIdProbeSpec extends SparkSpec {

  private def idField(name: String, dt: DataType, id: Int): StructField =
    StructField(name, dt, nullable = true,
      new MetadataBuilder().putLong("parquet.field.id", id).build())

  test("field-id write + rename read-through + filter pushdown") {
    val dir = Files.createTempDirectory("fid").toFile.getAbsolutePath
    val writeSchema = StructType(Seq(
      idField("k", LongType, 1), idField("v", StringType, 2)))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, "a"), Row(2L, "b")), writeSchema)
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    df.write.mode("overwrite").parquet(dir)

    // footer check: ids present
    val f = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet")).head
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f.getAbsolutePath),
        new org.apache.hadoop.conf.Configuration()))
    val ids = try reader.getFooter.getFileMetaData.getSchema.getFields
      .toArray.map(_.asInstanceOf[org.apache.parquet.schema.Type].getId)
    finally reader.close()
    assert(ids.forall(_ != null), s"footer ids missing: ${ids.mkString(",")}")

    // rename k -> key (same id), read by id
    spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    try {
      val renamed = StructType(Seq(
        idField("key", LongType, 1), idField("v", StringType, 2)))
      val back = spark.read.schema(renamed).parquet(dir)
      assert(back.select("key").collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
      // filter pushdown on the renamed name over the old physical file
      assert(back.where("key = 2").collect().map(_.getString(1)).toSeq === Seq("b"))
      // (the DSv2 ParquetTable path GraftTable delegates to is pinned
      // end-to-end by RenameColumnSpec)
    } finally spark.conf.unset("spark.sql.parquet.fieldId.read.enabled")
  }

  test("MIXED read schema: id-annotated fields resolve by id, id-less fields by name") {
    // the DV scan appends an id-less row-index field to an id-annotated table
    // schema — per-field fallback must hold or the merge-on-read path breaks
    val dir = Files.createTempDirectory("fid3").toFile.getAbsolutePath
    val writeSchema = StructType(Seq(
      idField("k", LongType, 1), idField("extra", StringType, 2)))
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    spark.createDataFrame(java.util.Arrays.asList(Row(7L, "x")), writeSchema)
      .write.mode("overwrite").parquet(dir)
    spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    try {
      val mixed = StructType(Seq(
        idField("key", LongType, 1),                    // by id (renamed)
        StructField("extra", StringType, nullable = true))) // by name (no id)
      val row = spark.read.schema(mixed).parquet(dir).collect().head
      assert(row.getLong(0) === 7L && row.getString(1) === "x")
    } finally spark.conf.unset("spark.sql.parquet.fieldId.read.enabled")
  }

  test("file WITHOUT footer ids + id-annotated read schema: refuses (no silent nulls)") {
    val dir = Files.createTempDirectory("fid2").toFile.getAbsolutePath
    val plain = StructType(Seq(
      StructField("k", LongType), StructField("v", StringType)))
    spark.createDataFrame(java.util.Arrays.asList(Row(1L, "a")), plain)
      .write.mode("overwrite").parquet(dir)
    spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    try {
      val withIds = StructType(Seq(
        idField("key", LongType, 1), idField("v", StringType, 2)))
      val ex = intercept[Exception] {
        spark.read.schema(withIds).parquet(dir).collect()
      }
      assert(ex != null)
    } finally spark.conf.unset("spark.sql.parquet.fieldId.read.enabled")
  }
}
