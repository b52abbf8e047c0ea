package graft.catalog

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Scratch probe (kept as a pin): Spark's native parquet field-id machinery
  * at NESTED levels — the mechanism a recursive-id schema evolution
  * (Iceberg v2 contract: struct members survive rename/widening) would ride
  * on. Verifies against the actual Spark build that (a) writes stamp ids on
  * nested group members, (b) an id-annotated read schema resolves a RENAMED
  * struct member by id, (c) a NEW member id absent from old files null-fills
  * (the nested add-column contract), and (d) nested member widening upcasts. */
class NestedFieldIdProbeSpec extends SparkSpec {

  private def idMeta(id: Int) =
    new MetadataBuilder().putLong("parquet.field.id", id).build()
  private def idField(name: String, dt: DataType, id: Int): StructField =
    StructField(name, dt, nullable = true, idMeta(id))

  private def writeNested(dir: String): Unit = {
    val inner = StructType(Seq(idField("a", IntegerType, 3), idField("b", LongType, 4)))
    val schema = StructType(Seq(idField("k", LongType, 1), idField("s", inner, 2)))
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, Row(10, 100L)), Row(2L, Row(20, 200L))), schema)
      .write.mode("overwrite").parquet(dir)
  }

  test("nested ids land in footers; renamed member resolves BY ID; filters stay correct") {
    val dir = Files.createTempDirectory("nfid").toFile.getAbsolutePath
    writeNested(dir)
    // footer: the inner group's members carry ids
    val f = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet")).head
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f.getAbsolutePath),
        new org.apache.hadoop.conf.Configuration()))
    val inner = try reader.getFooter.getFileMetaData.getSchema
      .getType(Seq("s"): _*).asGroupType()
    finally reader.close()
    assert(inner.getId != null, "outer struct id missing")
    assert(inner.getFields.toArray.forall(
      _.asInstanceOf[org.apache.parquet.schema.Type].getId != null),
      s"nested member ids missing: $inner")

    spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    try {
      val renamedInner = StructType(Seq(
        idField("alpha", IntegerType, 3), idField("b", LongType, 4)))
      val renamed = StructType(Seq(idField("k", LongType, 1), idField("s", renamedInner, 2)))
      val back = spark.read.schema(renamed).parquet(dir)
      assert(back.selectExpr("s.alpha").collect().map(_.getInt(0)).sorted.toSeq === Seq(10, 20),
        "renamed nested member must serve the old physical column by id")
      assert(back.where("s.alpha = 20").selectExpr("k").collect().map(_.getLong(0)).toSeq
        === Seq(2L))
    } finally spark.conf.unset("spark.sql.parquet.fieldId.read.enabled")
  }

  test("nested ADD (id absent in old file) null-fills; nested member widening upcasts") {
    val dir = Files.createTempDirectory("nfid2").toFile.getAbsolutePath
    writeNested(dir)
    spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    try {
      // a: int -> long (widen, same id); c: NEW member id 5 (not in the file)
      val evolvedInner = StructType(Seq(
        idField("a", LongType, 3), idField("b", LongType, 4), idField("c", StringType, 5)))
      val evolved = StructType(Seq(idField("k", LongType, 1), idField("s", evolvedInner, 2)))
      val rows = spark.read.schema(evolved).parquet(dir)
        .selectExpr("k", "s.a", "s.c").orderBy("k").collect()
      assert(rows.map(_.getLong(1)).toSeq === Seq(10L, 20L),
        "widened nested member must upcast the narrow physical values")
      assert(rows.forall(_.isNullAt(2)), "new nested member must null-fill in old files")
    } finally spark.conf.unset("spark.sql.parquet.fieldId.read.enabled")
  }
}
