package graft.catalog
import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
/** Probe kept as a pin: which RENAMED field shapes Spark 4.1's V2 parquet
  * reader resolves by field id. Primitives and arrays resolve; a renamed
  * STRUCT-typed column does NOT (its members null-fill despite unchanged
  * member names/ids — the v1 path resolves the same file fine). The catalog
  * refuses struct-typed renames because of exactly this. */
class V2RenameProbeSpec extends SparkSpec {
  private def idField(name: String, dt: DataType, id: Int): StructField =
    StructField(name, dt, nullable = true,
      new MetadataBuilder().putLong("parquet.field.id", id).build())
  test("v2 reader: renamed primitive / array / struct columns by id") {
    val dir = Files.createTempDirectory("orp2").toFile.getAbsolutePath
    val inner = StructType(Seq(idField("a", LongType, 4)))
    val schema = StructType(Seq(
      idField("k", LongType, 1),
      idField("arr", ArrayType(LongType), 2),
      idField("s", inner, 3)))
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    spark.createDataFrame(
      java.util.Arrays.asList(Row(7L, Seq(1L, 2L), Row(10L))), schema)
      .write.mode("overwrite").parquet(dir)
    spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    val v1list = spark.conf.get("spark.sql.sources.useV1SourceList")
    spark.conf.set("spark.sql.sources.useV1SourceList", "")
    try {
      val renamed = StructType(Seq(
        idField("key", LongType, 1),
        idField("xs", ArrayType(LongType), 2),
        idField("payload", inner, 3)))
      val row = spark.read.schema(renamed).parquet(dir)
        .selectExpr("key", "xs", "payload.a").collect().head
      assert(row.getLong(0) === 7L, "renamed primitive must resolve by id")
      assert(row.getSeq[Long](1) === Seq(1L, 2L), "renamed array must resolve by id")
      // THE HOLE this probe pins (and the catalog guards): the v2 reader
      // does not descend into a RENAMED group — members null-fill even
      // though their own names and ids are unchanged. The v1 path resolves
      // it; the catalog therefore REFUSES struct-typed renames rather than
      // silently null-filling (GraftCatalog rename arms).
      assert(row.isNullAt(2),
        "if this starts resolving, Spark fixed the v2 group-rename hole - lift the catalog guard")
    } finally {
      spark.conf.unset("spark.sql.parquet.fieldId.read.enabled")
      spark.conf.set("spark.sql.sources.useV1SourceList", v1list)
    }
  }
}
