package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Scratch probe (test scope, not a test): does the V2 ParquetTable scan
  * populate ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME when the table
  * schema carries it? Decides the deletion-vector read-path mechanics. */
object RowIndexProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("rowidx").toString
    (1 to 1000).map(i => (i.toLong, s"v$i")).toDF("id", "s")
      .repartition(3).write.mode("overwrite").parquet(dir)

    println("ROW_INDEX_TEMPORARY_COLUMN_NAME = " + ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME)

    val dataSchema = StructType(Seq(
      StructField("id", LongType), StructField("s", StringType),
      StructField(ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME, LongType)))

    // V1 check first: schema-with-rowidx through spark.read
    val v1 = spark.read.schema(dataSchema).parquet(dir)
    println("=== V1 sample ===")
    v1.show(5, truncate = false)

    // V2: ParquetTable directly (the GraftTable inner path)
    import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
    val opts = new CaseInsensitiveStringMap(java.util.Collections.emptyMap[String, String]())
    val tbl = ParquetTable("probe", spark, opts, Seq(dir), Some(dataSchema),
      classOf[ParquetFileFormat])
    val sb = tbl.newScanBuilder(opts)
    sb.asInstanceOf[org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns]
      .pruneColumns(dataSchema)
    val scan = sb.build()
    println("V2 readSchema = " + scan.readSchema())
    val batch = scan.toBatch
    val parts = batch.planInputPartitions()
    println(s"V2 partitions = ${parts.length}")
    parts.take(2).foreach {
      case fp: org.apache.spark.sql.execution.datasources.FilePartition =>
        println(s"  FilePartition(${fp.index}) files=${fp.files.map(f => f.urlEncodedPath.split('/').last + s" start=${f.start} len=${f.length}").mkString("; ")}")
      case other => println(s"  ${other.getClass}")
    }
    val factory = batch.createReaderFactory()
    val reader = factory.createReader(parts(0))
    var n = 0
    val seen = scala.collection.mutable.ArrayBuffer[(Long, String, Long)]()
    while (reader.next() && n < 8) {
      val r = reader.get()
      seen += ((r.getLong(0), r.getUTF8String(1).toString, r.getLong(2)))
      n += 1
    }
    reader.close()
    println("V2 first rows (id, s, row_index): " + seen.mkString(", "))
    spark.stop()
  }
}
