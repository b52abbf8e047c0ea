package graft.sources

import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 provider for the cell-image format — the Spark-native rendering of
  * the reference's "scifio" source contract (SURVEY.md §2a S1; options exercised at
  * /root/reference/main.py:19, test.py:10, image_segmentation/image_masking.py:23-26).
  *
  * On-disk layout: a directory of `*.jsonl` files, one JSON object per image line
  * (the real 105 MB `.cif` is a git-LFS pointer and SCIFIO is unavailable offline, so
  * the source preserves the *contract* over a portable layout — swapping in a real
  * SCIFIO-backed reader later touches only [[CellImagePartitionReader]]).
  *
  * Options (all of the reference's):
  *  - `path`                 directory of image files
  *  - `filelimit`            read at most N files (source-side limit pushdown)
  *  - `imagelimit`           at most N images per file
  *  - `numpartitionsperfile` split each file's image range into N input partitions
  *  - `channels`             comma-separated 1-based channel projection ("1,2,3")
  *  - `masked`               include the mask column (default true)
  *
  * Pushdowns: required-column pruning (SupportsPushDownRequiredColumns — a
  * width-only query never materializes pixel arrays) and LIMIT pushdown
  * (SupportsPushDownLimit caps images per partition). The `channels` option is the
  * manual projection pushdown the reference exposes; kept for API parity.
  */
class CellImageSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "cellimage"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CellImageSource.schemaFor(options.getBoolean("masked", true))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new CellImageTable(new CaseInsensitiveStringMap(properties))
}

object CellImageSource {
  val fullSchema: StructType = StructType(Seq(
    StructField("fileId", StringType, nullable = false),
    StructField("imageIdx", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("nChannels", IntegerType, nullable = false),
    StructField("data", ArrayType(DoubleType, containsNull = false), nullable = false),
    StructField("mask", ArrayType(BooleanType, containsNull = false), nullable = false)))

  def schemaFor(masked: Boolean): StructType =
    if (masked) fullSchema else StructType(fullSchema.filterNot(_.name == "mask"))

  /** 1-based channel selection from the `channels` option; None = all. */
  def channelsOf(options: CaseInsensitiveStringMap): Option[Array[Int]] =
    Option(options.get("channels")).map(_.split(",").map(_.trim.toInt))
}

class CellImageTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  override def name(): String = s"cellimage(${options.get("path")})"
  override def schema(): StructType = CellImageSource.schemaFor(options.getBoolean("masked", true))
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder = {
    // merge table-creation options with read options (read options win)
    val merged = new CaseInsensitiveStringMap(
      (options.asCaseSensitiveMap().asScala ++ caseInsensitiveOptions.asCaseSensitiveMap().asScala).asJava)
    new CellImageScanBuilder(merged)
  }
}

class CellImageScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownLimit {

  private var requiredSchema: StructType = CellImageSource.schemaFor(options.getBoolean("masked", true))
  private var limit: Option[Int] = None

  override def pruneColumns(required: StructType): Unit = {
    // Catalyst hands us the columns the query actually touches; everything else is
    // never parsed out of the file (pixel arrays are the expensive part)
    requiredSchema = required
  }

  override def pushLimit(l: Int): Boolean = {
    limit = Some(l)
    false // partial: the limit caps each partition; Spark still applies the global cut
  }

  override def build(): Scan = new CellImageScan(options, requiredSchema, limit)
}

class CellImageScan(options: CaseInsensitiveStringMap, requiredSchema: StructType,
                    pushedLimit: Option[Int]) extends Scan with Batch {
  override def readSchema(): StructType = requiredSchema
  override def toBatch: Batch = this
  override def description(): String = {
    val ch = CellImageSource.channelsOf(options).map(_.mkString(",")).getOrElse("all")
    s"cellimage path=${options.get("path")} channels=$ch limit=$pushedLimit required=${requiredSchema.fieldNames.mkString(",")}"
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val dir = new java.io.File(options.get("path"))
    val fileLimit = options.getInt("filelimit", Int.MaxValue)
    val imageLimit0 = options.getInt("imagelimit", Int.MaxValue)
    val imageLimit = pushedLimit.fold(imageLimit0)(l => math.min(imageLimit0, l))
    val partsPerFile = math.max(1, options.getInt("numpartitionsperfile", 1))
    val files = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".jsonl"))
      .sortBy(_.getName)
      .take(fileLimit)
    files.flatMap { f =>
      // image count = line count, capped by imagelimit; cheap for the fixture layout
      // (a SCIFIO reader would read it from file metadata instead)
      val src = scala.io.Source.fromFile(f)
      val total = try src.getLines().size finally src.close()
      val n = math.min(total, imageLimit)
      if (n == 0) Array.empty[InputPartition]
      else {
        val per = math.max(1, math.ceil(n.toDouble / partsPerFile).toInt)
        (0 until n by per).map(start =>
          CellImageInputPartition(f.getAbsolutePath, start, math.min(start + per, n))
            : InputPartition).toArray
      }
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new CellImageReaderFactory(requiredSchema, CellImageSource.channelsOf(options))
}

/** One slice of one file: images [startLine, endLine). */
case class CellImageInputPartition(path: String, startLine: Int, endLine: Int)
  extends InputPartition

class CellImageReaderFactory(requiredSchema: StructType, channels: Option[Array[Int]])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[org.apache.spark.sql.catalyst.InternalRow] = {
    val p = partition.asInstanceOf[CellImageInputPartition]
    new CellImagePartitionReader(p, requiredSchema, channels)
  }
}
