package graft.sources

import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
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
  * Pushdowns (the DSv2 triad + aggregates): required-column pruning
  * (SupportsPushDownRequiredColumns — a width-only query never materializes pixel
  * arrays), LIMIT pushdown (SupportsPushDownLimit caps images per partition), and
  * FILTER pushdown (SupportsPushDownFilters) on the two physical-layout columns:
  * `imageIdx` range/equality filters shrink the planned line ranges (partitions
  * that cannot contain a qualifying image are never created), and `fileId`
  * equality/IN filters skip whole files (a file holds exactly one fileId, read
  * from its first line during the same pass that counts images). Pushed filters
  * are also applied row-level in the reader BEFORE pixel decoding, and are
  * reported back as residual so Spark re-checks them — pushdown here is pure
  * work-skipping, never a correctness dependency. The `channels` option is the
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

  /** Filters this source can exploit: fileId equality/IN (whole-file skip) and
    * imageIdx comparisons (line-range pruning). */
  def isPushable(f: Filter): Boolean = f match {
    case EqualTo("fileId", _) | In("fileId", _)        => true
    case EqualTo("imageIdx", _) | In("imageIdx", _)    => true
    case GreaterThan("imageIdx", _)                    => true
    case GreaterThanOrEqual("imageIdx", _)             => true
    case LessThan("imageIdx", _)                       => true
    case LessThanOrEqual("imageIdx", _)                => true
    case _                                             => false
  }

  private def asLong(v: Any): Option[Long] = v match {
    case n: Number => Some(n.longValue())
    case _         => None
  }

  /** Conservative [lo, hi] imageIdx bounds implied by the pushed filters
    * (inclusive); Long.MinValue/MaxValue when unbounded. */
  def idxBounds(filters: Array[Filter]): (Long, Long) = {
    var lo = Long.MinValue
    var hi = Long.MaxValue
    filters.foreach {
      case EqualTo("imageIdx", v) => asLong(v).foreach { x => lo = math.max(lo, x); hi = math.min(hi, x) }
      case In("imageIdx", vs) =>
        val xs = vs.flatMap(asLong)
        if (xs.nonEmpty) { lo = math.max(lo, xs.min); hi = math.min(hi, xs.max) }
      case GreaterThan("imageIdx", v)        => asLong(v).foreach(x => lo = math.max(lo, x + 1))
      case GreaterThanOrEqual("imageIdx", v) => asLong(v).foreach(x => lo = math.max(lo, x))
      case LessThan("imageIdx", v)           => asLong(v).foreach(x => hi = math.min(hi, x - 1))
      case LessThanOrEqual("imageIdx", v)    => asLong(v).foreach(x => hi = math.min(hi, x))
      case _ => ()
    }
    (lo, hi)
  }

  /** Whether a file whose images carry `fileId` can contain qualifying rows. */
  def fileMatches(fileId: String, filters: Array[Filter]): Boolean =
    filters.forall {
      case EqualTo("fileId", v) => fileId == String.valueOf(v)
      case In("fileId", vs)     => vs.exists(v => fileId == String.valueOf(v))
      case _                    => true
    }

  /** Row-level check on the two pushed columns (used by the reader before pixel
    * decoding). Only the filters [[isPushable]] accepts reach this. */
  def rowMatches(fileId: String, imageIdx: Long, filters: Array[Filter]): Boolean =
    filters.forall {
      case EqualTo("fileId", v)              => fileId == String.valueOf(v)
      case In("fileId", vs)                  => vs.exists(v => fileId == String.valueOf(v))
      case EqualTo("imageIdx", v)            => asLong(v).contains(imageIdx)
      case In("imageIdx", vs)                => vs.flatMap(asLong).contains(imageIdx)
      case GreaterThan("imageIdx", v)        => asLong(v).exists(imageIdx > _)
      case GreaterThanOrEqual("imageIdx", v) => asLong(v).exists(imageIdx >= _)
      case LessThan("imageIdx", v)           => asLong(v).exists(imageIdx < _)
      case LessThanOrEqual("imageIdx", v)    => asLong(v).exists(imageIdx <= _)
      case _                                 => true
    }
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
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownLimit
    with SupportsPushDownFilters with SupportsPushDownAggregates {

  private var requiredSchema: StructType = CellImageSource.schemaFor(options.getBoolean("masked", true))
  private var limit: Option[Int] = None
  private var pushed: Array[Filter] = Array.empty
  private var countsPushed = 0

  override def pruneColumns(required: StructType): Unit = {
    // Catalyst hands us the columns the query actually touches; everything else is
    // never parsed out of the file (pixel arrays are the expensive part)
    requiredSchema = required
  }

  override def pushLimit(l: Int): Boolean = {
    limit = Some(l)
    false // partial: the limit caps each partition; Spark still applies the global cut
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(CellImageSource.isPushable)
    // return everything as residual: the pushed filters only SKIP work
    // (files, line ranges, pixel decoding); Spark keeps the exact post-filter
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  // COUNT aggregate pushdown — the reference's FIRST pipeline is load+count
  // (`main.py:27`), and the source already knows every file's image count
  // from partition planning: serving COUNT from that metadata decodes ZERO
  // pixels (it never even parses the JSON lines — plan-time line counting is
  // the whole read). PARTIAL form (supportCompletePushDown=false): each
  // planned partition emits its count as one row and Spark sums — the same
  // contract Spark's own parquet count pushdown uses, and it keeps the
  // global aggregate correct under multi-file scans.
  override def supportCompletePushDown(aggregation: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = false

  override def pushAggregation(aggregation: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    import org.apache.spark.sql.connector.expressions.NamedReference
    import org.apache.spark.sql.connector.expressions.aggregate.{Count, CountStar}
    // COUNT(*) / COUNT(col) only (every source column is non-nullable by
    // schema, so both equal the planned line-range length); no GROUP BY, no
    // DISTINCT, and no pushed filters (the planner already refuses aggregate
    // pushdown over residual filters — belt and braces here)
    val allCols = CellImageSource.fullSchema.fieldNames.toSet
    val exprs = aggregation.aggregateExpressions()
    val ok = pushed.isEmpty && aggregation.groupByExpressions().isEmpty &&
      exprs.nonEmpty && exprs.forall {
        case _: CountStar => true
        case c: Count if !c.isDistinct => c.column() match {
          case ref: NamedReference =>
            ref.fieldNames().length == 1 && allCols(ref.fieldNames()(0))
          case _ => false
        }
        case _ => false
      }
    if (ok) countsPushed = exprs.length
    ok
  }

  override def build(): Scan =
    if (countsPushed > 0) new CellImageCountScan(options, countsPushed)
    else new CellImageScan(options, requiredSchema, limit, pushed)
}

class CellImageScan(options: CaseInsensitiveStringMap, requiredSchema: StructType,
                    pushedLimit: Option[Int],
                    filters: Array[Filter] = Array.empty) extends Scan with Batch {
  override def readSchema(): StructType = requiredSchema
  override def toBatch: Batch = this
  override def description(): String = {
    val ch = CellImageSource.channelsOf(options).map(_.mkString(",")).getOrElse("all")
    s"cellimage path=${options.get("path")} channels=$ch limit=$pushedLimit " +
      s"required=${requiredSchema.fieldNames.mkString(",")} " +
      s"PushedFilters: [${filters.mkString(", ")}]"
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val dir = new java.io.File(options.get("path"))
    val fileLimit = options.getInt("filelimit", Int.MaxValue)
    val imageLimit0 = options.getInt("imagelimit", Int.MaxValue)
    val imageLimit = pushedLimit.fold(imageLimit0)(l => math.min(imageLimit0, l))
    val partsPerFile = math.max(1, options.getInt("numpartitionsperfile", 1))
    // imageIdx is by format contract the 0-based image position within its file
    // (a plane index in SCIFIO terms), so idx bounds translate directly to line
    // ranges and partitions outside them are never planned
    val (idxLo, idxHi) = CellImageSource.idxBounds(filters)
    val files = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".jsonl"))
      .sortBy(_.getName)
      .take(fileLimit)
    files.flatMap { f =>
      // Read the head line first (one fileId per file): a pushed fileId filter
      // skips the whole file WITHOUT counting its lines — the skip saves the
      // file's I/O, not just its partitions. Only surviving files pay the line
      // count (capped by imagelimit; a SCIFIO reader would use file metadata).
      val src = scala.io.Source.fromFile(f)
      val (keep, total) = try {
        val it = src.getLines()
        if (!it.hasNext) (false, 0)
        else {
          val head = it.next()
          if (!CellImageSource.fileMatches(CellImageJsonl.fileIdOf(head), filters)) (false, 0)
          else (true, 1 + it.size)
        }
      } finally src.close()
      val n = math.min(total, imageLimit)
      // intersect [0, n) with the pushed imageIdx bounds
      val from = math.max(0L, idxLo).toInt
      val until = math.min(n.toLong, if (idxHi == Long.MaxValue) n.toLong else idxHi + 1).toInt
      if (!keep || until <= from) Array.empty[InputPartition]
      else {
        // keep the file's ORIGINAL chunk grid (ceil(n / partsPerFile) lines per
        // chunk) and skip chunks disjoint from the pushed idx range — so a
        // selective filter plans fewer partitions instead of re-slicing the
        // surviving span into the same number of smaller ones
        val per = math.max(1, math.ceil(n.toDouble / partsPerFile).toInt)
        (0 until n by per).flatMap { start =>
          val lo = math.max(start, from)
          val hi = math.min(start + per, until)
          if (lo < hi) Some(CellImageInputPartition(f.getAbsolutePath, lo, hi): InputPartition)
          else None
        }.toArray
      }
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new CellImageReaderFactory(requiredSchema, CellImageSource.channelsOf(options), filters)
}

/** COUNT-pushdown scan: one row per FILE carrying that file's (imagelimit-
  * capped) image count, computed entirely at plan time from line counting —
  * no JSON parsed, no pixels decoded, no reader IO. A SCIFIO-backed reader
  * would serve the same number from container metadata. */
class CellImageCountScan(options: CaseInsensitiveStringMap, nCounts: Int)
  extends Scan with Batch {

  override def readSchema(): StructType =
    StructType((0 until nCounts).map(i => StructField(s"count_$i", LongType, nullable = false)))
  override def toBatch: Batch = this
  override def description(): String =
    s"cellimage path=${options.get("path")} PushedAggregates: [COUNT] " +
      "(metadata-only: plan-time line counts, zero image decode)"

  override def planInputPartitions(): Array[InputPartition] = {
    val dir = new java.io.File(options.get("path"))
    val fileLimit = options.getInt("filelimit", Int.MaxValue)
    val imageLimit = options.getInt("imagelimit", Int.MaxValue)
    val files = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".jsonl"))
      .sortBy(_.getName)
      .take(fileLimit)
    val parts = files.map { f =>
      val src = scala.io.Source.fromFile(f)
      val total = try src.getLines().size finally src.close()
      CellImageCountPartition(math.min(total, imageLimit).toLong): InputPartition
    }
    // an empty relation must still emit one zero row: the final SUM over the
    // partial counts would otherwise see no input and return NULL, not 0
    if (parts.isEmpty) Array(CellImageCountPartition(0L)) else parts
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new CellImageCountReaderFactory(nCounts)
}

/** One file's plan-time image count. */
case class CellImageCountPartition(count: Long) extends InputPartition

/** Emits one row per partition carrying the plan-time count (top-level class:
  * an anonymous factory would capture the non-serializable Scan as $outer). */
class CellImageCountReaderFactory(nCounts: Int) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[org.apache.spark.sql.catalyst.InternalRow] = {
    val c = partition.asInstanceOf[CellImageCountPartition].count
    new PartitionReader[org.apache.spark.sql.catalyst.InternalRow] {
      private var emitted = false
      override def next(): Boolean = if (emitted) false else { emitted = true; true }
      override def get(): org.apache.spark.sql.catalyst.InternalRow =
        org.apache.spark.sql.catalyst.InternalRow.fromSeq(Seq.fill(nCounts)(c))
      override def close(): Unit = ()
    }
  }
}

/** One slice of one file: images [startLine, endLine). */
case class CellImageInputPartition(path: String, startLine: Int, endLine: Int)
  extends InputPartition

class CellImageReaderFactory(requiredSchema: StructType, channels: Option[Array[Int]],
                             filters: Array[Filter] = Array.empty)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[org.apache.spark.sql.catalyst.InternalRow] = {
    val p = partition.asInstanceOf[CellImageInputPartition]
    new CellImagePartitionReader(p, requiredSchema, channels, filters)
  }
}
