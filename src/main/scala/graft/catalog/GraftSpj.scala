package graft.catalog

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.{Expression => V2Expression, Expressions, Transform}
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** STORAGE-PARTITIONED JOINS (SPARK-37377 / the Iceberg SPJ recipe) for graft
  * partitioned tables — the single biggest shuffle eliminator at 100 TB: a
  * join (or aggregation) keyed on the partition dimensions of two
  * co-partitioned graft tables runs with ZERO exchange on either side.
  *
  * How it rides the existing layout, with no new metadata:
  *
  *   - `GraftPartitionedWrite` commits PARTITION-PURE segments whose names
  *     carry the encoded partition tuple (`<uuid>@<spec>~<tuple>`,
  *     GraftPartitions) — so every file's partition key is known at PLAN time
  *     from its segment directory name, with zero file IO. Identity
  *     dimensions encode the column's canonical value; BUCKET dimensions
  *     (GraftBucket) encode the bucket id, and the catalog's FunctionCatalog
  *     exposes the bucket function so Spark resolves the reported transform;
  *   - the scan reports `KeyGroupedPartitioning(transforms, nKeys)` through
  *     `SupportsReportPartitioning` and plans ONE `HasPartitionKey`-tagged
  *     split per partition value; Spark groups and aligns both sides
  *     (`spark.sql.sources.v2.bucketing.enabled`; pushPartValues plans empty
  *     splits for mismatched value sets), and with the sorting conf the
  *     reported key ordering drops the SMJ sorts too (single-key splits are
  *     trivially sorted);
  *   - reporting is exactness-gated and degrades to UnknownPartitioning —
  *     never wrong, at most un-grouped: every visible segment must carry a
  *     current-spec suffix (mixed-layout tables after partition evolution,
  *     pre-partitioning segments, and foreign add_files imports all bail),
  *     and every partition SOURCE column must survive column pruning (Spark
  *     resolves the reported transforms against the scan output). */
private[catalog] object GraftSpj {

  /** Session conf (default false): plan ONE split per partition value and
    * report the partition-key sort order, trading plain-scan parallelism for
    * sort-free SMJs. Off, splits stay file-sized and only group for joins. */
  val SingleSplitKey = "spark.graft.spj.singleSplitPerValue"

  /** Session conf (default true): strip unused key-grouping from plain scans
    * after EnsureRequirements ([[DisableUnnecessaryKeyGrouping]]) so a scan
    * nobody joins/aggregates on keeps file-level parallelism. */
  val UngroupKey = "spark.graft.spj.ungroupPlainScans"

  /** One reported partition dimension: its v2 transform (identity(col) or
    * bucket(n, col)) and the key row's value type at that position. */
  final case class Dim(transform: Transform, valueType: DataType)

  /** SPJ plan for one scan: the reported dimensions, each visible segment's
    * key (by segment name), and the distinct key count. */
  final case class Info(
      dims: Seq[Dim],
      keysBySegment: Map[String, (String, InternalRow)], // name -> (enc, key)
      numKeys: Int) {
    def transforms: Array[V2Expression] = dims.map(_.transform: V2Expression).toArray
  }

  /** Canonical partition-value string -> Catalyst value; inverse of
    * `GraftPartitions.internalExtractor` for every supported identity type. */
  private def toCatalyst(dt: DataType, s: String): Any = dt match {
    case StringType     => UTF8String.fromString(s)
    case BooleanType    => s.toBoolean
    case ByteType       => s.toByte
    case ShortType      => s.toShort
    case IntegerType    => s.toInt
    case LongType       => s.toLong
    case DateType       => java.time.LocalDate.parse(s).toEpochDay.toInt
    case d: DecimalType => Decimal(BigDecimal(new java.math.BigDecimal(s)), d.precision, d.scale)
    case other => throw new IllegalArgumentException(s"graft spj: unsupported $other")
  }

  /** The encoded tuple of a current-spec segment name, or None (no suffix /
    * foreign spec id — a mixed-layout table cannot report grouping). A
    * per-partition z-order CELL tail (`~zc<i>`, r18) strips off first: the
    * cells of one partition value share one key, so KeyGroupedPartitioning
    * groups them back together (reporting the raw celled suffix as the key
    * would split one value across keys and silently skip the final
    * aggregation/join shuffle). */
  private def tupleOf(segment: String, specId: Long): Option[String] =
    GraftPartitions.suffixOf(segment).map(GraftPartitions.baseSuffix).flatMap { sfx =>
      if (GraftPartitions.specIdOf(sfx) != specId) None
      else {
        val i = sfx.indexOf('~')
        Some(if (i > 0 && sfx.substring(0, i).forall(_.isDigit)) sfx.substring(i + 1) else sfx)
      }
    }

  /** Exactness gate: Some(Info) iff the table is partitioned, every routed
    * dimension's SOURCE column survived pruning, and EVERY live segment's
    * key decodes. Bucket dimensions report `bucket(n, col)` with an INT key
    * (the bucket id the writer routed by); a NULL identity value or the
    * bucket's null-sentinel id (-1) both key as themselves consistently. */
  def plan(routed: Seq[GraftPartitions.PartField], specId: Long,
           live: Seq[(String, String)], readSchema: StructType): Option[Info] = {
    if (routed.isEmpty) return None
    val dims = routed.map { pf =>
      readSchema.fields.find(_.name.equalsIgnoreCase(pf.source)) match {
        case None => return None // source column pruned away — cannot report
        case Some(f) => pf.bucketN match {
          case Some(n) => Dim(Expressions.bucket(n, f.name), IntegerType)
          case None    => Dim(Expressions.identity(f.name), f.dataType)
        }
      }
    }
    val keyed = live.map { case (name, _) =>
      tupleOf(name, specId).flatMap { enc =>
        val parts = enc.split("_", -1)
        if (parts.length != dims.length) None
        else scala.util.Try {
          val vals = parts.zip(dims).map { case (p, d) =>
            GraftPartitions.decodeString(p) match {
              case None    => null
              case Some(s) => toCatalyst(d.valueType, s)
            }
          }
          name -> (enc, new GenericInternalRow(vals.toArray[Any]): InternalRow)
        }.toOption
      }
    }
    if (keyed.exists(_.isEmpty)) None
    else {
      val m = keyed.flatten.toMap
      Some(Info(dims, m, m.values.map(_._1).toSet.size))
    }
  }

  /** A parquet file split tagged with its partition key. Extends Spark's own
    * FilePartition so the delegated parquet PartitionReaderFactory reads it
    * unchanged; HasPartitionKey is what BatchScanExec groups by. */
  private final class KeyedFilePartition(
      index: Int, files: Array[PartitionedFile], key: InternalRow)
    extends FilePartition(index, files) with HasPartitionKey {
    override def partitionKey(): InternalRow = key
  }

  /** Re-plan the delegated parquet batch's splits as `HasPartitionKey`-tagged
    * splits so Spark's key-grouping (and so SPJ) can fire. Two granularities:
    *
    *   - DEFAULT (`singleSplit = false`): keep the parquet scan's own
    *     bin-packing and only slice each bin by partition value (segments are
    *     partition-pure, so a slice is per-(bin, value) and usually ≈ the
    *     original bin). Split count stays proportional to data volume — a
    *     plain scan of a partitioned table keeps file-level parallelism
    *     instead of collapsing to the partition-value count;
    *   - OPT-IN (`singleSplit = true`, session conf [[SingleSplitKey]]): ONE
    *     split per partition value. Spark keeps a scan-reported sort order
    *     only when each key group holds at most one split, so this mode (and
    *     only it) also drops the SMJ sorts — the right trade when the join IS
    *     the query; the wrong default for scans that never use the order.
    *
    * Any file that cannot be attributed to a live segment falls back to the
    * ORIGINAL untagged splits — Spark then plans no grouping and no ordering
    * (defensive; planInputPartitions only ever plans files under the live
    * segment dirs the Info covers). */
  def wrapBatch(b: Batch, info: Info, singleSplit: Boolean): Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] = {
      val parts = b.planInputPartitions()
      val bins = Array.newBuilder[Array[PartitionedFile]]
      parts.foreach {
        case fp: FilePartition => bins += fp.files
        case _                 => return parts
      }
      val keyByEnc: Map[String, InternalRow] =
        info.keysBySegment.valuesIterator.map { case (e, k) => e -> k }.toMap
      def encOf(f: PartitionedFile): String =
        info.keysBySegment.get(f.filePath.toPath.getParent.getName) match {
          case Some((enc, _)) => enc
          case None           => null
        }
      val sliced: Seq[(String, Array[PartitionedFile])] =
        if (singleSplit) {
          val all = bins.result().flatten
          if (all.exists(f => encOf(f) == null)) return parts
          all.groupBy(encOf).toSeq
        } else {
          val out = Seq.newBuilder[(String, Array[PartitionedFile])]
          for (bin <- bins.result(); (enc, fs) <- bin.groupBy(encOf)) {
            if (enc == null) return parts
            out += enc -> fs
          }
          out.result()
        }
      sliced.sortBy(_._1).zipWithIndex.map { case ((enc, fs), i) =>
        new KeyedFilePartition(i, fs, keyByEnc(enc)): InputPartition
      }.toArray
    }
    override def createReaderFactory(): PartitionReaderFactory = b.createReaderFactory()
  }
}
