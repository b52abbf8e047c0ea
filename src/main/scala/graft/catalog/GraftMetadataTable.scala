package graft.catalog

import java.nio.file.{Files, Path}

import scala.collection.JavaConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{Identifier, SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Read-only metadata tables over a graft table's snapshot bookkeeping —
  * `SELECT * FROM graft.ns.t.snapshots` / `...t.segments` (Iceberg's
  * introspection convention). The rows are DRIVER-sized by construction
  * (snapshot and segment counts, never data), so they plan as a `LocalScan`:
  * no job, no files opened. Row counts come from the committed zone-map stats
  * when every segment in scope has them, else null — introspection never
  * triggers a data scan. */
private[catalog] object GraftMetadataTable {
  val Kinds: Set[String] =
    Set("snapshots", "segments", "refs", "tags", "column_stats", "partitions")

  /** `t.partitions` (Iceberg convention): per-partition-value rollup of the
    * CURRENT snapshot from segment suffixes + committed zone stats — the
    * first question an operator asks a skewed 100 TB table ("which partition
    * is the fat one?"), answered with zero file IO. One row per distinct
    * (spec, tuple) suffix; unpartitioned(-era) segments roll into a single
    * NULL-partition row. */
  val PartitionsSchema: StructType = StructType(Seq(
    // decoded tuple ("us/2024", nulls render as "null"); NULL for segments
    // written while the table was unpartitioned
    StructField("partition", StringType, nullable = true),
    StructField("spec_id", LongType, nullable = false),
    StructField("n_segments", IntegerType, nullable = false),
    StructField("n_files", IntegerType, nullable = false),
    StructField("bytes", LongType, nullable = false),
    // exact, from zone stats; null if any contributing segment lacks them
    StructField("n_rows", LongType, nullable = true),
    StructField("n_delete_vectors", IntegerType, nullable = false)))

  val ColumnStatsSchema: StructType = StructType(Seq(
    StructField("column", StringType, nullable = false),
    StructField("n_segments", IntegerType, nullable = false),
    // exact, summed from zone maps; null if any current segment lacks stats
    StructField("rows", LongType, nullable = true),
    StructField("nulls", LongType, nullable = true),
    // distinct-count estimate from UNIONED per-segment HLL sketches
    // (graft.stats.ndv opt-in); null unless EVERY current segment carries a
    // sketch for the column — a partial union would silently under-count
    StructField("ndv_estimate", LongType, nullable = true),
    // approximate quantiles from MERGED per-segment KLL sketches
    // (graft.stats.kll opt-in, k=200 ≈ 1.65% rank error); same every-segment
    // coverage rule. Date columns report epoch days, timestamps micros —
    // the zone-entry domains.
    StructField("p50_estimate", DoubleType, nullable = true),
    StructField("p90_estimate", DoubleType, nullable = true),
    StructField("p99_estimate", DoubleType, nullable = true)))

  val TagsSchema: StructType = StructType(Seq(
    StructField("tag", StringType, nullable = false),
    StructField("snapshot", LongType, nullable = false),
    // commit time of the pinned snapshot (release timestamp), null for
    // pre-snapshotTimes tables
    StructField("committed_at_ms", LongType, nullable = true)))

  val RefsSchema: StructType = StructType(Seq(
    StructField("branch", StringType, nullable = false),
    StructField("base_snapshot", LongType, nullable = false),
    StructField("n_segments", IntegerType, nullable = false),
    // segments staged on the branch beyond its base snapshot (what
    // fast_forward would publish / drop_branch would delete)
    StructField("n_staged_segments", IntegerType, nullable = false),
    StructField("n_rows", LongType, nullable = true)))

  val SnapshotsSchema: StructType = StructType(Seq(
    StructField("snapshot_id", LongType, nullable = false),
    StructField("is_current", BooleanType, nullable = false),
    StructField("n_segments", IntegerType, nullable = false),
    StructField("n_rows", LongType, nullable = true),
    // commit wall-clock (epoch ms) — what TIMESTAMP AS OF resolves against;
    // null only for tables written before times were stamped
    StructField("committed_at_ms", LongType, nullable = true),
    // distinct delete-vector dirs this snapshot applies (merge-on-read)
    StructField("n_delete_vectors", IntegerType, nullable = false)))

  val SegmentsSchema: StructType = StructType(Seq(
    StructField("segment", StringType, nullable = false),
    StructField("in_current", BooleanType, nullable = false),
    StructField("n_files", IntegerType, nullable = false),
    StructField("bytes", LongType, nullable = false),
    StructField("n_rows", LongType, nullable = true),
    // delete vectors applied to this segment in the CURRENT snapshot —
    // n_rows counts the physical file rows, so a DV'd segment's live count
    // is lower; rewrite_deletes/compact zero this column back
    StructField("n_delete_vectors", IntegerType, nullable = false)))
}

private[catalog] final class GraftMetadataTable(
    catalog: String, ident: Identifier, tableDir: Path, kind: String)
  extends Table with SupportsRead {

  import GraftMetadataTable._

  override def name(): String = (catalog +: ident.namespace() :+ ident.name()).mkString(".")
  override def schema(): StructType = kind match {
    case "snapshots"    => SnapshotsSchema
    case "refs"         => RefsSchema
    case "tags"         => TagsSchema
    case "column_stats" => ColumnStatsSchema
    case "partitions"   => PartitionsSchema
    case _              => SegmentsSchema
  }
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  private def segRows(meta: GraftMeta, seg: String): Option[Long] =
    meta.zstats.get(seg).flatMap(z => scala.util.Try(SegmentStats.decode(z).rows).toOption)

  private def rows(): Array[InternalRow] = {
    val meta = GraftMeta.read(tableDir)
    if (kind == "column_stats") {
      // one decoded Stats per current segment; everything below is
      // metadata-sized driver work — zero file IO, the zone-map contract
      val segs = meta.snapshots.getOrElse(meta.current, Nil)
      val decoded = segs.map(s => meta.zstats.get(s)
        .flatMap(z => scala.util.Try(SegmentStats.decode(z)).toOption))
      val allStats = decoded.flatten
      val covered = decoded.forall(_.isDefined)
      meta.schema.fields.map { f =>
        val cols = allStats.flatMap(_.cols.get(f.name))
        val rows =
          if (covered && cols.length == segs.length)
            Long.box(allStats.map(_.rows).sum) else null
        val nulls =
          if (covered && cols.length == segs.length)
            Long.box(cols.map(_.nulls).sum) else null
        // union the per-segment HLL sketches; any sketch-less segment voids
        // the estimate (a partial union would silently under-count)
        val ndv: Any =
          if (segs.nonEmpty && covered && cols.length == segs.length &&
              cols.forall(_.ndv.isDefined)) {
            scala.util.Try {
              val u = new org.apache.datasketches.hll.Union(12)
              cols.foreach(c => u.update(org.apache.datasketches.hll.HllSketch.heapify(
                java.util.Base64.getDecoder.decode(c.ndv.get))))
              Long.box(Math.round(u.getEstimate))
            }.getOrElse(null)
          } else null
        // merge the per-segment KLL quantile sketches; same coverage rule.
        // An all-values-null table merges to an EMPTY sketch → null quantiles.
        val quantiles: Array[Any] =
          if (segs.nonEmpty && covered && cols.length == segs.length &&
              cols.forall(_.kll.isDefined)) {
            scala.util.Try {
              val u = org.apache.datasketches.kll.KllDoublesSketch.newHeapInstance(200)
              cols.foreach(c => u.merge(org.apache.datasketches.kll.KllDoublesSketch.heapify(
                org.apache.datasketches.memory.Memory.wrap(
                  java.util.Base64.getDecoder.decode(c.kll.get)))))
              if (u.isEmpty) Array[Any](null, null, null)
              else Array[Any](Double.box(u.getQuantile(0.5)),
                Double.box(u.getQuantile(0.9)), Double.box(u.getQuantile(0.99)))
            }.getOrElse(Array[Any](null, null, null))
          } else Array[Any](null, null, null)
        new GenericInternalRow(Array[Any](
          UTF8String.fromString(f.name), segs.size, rows, nulls, ndv) ++ quantiles): InternalRow
      }
    } else if (kind == "partitions") {
      val segs = meta.snapshots.getOrElse(meta.current, Nil)
      val dvs = meta.dvs.getOrElse(meta.current, Map.empty)
      segs.groupBy(s => GraftPartitions.suffixOf(s).getOrElse(""))
        .toSeq.sortBy(_._1).map { case (sfx, group) =>
          val files = group.flatMap { seg =>
            val d = tableDir.resolve(seg)
            if (Files.isDirectory(d))
              GraftMeta.listDir(d).filter(_.getFileName.toString.endsWith(".parquet"))
            else Nil
          }
          val n = group.map(segRows(meta, _))
            .foldLeft(Option(0L)) { case (acc, r) => for (a <- acc; b <- r) yield a + b }
          val part: Any =
            if (sfx.isEmpty) null
            else UTF8String.fromString(GraftPartitions.describeSuffix(sfx))
          new GenericInternalRow(Array[Any](
            part, GraftPartitions.specIdOf(sfx), group.size, files.size,
            files.map(Files.size).sum, n.orNull,
            group.map(s => dvs.getOrElse(s, Nil).size).sum)): InternalRow
        }.toArray
    } else if (kind == "tags") {
      GraftRefs.allTags(meta).toSeq.sortBy(_._1).map { case (name, snap) =>
        new GenericInternalRow(Array[Any](
          UTF8String.fromString(name), snap,
          meta.snapshotTimes.get(snap).map(Long.box).orNull)): InternalRow
      }.toArray
    } else if (kind == "refs") {
      GraftRefs.all(meta).toSeq.sortBy(_._1).map { case (name, ref) =>
        val baseSegs = meta.snapshots.getOrElse(ref.base, Nil).toSet
        val n = ref.dirs.map(segRows(meta, _))
          .foldLeft(Option(0L)) { case (acc, r) => for (a <- acc; b <- r) yield a + b }
        new GenericInternalRow(Array[Any](
          UTF8String.fromString(name), ref.base, ref.dirs.size,
          ref.dirs.count(!baseSegs(_)), n.orNull)): InternalRow
      }.toArray
    } else if (kind == "snapshots") {
      meta.snapshots.toSeq.sortBy(_._1).map { case (id, segs) =>
        val n = segs.map(segRows(meta, _))
          .foldLeft(Option(0L)) { case (acc, r) => for (a <- acc; b <- r) yield a + b }
        val nDvs = meta.dvs.getOrElse(id, Map.empty)
          .valuesIterator.flatten.toSet.size
        new GenericInternalRow(Array[Any](
          id, id == meta.current, segs.size, n.orNull,
          meta.snapshotTimes.get(id).map(Long.box).orNull, nDvs)): InternalRow
      }.toArray
    } else {
      val live = meta.snapshots.values.flatten.toSeq.distinct.sorted
      val current = meta.snapshots.getOrElse(meta.current, Nil).toSet
      live.map { seg =>
        val dir = tableDir.resolve(seg)
        val files =
          if (Files.isDirectory(dir))
            GraftMeta.listDir(dir).filter(_.getFileName.toString.endsWith(".parquet"))
          else Nil
        new GenericInternalRow(Array[Any](
          UTF8String.fromString(seg), current.contains(seg), files.size,
          files.map(Files.size).sum, segRows(meta, seg).orNull,
          meta.dvs.getOrElse(meta.current, Map.empty)
            .getOrElse(seg, Nil).size)): InternalRow
      }.toArray
    }
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // resolved NOW, not at execution: metadata reads are point-in-time like
    // every other graft scan
    val pinned = rows()
    () => new LocalScan {
      override def rows(): Array[InternalRow] = pinned
      override def readSchema(): StructType = schema()
      override def description(): String = s"graft-metadata(${name()})"
    }
  }
}
