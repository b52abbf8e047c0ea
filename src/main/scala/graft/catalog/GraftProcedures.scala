package graft.catalog

import java.nio.file.{Files, Path}
import java.util.UUID

import scala.collection.JavaConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._

/** Maintenance procedures for the graft snapshot catalog, exposed through
  * Spark 4's `ProcedureCatalog` / `CALL` surface (SPARK-44167):
  *
  *   CALL graft.system.compact('lake.t', target_file_bytes)
  *   CALL graft.system.expire_snapshots('lake.t', keep_last)
  *
  * These are the two jobs every snapshot table needs on a schedule at 100 TB:
  * appends accumulate small segments (the classic small-files problem — scan
  * task count and open-file overhead grow with segment count, not data size),
  * and retained snapshots accumulate dead segments on disk. `compact` rewrites
  * the CURRENT snapshot into ceil(bytes / target) size-targeted files as a new
  * snapshot — a metadata-preserving rewrite (every older version stays
  * readable, which is also what makes it safe to run concurrently with
  * readers). `expire_snapshots` is the destructive half: it drops all but the
  * last N snapshots from metadata and deletes segment directories no retained
  * snapshot references.
  *
  * Both return a one-row summary as a `LocalScan` (driver-sized by
  * construction: counts, not data).
  */
private[catalog] abstract class GraftProcedure(catalog: GraftCatalog)
  extends UnboundProcedure with BoundProcedure {

  override def bind(inputType: StructType): BoundProcedure = this
  // maintenance mutates table state — never allow the optimizer to collapse
  // or reorder repeated calls
  override def isDeterministic: Boolean = false

  /** Output schema of the one-row summary. */
  protected def outputSchema: StructType

  /** 'ns.table' (dots) relative to this catalog. */
  protected def resolveTableDir(tableArg: String): Path = {
    val parts = tableArg.split('.')
    val dir = catalog.tableDirFor(Identifier.of(parts.init, parts.last))
    require(Files.exists(dir.resolve(GraftMeta.FileName)),
      s"graft ${name()}: no such table '$tableArg'")
    dir
  }

  protected def result(values: Any*): java.util.Iterator[Scan] = {
    val scan: Scan = new LocalScan {
      override def rows(): Array[InternalRow] =
        Array(new GenericInternalRow(values.toArray))
      override def readSchema(): StructType = outputSchema
      override def description(): String = s"graft-${name()}-summary"
    }
    java.util.Collections.singletonList(scan).iterator()
  }

  protected def parquetFiles(seg: Path): Seq[Path] =
    GraftMeta.listDir(seg).filter(_.getFileName.toString.endsWith(".parquet"))
}

/** `CALL <cat>.system.compact(table, target_file_bytes)` — rewrite the current
  * snapshot's segments into one segment per partition group, each of
  * ceil(groupBytes / target) size-targeted files. The rewrite is ONE
  * distributed job for the whole snapshot regardless of partition count
  * (rows route back to their source group's suffix task-side —
  * GraftDml.rewriteGroupsOneJob), and the commit is a REPLACE snapshot, so
  * time travel to every pre-compaction version keeps working. */
private[catalog] final class CompactProcedure(catalog: GraftCatalog)
  extends GraftProcedure(catalog) {

  override def name(): String = "compact"
  override def description(): String =
    "rewrite the current snapshot into size-targeted files as a new snapshot"

  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("table", StringType).build(),
    ProcedureParameter.in("target_file_bytes", LongType)
      .defaultValue(String.valueOf(128L * 1024 * 1024)).build())

  override val outputSchema: StructType = StructType(Seq(
    StructField("segments_before", IntegerType, nullable = false),
    StructField("files_before", IntegerType, nullable = false),
    StructField("files_after", IntegerType, nullable = false),
    StructField("bytes", LongType, nullable = false)))

  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val dir = resolveTableDir(input.getUTF8String(0).toString)
    val target = input.getLong(1)
    require(target > 0, "graft compact: target_file_bytes must be positive")
    val spark = SparkSession.active
    val meta = GraftMeta.read(dir)
    val segNames = meta.snapshots(meta.current)
    // compaction groups = partitions: a partitioned table rewrites WITHIN each
    // partition-pure group (merging across partitions would destroy the purity
    // every pruned scan and partition-scoped DML depends on); an unpartitioned
    // table is one group, the whole-snapshot rewrite. The rewrite itself is
    // ONE distributed job for the entire snapshot, not a per-group driver
    // loop — rows route back to their source group's suffix task-side and
    // salt into each group's size-targeted slot count (a 10k-partition
    // compact is one job; the round-11 scale seam). The read is DV-merged:
    // compaction MATERIALIZES any delete vectors on its inputs (rows stay
    // deleted, the vectors drop with the replaced segments — Iceberg's
    // rewrite contract). The table-owned layout rides the rewrite: cluster-by
    // tables salt on the cluster key (a key never splits across files) and
    // order-by re-sorts within each writer — compacting a laid-out table
    // with a blind bin-pack would interleave inputs and widen every zone-map
    // bound to table-wide.
    val groups: Seq[(Option[String], Seq[String])] =
      segNames.groupBy(GraftPartitions.suffixOf).toSeq.sortBy(_._1)
    var filesBefore = 0
    var bytesTotal = 0L
    val slotsBySuffix = groups.map { case (suffix, group) =>
      val files = group.map(dir.resolve).flatMap(parquetFiles)
      val bytes = files.map(Files.size).sum
      filesBefore += files.size
      bytesTotal += bytes
      suffix.getOrElse("") -> math.max(1L, (bytes + target - 1) / target).toInt
    }.toMap
    val rewritten = GraftDml.rewriteGroupsOneJob(dir, meta, segNames, slotsBySuffix)
    val filesAfter = rewritten.map(r => parquetFiles(dir.resolve(r._1)).size).sum
    // ONE commit swaps every group: expectedCurrent fails the compaction if a
    // concurrent append landed between the snapshot pin and this commit (its
    // rows are not in any rewritten segment), not silently vanish from the new
    // current snapshot — and the loser's fully-written segments are deleted
    GraftDml.cleanupOnFailedCommit(dir, rewritten.map(_._1)) {
      GraftMeta.commitMany(dir, rewritten, replaceAll = true,
        removeSuffixes = Set.empty, expectedCurrent = Some(meta.current),
        namedKey = None)
    }
    result(segNames.size, filesBefore, filesAfter, bytesTotal)
  }
}

/** `CALL <cat>.system.delete_where(table, predicate)` — segment-level
  * copy-on-write DELETE, the scale path SQL `DELETE FROM` (whole-table
  * group rewrite) documents as its seam:
  *
  *   1. DISCOVER: one filtered scan finds the segments holding matching rows
  *      (`_metadata.file_path` + parquet predicate pushdown — untouched
  *      segments' row groups are skipped by footer min/max, which is what the
  *      table's `write.cluster-by`/`write.order-by` layout exists to enable);
  *   2. REWRITE: only touched segments are read back; survivors (rows where
  *      the predicate is not TRUE — SQL DELETE keeps FALSE and NULL) land in
  *      one new segment;
  *   3. COMMIT: new snapshot = current − touched + rewritten, under the table
  *      lock, so concurrent appends survive and every old version stays
  *      readable.
  *
  * A DELETE hitting 1 of 1000 segments reads and writes 1/1000th of the
  * table; `DELETE FROM` syntax remains available with full-rewrite semantics.
  * This is Iceberg's file-pruned copy-on-write recipe expressed at segment
  * granularity over the graft meta layer. */
private[catalog] final class DeleteWhereProcedure(catalog: GraftCatalog)
  extends GraftProcedure(catalog) {

  override def name(): String = "delete_where"
  override def description(): String =
    "segment-level copy-on-write delete: rewrite only segments holding matching rows"

  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("table", StringType).build(),
    ProcedureParameter.in("predicate", StringType).build())

  override val outputSchema: StructType = StructType(Seq(
    StructField("segments_total", IntegerType, nullable = false),
    StructField("segments_rewritten", IntegerType, nullable = false),
    StructField("rows_deleted", LongType, nullable = false)))

  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val dir = resolveTableDir(input.getUTF8String(0).toString)
    val (total, rewritten, deleted) =
      GraftDml.deleteWhere(dir, input.getUTF8String(1).toString)
    result(total, rewritten, deleted)
  }
}

/** `CALL <cat>.system.update_where(table, predicate, assignments)` — the
  * UPDATE twin of delete_where: discovery scan finds the segments holding
  * matching rows, ONLY those are read back, matching rows get the assignments
  * applied (all right-hand sides evaluate against PRE-update values, the SQL
  * UPDATE contract) and non-matching rows pass through unchanged, one new
  * segment replaces exactly the touched set. SQL `UPDATE` remains available
  * with whole-table group-rewrite semantics (Spark has no SupportsUpdate
  * push-down API — this procedure IS the segment-level path).
  * `assignments` is `col = expr, col2 = expr2` with top-level commas only. */
private[catalog] final class UpdateWhereProcedure(catalog: GraftCatalog)
  extends GraftProcedure(catalog) {

  override def name(): String = "update_where"
  override def description(): String =
    "segment-level copy-on-write update: rewrite only segments holding matching rows"

  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("table", StringType).build(),
    ProcedureParameter.in("predicate", StringType).build(),
    ProcedureParameter.in("assignments", StringType).build())

  override val outputSchema: StructType = StructType(Seq(
    StructField("segments_total", IntegerType, nullable = false),
    StructField("segments_rewritten", IntegerType, nullable = false),
    StructField("rows_updated", LongType, nullable = false)))

  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val dir = resolveTableDir(input.getUTF8String(0).toString)
    val (total, rewritten, updated) = GraftDml.updateWhere(dir,
      input.getUTF8String(1).toString, input.getUTF8String(2).toString)
    result(total, rewritten, updated)
  }
}

/** `CALL <cat>.system.rewrite_deletes(table)` — MATERIALIZE the current
  * snapshot's delete vectors (Iceberg's rewrite_position_delete_files +
  * rewrite_data_files in one step, at segment granularity): every DV'd
  * segment is rewritten DV-merged in ONE distributed job (rows route back to
  * their source suffix — partition purity and per-generation layout
  * preserved; dirty segments sharing a suffix merge into that suffix's one
  * new segment), the vectors drop with the replaced segments, and CLEAN
  * segments are not touched — restoring the full vectorized read path that
  * row-filtered merge-on-read scans give up. A no-op (zero rewrites, no
  * commit) when the table carries no vectors. */
private[catalog] final class RewriteDeletesProcedure(catalog: GraftCatalog)
  extends GraftProcedure(catalog) {

  override def name(): String = "rewrite_deletes"
  override def description(): String =
    "materialize delete vectors: rewrite DV'd segments minus their deleted rows"

  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("table", StringType).build(),
    ProcedureParameter.in("target_file_bytes", LongType)
      .defaultValue(String.valueOf(128L * 1024 * 1024)).build())

  override val outputSchema: StructType = StructType(Seq(
    StructField("segments_rewritten", IntegerType, nullable = false),
    StructField("vectors_removed", IntegerType, nullable = false),
    StructField("rows_dropped", LongType, nullable = false)))

  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val dir = resolveTableDir(input.getUTF8String(0).toString)
    val target = input.getLong(1)
    require(target > 0, "graft rewrite_deletes: target_file_bytes must be positive")
    val spark = SparkSession.active
    val meta = GraftMeta.read(dir)
    val segs = meta.snapshots(meta.current)
    val dvMap = GraftDv.forSegments(meta, meta.current, segs)
    if (dvMap.isEmpty) return result(0, 0, 0L)
    val dvNames = dvMap.valuesIterator.flatten.toSeq.distinct
    val droppedRows = spark.read
      .parquet(dvNames.map(d => dir.resolve(d).toString): _*).count()
    // ONE distributed job rewrites every dirty segment DV-merged (clean
    // segments are never read); rows route back to their source segment's
    // suffix, so partition purity and per-generation layout are preserved —
    // the same rewriteGroupsOneJob path compaction uses, replacing the
    // previous driver loop of one read→write job per dirty segment (dirty
    // segments sharing a suffix merge into that suffix's one new segment —
    // strictly fewer small files, same rows). Slots size like compact:
    // ceil(dirty-group bytes / target) writers per suffix — a hardcoded 1
    // would serialize a large unpartitioned MOR rewrite into ONE task
    // writing ONE unbounded file.
    val dirty = dvMap.keys.toSeq.sorted
    val slots = dirty.groupBy(s => GraftPartitions.suffixOf(s).getOrElse(""))
      .map { case (suffix, group) =>
        val bytes = group.map(dir.resolve).flatMap(parquetFiles).map(Files.size).sum
        suffix -> math.max(1L, (bytes + target - 1) / target).toInt
      }
    val rewritten = GraftDml.rewriteGroupsOneJob(dir, meta, dirty, slots)
    GraftDml.cleanupOnFailedCommit(dir, rewritten.map(_._1)) {
      GraftMeta.commitReplaceSegments(dir, rewritten, dvMap.keySet,
        expectedCurrent = Some(meta.current))
    }
    result(rewritten.size, dvNames.size, droppedRows)
  }
}

/** `CALL <cat>.system.upsert(table, source, keys)` — MERGE-ON-READ UPSERT,
  * the continuous-CDC-apply primitive (the Delta merge-upsert / Hudi upsert
  * shape): every source row becomes the CURRENT version of its key — rows
  * whose key matches a live target row have the old position recorded in a
  * delete vector, and the WHOLE source appends as new partition-pure
  * segments; one atomic commit, no existing segment rewritten. Cost is one
  * probe of the target (broadcast-joined against the source — no shuffle of
  * the table) plus O(source) written: the shape a 100 TB table ingesting a
  * CDC feed runs every few minutes, where copy-on-write MERGE would rewrite
  * every touched segment each batch.
  *
  * `source` is a session view/table name with the target's columns (matched
  * BY NAME, case-insensitive); `keys` is the comma-separated match key. The
  * standard MERGE cardinality rule is enforced: duplicate keys in the
  * source fail loudly (two versions of one key in one batch would both
  * land). NULL keys never match a target row (SQL join semantics) and
  * insert like any unmatched row. */
private[catalog] final class UpsertProcedure(catalog: GraftCatalog)
  extends GraftProcedure(catalog) {

  override def name(): String = "upsert"
  override def description(): String =
    "merge-on-read upsert: vector matched rows' old positions, append the source as new versions"

  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("table", StringType).build(),
    ProcedureParameter.in("source", StringType).build(),
    ProcedureParameter.in("keys", StringType).build(),
    // optional exactly-once key: a replayed batch_id is a complete no-op
    ProcedureParameter.in("batch_id", StringType).defaultValue("''").build())

  override val outputSchema: StructType = StructType(Seq(
    StructField("rows_updated", LongType, nullable = false),
    StructField("rows_inserted", LongType, nullable = false),
    StructField("segments_appended", IntegerType, nullable = false)))

  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val dir = resolveTableDir(input.getUTF8String(0).toString)
    val batch = Option(input.getUTF8String(3)).map(_.toString).filter(_.nonEmpty)
    val (updated, inserted, appended) = GraftDml.upsertMor(dir,
      input.getUTF8String(1).toString, input.getUTF8String(2).toString, batch)
    result(updated, inserted, appended)
  }
}

/** `CALL <cat>.system.rewrite_clustered(table, cols[, segments])` — Z-ORDER
  * clustering: rewrite the current snapshot into `segments` range-partitioned
  * segments ordered by the INTERLEAVED-BIT key of 2–3 numeric/date/timestamp
  * columns (Morton order), so each output segment holds a small HYPERCUBE of
  * the key space and its zone-map bounds are tight on EVERY clustered column
  * — a selective predicate on ANY of them then prunes ~n^((d-1)/d) of the
  * table at PLAN time, where lexicographic `write.order-by` only serves its
  * leading column. The Delta OPTIMIZE ZORDER / Iceberg sort-order rewrite
  * recipe, expressed on the graft segment layer:
  *
  *   - per-column normalization bounds come from the COMMITTED zone stats
  *     (zero pre-pass IO; bucketing quality needs approximate bounds only —
  *     row content is identical whatever the key does);
  *   - ONE distributed job: DV-merged read → range shuffle on the z-key into
  *     exactly `segments` tasks (explicit width, so AQE cannot coalesce the
  *     grid) → per-task sort by z-key (parquet row-group bounds inside each
  *     segment tighten too) → each task lands its own `zc<i>`-suffixed
  *     segment through the same staging/manifest writer compaction uses;
  *   - ONE commit swaps the whole snapshot under `expectedCurrent` (a
  *     concurrent append fails the rewrite loudly, never vanishes), delete
  *     vectors materialize and drop with the replaced segments, and every
  *     pre-rewrite snapshot stays readable;
  *   - compaction preserves the layout afterwards (it groups by FULL suffix,
  *     so each `zc<i>` cell compacts within itself). Documented seam: a
  *     later COW delete/update rewrites its touched cells into ONE new
  *     segment (bounds of that segment widen to the touched cells' union —
  *     re-run rewrite_clustered to restore the grid).
  *
  * Refusals (honest, with remediation named): partitioned/bucketed tables
  * (clustering across partition values would destroy the purity every pruned
  * scan and partition-scoped DML depends on — use `write.order-by` within
  * partitions), non-numeric columns, fewer than 2 / more than 3 columns
  * (one column is `write.order-by`'s job; >3 dilutes every dimension), and
  * segments lacking decodable stats for a clustered column. */
private[catalog] final class RewriteClusteredProcedure(catalog: GraftCatalog)
  extends GraftProcedure(catalog) {

  override def name(): String = "rewrite_clustered"
  override def description(): String =
    "rewrite the current snapshot into z-order-clustered segments (tight multi-column zone bounds)"

  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("table", StringType).build(),
    ProcedureParameter.in("cols", StringType).build(),
    ProcedureParameter.in("segments", IntegerType).defaultValue("16").build())

  override val outputSchema: StructType = StructType(Seq(
    StructField("segments_before", IntegerType, nullable = false),
    StructField("segments_after", IntegerType, nullable = false),
    StructField("rows", LongType, nullable = false)))

  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val dir = resolveTableDir(input.getUTF8String(0).toString)
    val cols = input.getUTF8String(1).toString
    val n = input.getInt(2)
    require(n >= 2 && n <= 4096,
      s"graft rewrite_clustered: segments must be in [2, 4096], got $n")
    val (before, after, rows) = GraftDml.rewriteClustered(dir, cols, n)
    result(before, after, rows)
  }
}

/** The segment-level copy-on-write delete core, shared by the `delete_where`
  * procedure and SQL `DELETE FROM` routed through `SupportsDeleteV2`.
  * Returns (segments_total, segments_rewritten, rows_deleted). */
private[catalog] object GraftDml {
  import org.apache.spark.sql.{Column, DataFrame}
  import org.apache.spark.sql.functions.{coalesce, col, expr, lit, not, when}

  private def segName(filePath: String): String =
    java.nio.file.Paths.get(java.net.URI.create(filePath).getPath)
      .getParent.getFileName.toString

  /** ONE discovery scan: per-segment counts of rows where `matches` is TRUE
    * (`__g_file` from `_metadata.file_path` + parquet pushdown). Gives both
    * the touched set and the affected-row count — neither DML core re-scans
    * for it. `all` must come from [[readLive]] with keepMeta=true, so DV'd
    * rows never count as matches. */
  private def discoverTouched(all: DataFrame, matches: Column): Map[String, Long] =
    all.where(matches)
      .groupBy(col("__g_fp")).count().collect()
      .map(r => segName(r.getString(0)) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap

  /** DV-merged read of `segs` at the CURRENT snapshot (the DML rewrite
    * primitive — a copy-on-write rewrite of a DV'd segment must not
    * resurrect its deleted rows). */
  private def readLive(spark: SparkSession, dir: java.nio.file.Path,
                       meta: GraftMeta, segs: Seq[String],
                       keepMeta: Boolean = false): DataFrame =
    GraftDv.readLive(spark, dir, meta.readSchema, segs,
      GraftDv.forSegments(meta, meta.current, segs), keepMeta)

  /** The table-owned write layout, applied to a DML rewrite the same way
    * RequiresDistributionAndOrdering applies it to INSERT/MERGE writes — a
    * rewritten segment must not silently lose the clustering/sortedness its
    * zone maps and row-group stats depend on. (Compaction's size-targeted
    * variant lives in rewriteGroupsOneJob's slot salting.) */
  private[catalog] def applyLayout(df: DataFrame, props: Map[String, String]): DataFrame = {
    val clustered = props.get(GraftTable.ClusterByProp) match {
      case Some(cols) =>
        val keys = cols.split(',').map(c => df(c.trim)).toSeq
        df.repartition(keys: _*)
      case None => df
    }
    props.get(GraftTable.OrderByProp) match {
      case Some(cols) =>
        clustered.sortWithinPartitions(cols.split(',').map(c => clustered(c.trim)).toSeq: _*)
      case None => clustered
    }
  }

  /** Delete fully-written rewrite segments whose commit lost the optimistic
    * race — without this, every lost CAS leaks unreferenced segment dirs
    * until the orphan sweep finds them. */
  private[catalog] def cleanupOnFailedCommit[A](dir: java.nio.file.Path,
                                                segments: Seq[String])(commit: => A): A =
    try commit
    catch {
      case e: Throwable =>
        segments.foreach(s => scala.util.Try(GraftMeta.deleteRecursively(dir.resolve(s))))
        throw e
    }

  private def writeOneSegment(dir: java.nio.file.Path, meta: GraftMeta,
                              df: DataFrame, segment: String): (String, Option[String]) = {
    // re-apply the table's column ids: plan transforms do not reliably carry
    // source metadata, and an id-less rewritten segment would strand the
    // table outside RENAME's id resolution (GraftFieldIds)
    GraftFieldIds.applyIds(applyLayout(df, meta.props), meta.schema)
      .write.parquet(dir.resolve(segment).toString)
    val stats = scala.util.Try(SegmentStats.encode(SegmentStats.harvest(
      SparkSession.active, dir.resolve(segment).toString, meta.readSchema,
      SegmentStats.sumCols(meta.props, meta.schema),
        GraftBloom.cols(meta.props, meta.schema),
        SegmentStats.ndvCols(meta.props, meta.schema),
        klls = SegmentStats.kllCols(meta.props, meta.schema)))).toOption
    (segment, stats)
  }

  /** Run the fan-out write job: each task routes its rows through `factory`
    * into the staging dir and returns a file manifest. Task attempt ids keep
    * retried/speculative attempts' files distinct; only the winning attempt's
    * manifest reaches the driver, so losers' files die with the staging dir —
    * the same manifest protocol as the V2 partitioned writer's commit. */
  private def runFanOutJob(
      prepared: DataFrame,
      factory: org.apache.spark.sql.connector.write.DataWriterFactory)
    : Array[(String, String)] =
    prepared.queryExecution.toRdd.mapPartitionsWithIndex { (pid, rows) =>
      val w = factory.createWriter(pid, org.apache.spark.TaskContext.get().taskAttemptId())
      try {
        rows.foreach(w.write)
        Iterator.single(w.commit())
      } catch { case t: Throwable => w.abort(); throw t }
    }.collect().flatMap {
      case m: GraftPartitionFilesMessage => m.files
      case _ => Nil
    }

  /** Move manifest files out of `staging` into final segment dirs — one
    * partition-pure segment per suffix ('' = the unsuffixed segment) — and
    * harvest each segment's commit-time stats. */
  private def landManifest(dir: java.nio.file.Path, meta: GraftMeta,
                           staging: java.nio.file.Path, writeId: String,
                           manifest: Array[(String, String)])
    : Seq[(String, Option[String])] = {
    val spark = SparkSession.active
    // land files serially (cheap local renames), then harvest every segment's
    // stats CONCURRENTLY (r21 — the per-segment footer pass was the rewrite
    // commit's serial driver tail)
    val landed = manifest.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
      .toSeq.sortBy(_._1).map { case (enc, fileNames) =>
        val seg = if (enc.isEmpty) s"seg-$writeId"
          else s"seg-$writeId${GraftPartitions.Marker}$enc"
        val segDir = dir.resolve(seg)
        Files.createDirectories(segDir)
        fileNames.foreach(f =>
          Files.move(staging.resolve(enc).resolve(f), segDir.resolve(f)))
        (seg, segDir)
      }
    val allStats = SegmentStats.harvestAll(
      spark, landed.map(_._2.toString), meta.schema,
      SegmentStats.sumCols(meta.props, meta.schema),
      GraftBloom.cols(meta.props, meta.schema),
      SegmentStats.ndvCols(meta.props, meta.schema),
      klls = SegmentStats.kllCols(meta.props, meta.schema))
    landed.map(_._1).zip(allStats)
  }

  private def parquetWriterFactory(spark: SparkSession, schema: StructType)
    : (org.apache.spark.sql.execution.datasources.OutputWriterFactory, SerializableHadoopConf) = {
    val job = org.apache.hadoop.mapreduce.Job.getInstance(spark.sessionState.newHadoopConf())
    val owf = new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat()
      .prepareWrite(spark, job, Map.empty[String, String], schema)
    (owf, new SerializableHadoopConf(job.getConfiguration))
  }

  /** Land a DML rewrite. Unpartitioned: one segment, one job. Partitioned:
    * ONE distributed job writes every partition-pure segment — rows shuffle
    * on (partition cols ++ table cluster-by), each task fans out per
    * partition value through the same OutputWriter + staging + manifest
    * machinery the V2 partitioned writer uses (GraftPartitionedWriterFactory),
    * and the driver moves exactly the manifest files into final segment dirs.
    * A rewrite touching 10k partitions is ONE job, never a driver loop of 10k
    * sequential per-partition jobs (the round-11 scale seam); crashed or
    * losing task attempts leak only invisible staging files the orphan sweep
    * reclaims. Rows route under the CURRENT partition spec (rewrites migrate
    * old-spec data incrementally — the partition-evolution contract), and the
    * suffix comes from the same InternalRow extractors the V2 writer uses, so
    * a rewritten partition keeps a byte-identical suffix. */
  private[catalog] def writeSegments(dir: java.nio.file.Path, meta: GraftMeta,
                                     df: DataFrame): Seq[(String, Option[String])] = {
    val routed = GraftPartitions.routedFields(meta.props)
    val partCols = routed.map(_.source)
    if (routed.isEmpty)
      return Seq(writeOneSegment(dir, meta, df,
        s"seg-${UUID.randomUUID().toString.take(12)}"))
    val spark = df.sparkSession
    val schema = meta.schema
    val cluster = meta.props.get(GraftTable.ClusterByProp).toSeq
      .flatMap(_.split(',')).map(_.trim)
      .filterNot(c => partCols.exists(_.equalsIgnoreCase(c)))
    val shuffled = df.repartition((partCols ++ cluster).map(df(_)): _*)
    val ordered = meta.props.get(GraftTable.OrderByProp) match {
      case Some(cols) => shuffled.sortWithinPartitions(
        cols.split(',').map(c => shuffled(c.trim)).toSeq: _*)
      case None => shuffled
    }
    // pin column order to the table schema so the factory's extractor
    // ordinals line up (projection preserves the shuffle's distribution)
    val prepared = ordered.select(schema.fieldNames.map(col).toSeq: _*)
    val partFields = routed.map { pf =>
      val i = schema.fieldNames.indexWhere(_.equalsIgnoreCase(pf.source))
      (i, schema.fields(i).dataType, pf.bucketN)
    }
    val writeId = UUID.randomUUID().toString.take(12)
    val staging = dir.resolve(s"seg-staging@${UUID.randomUUID().toString.take(12)}")
    val (owf, conf) = parquetWriterFactory(spark, schema)
    try {
      val manifest = runFanOutJob(prepared,
        new GraftPartitionedWriterFactory(owf, conf, staging.toString,
          schema, partFields, fromRowLevelOp = false,
          GraftPartitions.specId(meta.props)))
      landManifest(dir, meta, staging, writeId, manifest)
    } finally GraftMeta.deleteRecursively(staging)
  }

  /** Does this COW rewrite qualify for CELL-PRESERVING routing (r17; r18
    * extends it to per-partition grids)? True when EVERY touched segment
    * carries a z-order CELL suffix — the unpartitioned `zc<i>` form or the
    * partitioned `<part>~zc<i>` form rewrite_clustered laid down. Rows route
    * back through their source suffix, so both the cell grid AND partition
    * purity survive (updateWhere refuses partition-column assignment, so no
    * row can need to move). Mixed snapshots (a plain append after
    * clustering) fall back to the value-routed rewrite for the plain
    * segments' sake; re-run rewrite_clustered to restore. */
  private def zcellPreserving(meta: GraftMeta, touched: Set[String]): Boolean =
    touched.nonEmpty &&
      touched.forall(s => GraftPartitions.suffixOf(s).exists(GraftPartitions.hasCellTail))

  /** Cell-preserving COW rewrite for Z-ORDERED tables: surviving rows route
    * BACK through their source `zc<i>` cell (the suffix-carry contract
    * compaction follows), so row-level DML keeps the clustering grid — cell
    * count and untouched dimensions' bounds — instead of collapsing the
    * touched cells into one wide-bounds segment that would cost every later
    * probe its pruning. An update that moves a row's clustered-column values
    * leaves it in its OLD cell (that cell's bounds widen; pruning stays
    * CORRECT, rewrite_clustered restores tightness). In-cell row order is
    * not re-derived (the zkey function is not persisted) — cell-level zone
    * bounds are what plan-time pruning reads. `transform` sees the DV-merged
    * rows WITH their `__g_route` column and must keep it. */
  private def rewritePreservingCells(dir: java.nio.file.Path, meta: GraftMeta,
      touched: Seq[String], transform: DataFrame => DataFrame)
    : Seq[(String, Option[String])] = {
    val spark = SparkSession.active
    val schema = meta.schema
    val routeOf = org.apache.spark.sql.functions.udf((fp: String) =>
      GraftPartitions.suffixOf(segName(fp)).getOrElse(""))
    val live = readLive(spark, dir, meta, touched, keepMeta = true)
    val transformed = transform(live.withColumn("__g_route", routeOf(col("__g_fp"))))
    val prepared = transformed
      .select((col("__g_route") +: lit(0).as("__g_slot") +:
        schema.fieldNames.map(col).toSeq): _*)
      .repartition(col("__g_route"))
    val writeId = UUID.randomUUID().toString.take(12)
    val staging = dir.resolve(s"seg-staging@${UUID.randomUUID().toString.take(12)}")
    val (owf, conf) = parquetWriterFactory(spark, schema)
    try {
      landManifest(dir, meta, staging, writeId, runFanOutJob(prepared,
        new GraftRouteWriterFactory(owf, conf, staging.toString, schema)))
    } finally GraftMeta.deleteRecursively(staging)
  }

  /** Compaction's ONE-job rewrite of the whole current snapshot: every row
    * routes back to its SOURCE segment's partition suffix (groups by FULL
    * suffix — each spec generation keeps its own layout byte-identically,
    * never migrated, matching the dynamic-overwrite mixed-layout refusal),
    * salted into `slotsBySuffix(suffix)` shuffle slots so each group lands
    * ~ceil(bytes/target) output files. Cluster-by tables salt on the cluster
    * key (a key never splits across files — the zone-map contract); plain
    * tables salt on all columns. Returns the new (segment, stats) set;
    * untouched semantics aside, this replaces the previous driver loop of
    * one read→write job per partition group. */
  private[catalog] def rewriteGroupsOneJob(dir: java.nio.file.Path, meta: GraftMeta,
                                           segs: Seq[String],
                                           slotsBySuffix: Map[String, Int])
    : Seq[(String, Option[String])] = {
    val spark = SparkSession.active
    val schema = meta.schema
    import org.apache.spark.sql.functions.{broadcast, greatest, hash, pmod, udf}
    // route = the source segment's suffix ('' when unsuffixed), recovered
    // from the scan's file path with EXACTLY the discovery scan's parsing
    // (URI decode, parent dir name) so encoded suffix bytes round-trip
    val routeOf = udf((fp: String) =>
      GraftPartitions.suffixOf(segName(fp)).getOrElse(""))
    val live = readLive(spark, dir, meta, segs, keepMeta = true)
      .withColumn("__g_route", routeOf(col("__g_fp")))
    val slots = spark.createDataFrame(
      slotsBySuffix.toSeq.map { case (s, n) => (s, n) }).toDF("__g_route", "__g_slots")
    val joined = live.join(broadcast(slots), Seq("__g_route"), "left")
    // salt inputs must be HASHABLE: Spark's hash() rejects MapType, so map
    // columns are dropped from the default all-columns salt (a map-only
    // schema degenerates to one slot — correct, just unsplit)
    def hasMap(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => true
      case a: org.apache.spark.sql.types.ArrayType => hasMap(a.elementType)
      case st: org.apache.spark.sql.types.StructType => st.fields.exists(f => hasMap(f.dataType))
      case _ => false
    }
    val saltCols = meta.props.get(GraftTable.ClusterByProp) match {
      case Some(cols) => cols.split(',').map(c => col(c.trim)).toSeq
      case None =>
        schema.fields.filterNot(f => hasMap(f.dataType)).map(f => col(f.name)).toSeq
    }
    // the slot picks the output FILE within a group (the writer fans out per
    // (suffix, slot), so ceil(bytes/target) files per group holds even when
    // AQE coalesces the tiny-table shuffle into one task); it is also a
    // shuffle key, so at scale each slot's rows land in one task
    val salt = pmod(
      if (saltCols.isEmpty) lit(0L) else hash(saltCols: _*).cast("bigint"),
      greatest(coalesce(col("__g_slots"), lit(1)), lit(1))).cast("int").as("__g_slot")
    val slotted = joined.select(
      (col("__g_route") +: salt +: schema.fieldNames.map(col)).toSeq: _*)
    val shuffled = slotted.repartition(col("__g_route"), col("__g_slot"))
    val prepared = meta.props.get(GraftTable.OrderByProp) match {
      case Some(cols) => shuffled.sortWithinPartitions(
        cols.split(',').map(c => shuffled(c.trim)).toSeq: _*)
      case None => shuffled
    }
    val writeId = UUID.randomUUID().toString.take(12)
    val staging = dir.resolve(s"seg-staging@${UUID.randomUUID().toString.take(12)}")
    val (owf, conf) = parquetWriterFactory(spark, schema)
    try {
      val manifest = runFanOutJob(prepared,
        new GraftRouteWriterFactory(owf, conf, staging.toString, schema))
      landManifest(dir, meta, staging, writeId, manifest)
    } finally GraftMeta.deleteRecursively(staging)
  }

  /** Z-order rewrite core (RewriteClusteredProcedure). Returns
    * (segments_before, segments_after, rows_after). */
  private[catalog] def rewriteClustered(dir: java.nio.file.Path, colsCsv: String,
                                        n: Int): (Int, Int, Long) = {
    import org.apache.spark.sql.functions.{concat, concat_ws, floor, greatest,
      least, shiftleft, shiftright, udf, unix_date, unix_micros}
    val spark = SparkSession.active
    val meta = GraftMeta.read(dir)
    // Partitioned tables cluster WITHIN each partition (r18): rows never
    // cross partition values — each output segment is suffixed
    // `<part>~zc<i>`, so partition purity (pruned scans, partition-scoped
    // DML, dynamic overwrite via baseSuffix matching) is preserved while
    // every partition gains a cell grid with tight multi-column bounds —
    // the Iceberg sort-order-within-partition shape. Bucketed tables still
    // refuse (hash buckets already pin the key's co-location; clustering
    // within a bucket serves no pruning the bucket id doesn't).
    val routed = GraftPartitions.routedFields(meta.props)
    require(routed.forall(_.bucketN.isEmpty),
      "graft rewrite_clustered: bucket-partitioned tables are refused — " +
        "hash buckets already co-locate the key; cluster a copy without " +
        "bucketing, or order within buckets via write.order-by")
    val partCols = routed.map(_.source)
    val names = colsCsv.split(',').map(_.trim).filter(_.nonEmpty).toSeq
    require(names.length >= 2 && names.length <= 3,
      s"graft rewrite_clustered: z-order takes 2-3 columns, got ${names.length} " +
        "(one column is write.order-by's job; more than 3 dilutes every dimension)")
    names.find(nm => partCols.exists(_.equalsIgnoreCase(nm))).foreach(nm =>
      throw new IllegalArgumentException(
        s"graft rewrite_clustered: '$nm' is a partition column — constant " +
          "within each partition, so it cannot contribute a z-order " +
          "dimension; cluster on non-partition columns"))
    val schema = meta.schema
    val fields = names.map(nm => schema.fields.find(_.name.equalsIgnoreCase(nm))
      .getOrElse(throw new IllegalArgumentException(
        s"graft rewrite_clustered: no column '$nm'")))
    fields.foreach(f => require(f.dataType match {
      case ByteType | ShortType | IntegerType | LongType | DateType | TimestampType => true
      case _ => false
    }, s"graft rewrite_clustered: '${f.name}' is ${f.dataType.simpleString} — " +
      "z-order normalizes integral/date/timestamp columns only"))

    val segs = meta.snapshots(meta.current)
    // per-column normalization bounds from the COMMITTED stats — zero IO;
    // approximate bounds only steer bucket quality, never row content
    val decoded = segs.map { s =>
      meta.zstats.get(s).flatMap(z => scala.util.Try(SegmentStats.decode(z)).toOption)
        .getOrElse(throw new IllegalStateException(
          s"graft rewrite_clustered: segment '$s' has no decodable stats " +
            "(add_files import without footer stats?) — compact first"))
    }
    val bounds = fields.map { f =>
      val per = decoded.map(_.cols.get(f.name).getOrElse(
        throw new IllegalStateException(
          s"graft rewrite_clustered: segment stats lack column '${f.name}' " +
            "(written before ADD COLUMN?) — compact first")))
      val mins = per.flatMap(_.min).map(_.toLong)
      val maxs = per.flatMap(_.max).map(_.toLong)
      (f, if (mins.isEmpty) 0L else mins.min, if (maxs.isEmpty) 0L else maxs.max)
    }

    // the interleaved key: bit b of column j lands at position b*d + j, so
    // every clustered column contributes equally at every scale of the curve
    val d = bounds.size
    val bits = 62 / d // 31 bits/col at d=2, 20 at d=3 — plenty for bucketing
    val maxNorm = (1L << bits) - 1
    def asLong(f: StructField): Column = f.dataType match {
      case DateType      => unix_date(col(f.name)).cast("long")
      case TimestampType => unix_micros(col(f.name))
      case _             => col(f.name).cast("long")
    }
    val norms = bounds.map { case (f, mn, mx) =>
      val range = math.max(1L, mx - mn).toDouble
      // doubles: (v-mn)*maxNorm can exceed 2^53 for i64-wide domains; the
      // rounding only blurs bucket edges (content is key-independent)
      coalesce(least(lit(maxNorm), greatest(lit(0L),
        floor((asLong(f).cast("double") - mn.toDouble) * maxNorm / range).cast("long"))),
        lit(0L)) // NULLs cluster into the lowest cell
    }
    val zkey = (for { (nc, j) <- norms.zipWithIndex; b <- 0 until bits }
      yield shiftleft(shiftright(nc, b).bitwiseAND(lit(1L)), b * d + j))
      .reduce(_ + _) // disjoint bit positions: + is OR

    // ONE rewrite job over the DV-merged read. The grid is DEFINED by
    // explicit split points (approx-quantiles of the zkey, r17 — previously
    // an unrecoverable repartitionByRange sampling) and PERSISTED with the
    // per-column bounds (GraftZOrder), so every LATER batch write routes its
    // rows through the same function and the table STAYS clustered under
    // ingest and SQL row-level DML (GraftClusteredWrite — the steady-state
    // rung; compaction folds each cell's append generations back to one
    // segment). The quantile pass costs one extra scan at rewrite time;
    // rows then shuffle on their cell (explicit width n so AQE cannot
    // coalesce the grid) and z-sort in-task so row-group bounds tighten.
    val live = readLive(spark, dir, meta, segs)
    val keyed = live.withColumn("__zc_key", zkey)
    val splits =
      keyed.stat.approxQuantile("__zc_key",
        (1 until n).map(_.toDouble / n).toArray, 0.001).map(_.toLong)
    val specOut = GraftZOrder.Spec(fields.map(_.name),
      bounds.map { case (_, mn, mx) => (mn, mx) }, splits)
    val cellOf = udf((z: Long) => specOut.cellOf(z))
    // route = `[<part>~]zc<i>`: partitioned tables cluster WITHIN each
    // partition value — the route string prepends the row's spec-qualified
    // partition suffix (canonical CAST-AS-STRING form, %-encoded — the
    // byte-identical convention every partition-pure writer shares), so each
    // output segment stays partition-pure AND cell-pure. Shared bounds +
    // split points across partitions: cells are mass-balanced GLOBALLY (a
    // skewed partition fills its hot cells; pruning reads per-segment zone
    // bounds either way).
    val routeCol =
      if (partCols.isEmpty)
        concat(lit("zc"), col("__zc_cell").cast("string"))
      else {
        val sid = GraftPartitions.specId(meta.props)
        val encode = udf((s: String) => GraftPartitions.encodeString(s))
        val tuple = concat_ws("_", partCols.map(c => encode(col(c).cast("string"))): _*)
        val part = if (sid == 0L) tuple else concat(lit(s"$sid~"), tuple)
        concat(part, lit("~zc"), col("__zc_cell").cast("string"))
      }
    // explicit shuffle width = the full grid (cells x touched partitions,
    // capped) so AQE cannot fold the rewrite into too few sorted streams;
    // the route-keyed fan-out writer lands one file per (partition, cell)
    // whatever the task count
    val partCount = math.max(1,
      segs.flatMap(GraftPartitions.suffixOf).map(GraftPartitions.baseSuffix).distinct.size)
    val width = math.min(n.toLong * (if (partCols.isEmpty) 1L else partCount.toLong),
      4096L).toInt
    val ranged = keyed.withColumn("__zc_cell", cellOf(col("__zc_key")))
      .withColumn("__g_route", routeCol)
      .repartition(width, col("__g_route"))
      .sortWithinPartitions("__g_route", "__zc_key")
    val prepared = ranged.select(
      (col("__g_route") +:
        lit(0).as("__g_slot") +: schema.fieldNames.map(col).toSeq): _*)
    val writeId = UUID.randomUUID().toString.take(12)
    val staging = dir.resolve(s"seg-staging@${UUID.randomUUID().toString.take(12)}")
    val (owf, conf) = parquetWriterFactory(spark, schema)
    val rewritten = try {
      landManifest(dir, meta, staging, writeId, runFanOutJob(prepared,
        new GraftRouteWriterFactory(owf, conf, staging.toString, schema)))
    } finally GraftMeta.deleteRecursively(staging)
    cleanupOnFailedCommit(dir, rewritten.map(_._1)) {
      // the routing spec persists for BOTH layouts (r18 closed the
      // partitioned seam): unpartitioned tables route later writes through
      // GraftClusteredWrite, partitioned tables through
      // GraftPartitionedWrite's composed (partition, cell) router — either
      // way the grid is steady-state and `compact` folds per full suffix.
      GraftMeta.commitMany(dir, rewritten, replaceAll = true,
        removeSuffixes = Set.empty, expectedCurrent = Some(meta.current),
        namedKey = None,
        propsUpdate = GraftZOrder.render(specOut))
    }
    val rows = rewritten.flatMap(_._2)
      .flatMap(z => scala.util.Try(SegmentStats.decode(z).rows).toOption).sum
    (segs.size, rewritten.size, rows)
  }

  /** `a = expr, b = expr2` split on TOP-LEVEL commas only (parens and quoted
    * strings protected), so multi-argument calls in a right-hand side work. */
  private def splitAssignments(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    var quoted = false
    s.foreach {
      case '\''            => quoted = !quoted; cur += '\''
      case c if quoted     => cur += c
      case '('             => depth += 1; cur += '('
      case ')'             => depth -= 1; cur += ')'
      case ',' if depth == 0 => out += cur.toString; cur.clear()
      case c               => cur += c
    }
    out += cur.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** Segment-level copy-on-write UPDATE. Matching rows (predicate TRUE — SQL
    * three-valued semantics, NULL rows pass through) get `assignments`
    * applied in ONE projection, so every right-hand side sees the PRE-update
    * column values; untouched segments carry over by reference. Returns
    * (segments_total, segments_rewritten, rows_updated). */
  def updateWhere(dir: java.nio.file.Path, predicate: String,
                  assignments: String): (Int, Int, Long) = {
    val spark = SparkSession.active
    val meta = GraftMeta.read(dir)
    val segs = meta.snapshots(meta.current)
    if (segs.isEmpty) return (0, 0, 0L)
    val parts = splitAssignments(assignments)
    require(parts.nonEmpty, "graft update_where: no assignments given")
    val assigned = parts.map { a =>
      require(a.contains("="), s"graft update_where: assignment '$a' has no '='")
      val Array(name, rhs) = a.split("=", 2).map(_.trim)
      // resolve case-insensitively, like every other SQL identifier here
      val field = meta.schema.fieldNames.find(_.equalsIgnoreCase(name))
        .getOrElse(throw new IllegalArgumentException(
          s"graft update_where: no column '$name' to assign"))
      field -> rhs
    }
    require(assigned.map(_._1).distinct.size == assigned.size,
      s"graft update_where: a column is assigned more than once")
    val assignedMap = assigned.toMap
    val matches = coalesce(expr(predicate), lit(false))
    if (GraftDv.mode(meta.props, GraftDv.UpdateModeProp) == GraftDv.ModeMor)
      return updateWhereMor(spark, dir, meta, segs, matches, assignedMap)
    val touchedCounts =
      discoverTouched(readLive(spark, dir, meta, segs, keepMeta = true), matches)
    if (touchedCounts.isEmpty) return (segs.size, 0, 0L)
    val touched = touchedCounts.keySet
    // cast INSIDE the branch: CaseWhen coerces both branches to a common
    // type first, so an outer cast would round-trip non-matching rows'
    // values through e.g. DOUBLE and corrupt them
    val projExprs: Seq[Column] = meta.schema.fields.toSeq.map { f =>
      assignedMap.get(f.name) match {
        case Some(rhs) =>
          when(matches, expr(rhs).cast(f.dataType)).otherwise(col(f.name)).as(f.name)
        case None => col(f.name)
      }
    }
    // guard the partition invariant: UPDATE must not move a row across
    // partitions (the rewrite would silently create a new partition while the
    // row's old partition still lists it under the swapped-out segment only) —
    // assigning a partition column is refused, the Iceberg/Delta contract
    GraftPartitions.cols(meta.props).foreach(pc => require(
      !assignedMap.keys.exists(_.equalsIgnoreCase(pc)),
      s"graft update_where: partition column '$pc' cannot be assigned " +
        "(delete + insert to move rows across partitions)"))
    val segments =
      // z-ordered grid: rewritten rows route back through their source cell
      if (zcellPreserving(meta, touched))
        rewritePreservingCells(dir, meta, segs.filter(touched),
          live => live.select((col("__g_route") +: projExprs): _*))
      else writeSegments(dir, meta,
        readLive(spark, dir, meta, segs.filter(touched)).select(projExprs: _*))
    cleanupOnFailedCommit(dir, segments.map(_._1)) {
      GraftMeta.commitReplaceSegments(dir, segments, touched,
        expectedCurrent = Some(meta.current))
    }
    (segs.size, touched.size, touchedCounts.values.sum)
  }

  def deleteWhere(dir: java.nio.file.Path, predicate: String): (Int, Int, Long) = {
    val spark = SparkSession.active
    val meta = GraftMeta.read(dir)
    val segs = meta.snapshots(meta.current)
    if (segs.isEmpty) return (0, 0, 0L)
    val curDvs = GraftDv.forSegments(meta, meta.current, segs)
    val matches = coalesce(expr(predicate), lit(false)) // DELETE removes TRUE rows only
    // unconditional delete (DELETE without WHERE / TRUNCATE routed here):
    // pure metadata — commit an empty snapshot, read and write nothing.
    // zstats row counts include DV'd rows, so a table carrying delete
    // vectors falls back to a real (DV-merged) count.
    if (predicate.trim.equalsIgnoreCase("TRUE") || predicate.trim == "(TRUE)") {
      val nBefore = (if (curDvs.isEmpty)
        segs.map(s => meta.zstats.get(s)
          .flatMap(z => scala.util.Try(SegmentStats.decode(z).rows).toOption))
          .foldLeft(Option(0L)) { case (acc, r) => for (a <- acc; b <- r) yield a + b }
      else None)
        .getOrElse(readLive(spark, dir, meta, segs).count())
      GraftMeta.commitReplaceSegments(dir, Nil, segs.toSet,
        expectedCurrent = Some(meta.current))
      return (segs.size, 0, nBefore)
    }
    if (GraftDv.mode(meta.props) == GraftDv.ModeMor)
      return deleteWhereMor(spark, dir, meta, segs, matches)
    // 1. one discovery scan: touched segments AND the per-segment match
    // counts (= rows deleted) together
    val touchedCounts =
      discoverTouched(readLive(spark, dir, meta, segs, keepMeta = true), matches)
    if (touchedCounts.isEmpty) return (segs.size, 0, 0L)
    val touched = touchedCounts.keySet
    // 2. rewrite only the touched segments (one pure segment per partition
    // value on a partitioned table — a partition whose rows all die simply
    // produces no rewrite segment and vanishes from the snapshot; a z-order
    // CELL likewise: survivors route back through their source cell)
    val segments =
      if (zcellPreserving(meta, touched))
        rewritePreservingCells(dir, meta, segs.filter(touched), _.where(not(matches)))
      else writeSegments(dir, meta,
        readLive(spark, dir, meta, segs.filter(touched)).where(not(matches)))
    // 3. swap exactly the touched segments; fail on any concurrent commit —
    // applying `removed` to a changed base would resurrect deleted rows or
    // duplicate survivors — and delete the loser's segments instead of leaking
    cleanupOnFailedCommit(dir, segments.map(_._1)) {
      GraftMeta.commitReplaceSegments(dir, segments, touched,
        expectedCurrent = Some(meta.current))
    }
    (segs.size, touched.size, touchedCounts.values.sum)
  }

  /** MERGE-ON-READ update (Iceberg v2's write.update.mode=merge-on-read
    * shape): the matching rows' OLD positions go into a delete vector and
    * their NEW versions land in appended segments — ONE atomic commit, no
    * untouched row is ever rewritten. Cost is O(rows updated), not
    * O(touched-segment bytes). Unlike the copy-on-write path, assigning a
    * PARTITION column is legal here: the old position dies in its partition
    * and the new row version lands partition-pure wherever it now belongs
    * (writeSegments splits by value) — the delete+insert the COW guard tells
    * users to do by hand, performed atomically by the engine.
    *
    * Surface note: the `update_where` procedure, SQL `DELETE FROM` (via
    * SupportsDeleteV2) and SQL `MERGE INTO` (via the SupportsDelta path,
    * GraftDeltaMerge.scala) honor the mode properties; SQL `UPDATE`
    * statements remain the group-based copy-on-write rewrite (this
    * procedure IS the merge-on-read update path). */
  private def updateWhereMor(spark: SparkSession, dir: java.nio.file.Path,
                             meta: GraftMeta, segs: Seq[String],
                             matches: Column,
                             assignedMap: Map[String, String]): (Int, Int, Long) = {
    import org.apache.spark.sql.functions.{element_at, split}
    val hits = readLive(spark, dir, meta, segs, keepMeta = true).where(matches)
    val dvName = s"${GraftDv.Prefix}${UUID.randomUUID().toString.take(12)}"
    hits.select(
        element_at(split(col("__g_fp"), "/"), -2).as("seg"),
        element_at(split(col("__g_fp"), "/"), -1).as("file"),
        col("__g_pos").as("pos"))
      .write.parquet(dir.resolve(dvName).toString)
    val perSeg = spark.read.parquet(dir.resolve(dvName).toString)
      .groupBy("seg").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    if (perSeg.isEmpty) {
      GraftMeta.deleteRecursively(dir.resolve(dvName))
      return (segs.size, 0, 0L)
    }
    // every selected row matches, so the projection applies assignments
    // unconditionally — each RHS still sees the PRE-update column values
    val updated = hits.select(meta.schema.fields.map { f =>
      assignedMap.get(f.name) match {
        case Some(rhs) => expr(rhs).cast(f.dataType).as(f.name)
        case None      => col(f.name)
      }
    }.toSeq: _*)
    val newSegments = writeSegments(dir, meta, updated)
    cleanupOnFailedCommit(dir, dvName +: newSegments.map(_._1)) {
      GraftMeta.commitAddDeletesAndAppend(dir, dvName, perSeg.keySet,
        baseDvs = GraftDv.forSegments(meta, meta.current, segs),
        newSegments = newSegments, dvSegCounts = perSeg)
    }
    (segs.size, perSeg.size, perSeg.values.sum)
  }

  /** MERGE-ON-READ UPSERT core (see UpsertProcedure). Returns
    * (rows_updated, rows_inserted, segments_appended).
    *
    * `batchId` (optional) makes the upsert EXACTLY-ONCE via the durable
    * registry: a replayed batch id is a complete no-op — no scan, no
    * staging, no commit — the streaming CDC-apply contract (foreachBatch
    * names each micro-batch after its epoch id, and restarts re-deliver
    * epochs without double-applying them).
    *
    * The commit is SERIALIZABLE, not merely position-valid: upsert's
    * contract ('every source row becomes the CURRENT version of its key')
    * is not append-commutative — an append or another upsert landing the
    * same key between this upsert's probe and its commit would leave two
    * live versions of one key. The commit therefore pins the probed
    * snapshot (expectedCurrent) and a lost CAS discards the staging and
    * RE-PROBES from the new snapshot, up to a bounded number of attempts. */
  def upsertMor(dir: java.nio.file.Path, sourceName: String,
                keys: String, batchId: Option[String] = None): (Long, Long, Int) = {
    val maxAttempts = 5
    var attempt = 1
    while (attempt < maxAttempts) {
      try return upsertMorAttempt(dir, sourceName, keys, batchId)
      catch { case _: GraftConcurrentCommitException => attempt += 1 }
    }
    upsertMorAttempt(dir, sourceName, keys, batchId) // final attempt propagates
  }

  private def upsertMorAttempt(dir: java.nio.file.Path, sourceName: String,
                               keys: String, batchId: Option[String]): (Long, Long, Int) = {
    import org.apache.spark.sql.functions.{broadcast, element_at, split}
    val spark = SparkSession.active
    val meta = GraftMeta.read(dir)
    val namedKey = batchId.map { b =>
      require(b.matches("[A-Za-z0-9_.\\-]+"),
        s"graft upsert: batch_id must be [A-Za-z0-9_.-]+, got '$b'")
      s"ups-$b"
    }
    if (namedKey.exists(meta.committedNamed.contains)) return (0L, 0L, 0)
    val segs = meta.snapshots(meta.current)
    val keyCols = keys.split(',').map(_.trim).filter(_.nonEmpty).toSeq
    require(keyCols.nonEmpty, "graft upsert: keys must name at least one column")
    val resolvedKeys = keyCols.map { k =>
      meta.schema.fieldNames.find(_.equalsIgnoreCase(k)).getOrElse(
        throw new IllegalArgumentException(s"graft upsert: no key column '$k'"))
    }
    val raw = spark.table(sourceName)
    // project the source to the TARGET schema by name (case-insensitive),
    // casting each column — a CDC feed's source often arrives with wider
    // types (int where the table says bigint)
    val src0 = raw.select(meta.schema.fields.map { f =>
      val c = raw.columns.find(_.equalsIgnoreCase(f.name)).getOrElse(
        throw new IllegalArgumentException(
          s"graft upsert: source '$sourceName' lacks column '${f.name}'"))
      col(c).cast(f.dataType).as(f.name)
    }.toSeq: _*)
    // MERGE cardinality rule: one source row per key, or the batch is
    // ambiguous (which version of the key should survive?)
    val dupes = src0.groupBy(resolvedKeys.map(col): _*).count()
      .where(col("count") > 1).limit(1).collect()
    require(dupes.isEmpty,
      s"graft upsert: source '$sourceName' has duplicate keys " +
        s"(${resolvedKeys.mkString(",")}) — e.g. ${dupes.headOption.getOrElse("")}")
    if (segs.isEmpty && src0.isEmpty) return (0L, 0L, 0)
    // IDENTITY minting on the MOR path (r19): NULL identity values in the
    // source allocate off the committed high-water before the probe/write,
    // and the returned propCas riders advance the high-water in the SAME
    // serializable commit that publishes vector+append — a concurrent
    // allocator loses the CAS and this attempt re-probes with fresh ids
    // (the upsertMor retry loop), never double-issuing
    val idSpecs = GraftIdentity.of(meta.props, meta.schema)
    val (src, idRiders, idCleanup) =
      GraftIdentity.fillDataFrame(src0, idSpecs, dir.getFileName.toString)
    try {
    // ONE probe of the live target against the broadcast source finds the
    // positions the upsert supersedes; the table is never shuffled
    val live = GraftDv.readLive(spark, dir, meta.readSchema, segs,
      GraftDv.forSegments(meta, meta.current, segs), keepMeta = true)
    val joinCond = resolvedKeys.map(k => live(k) === src(k)).reduce(_ && _)
    val dvName = s"${GraftDv.Prefix}${UUID.randomUUID().toString.take(12)}"
    // the dv rows carry the matched KEY columns (__k0..__kN) alongside the
    // positions: the readers (loadPositions/readLive) project seg/file/pos
    // only, while the count pass below gets exact DISTINCT-KEY arithmetic
    // from the same tiny file — without them, a target holding duplicate
    // keys (appends bypass upsert's uniqueness) would make rows_inserted =
    // srcCount - positionCount go negative
    live.join(broadcast(src), joinCond, "left_semi")
      .select(Seq(
        element_at(split(col("__g_fp"), "/"), -2).as("seg"),
        element_at(split(col("__g_fp"), "/"), -1).as("file"),
        col("__g_pos").as("pos")) ++
        resolvedKeys.zipWithIndex.map { case (k, i) => col(k).as(s"__k$i") }: _*)
      .write.parquet(dir.resolve(dvName).toString)
    val dvStaged = spark.read.parquet(dir.resolve(dvName).toString)
    val perSeg = dvStaged
      .groupBy("seg").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val updatedCount = perSeg.values.sum // positions vectored (>= keys matched)
    val matchedKeys =
      if (updatedCount == 0) 0L
      else dvStaged.select(resolvedKeys.indices.map(i => col(s"__k$i")): _*)
        .distinct().count()
    // the whole source appends as the keys' current versions
    val newSegments = writeSegments(dir, meta, src)
    val srcCount = newSegments.flatMap(_._2)
      .flatMap(z => scala.util.Try(SegmentStats.decode(z).rows).toOption) match {
      case rs if rs.size == newSegments.size => rs.sum
      case _ => src.count()
    }
    if (updatedCount == 0 && srcCount == 0) {
      GraftMeta.deleteRecursively(dir.resolve(dvName))
      newSegments.foreach { case (s, _) => GraftMeta.deleteRecursively(dir.resolve(s)) }
      return (0L, 0L, 0)
    }
    // expectedCurrent pins the PROBED snapshot: any commit that landed since
    // (append, another upsert) may carry this upsert's keys, so the CAS must
    // lose and the caller re-probe — see upsertMor's retry loop
    val applied = cleanupOnFailedCommit(dir, dvName +: newSegments.map(_._1)) {
      if (updatedCount == 0)
        // pure insert: no vector to publish
        GraftMeta.commitMany(dir, newSegments, replaceAll = false,
          removeSuffixes = Set.empty, expectedCurrent = Some(meta.current),
          namedKey = namedKey, propCas = idRiders)
      else
        GraftMeta.commitAddDeletesAndAppend(dir, dvName, perSeg.keySet,
          baseDvs = GraftDv.forSegments(meta, meta.current, segs),
          newSegments = newSegments, namedKey = namedKey,
          expectedCurrent = Some(meta.current), propCas = idRiders,
          dvSegCounts = perSeg)
    }
    if (updatedCount == 0) GraftMeta.deleteRecursively(dir.resolve(dvName))
    if (!applied) {
      // lost the replay race: another attempt of this batch id committed
      // between our registry pre-check and the CAS — discard the staging
      GraftMeta.deleteRecursively(dir.resolve(dvName))
      newSegments.foreach { case (s, _) => GraftMeta.deleteRecursively(dir.resolve(s)) }
      return (0L, 0L, 0)
    }
    // report in KEY arithmetic: rows_updated = distinct matched keys (a
    // duplicate-keyed target vectors >1 position per key), rows_inserted =
    // source keys with no live match — never negative
    (matchedKeys, srcCount - matchedKeys, newSegments.size)
    } finally idCleanup()
  }

  /** MERGE-ON-READ delete: record the matching rows' POSITIONS (parquet file
    * name + row index) in a fresh `dv-*` directory and commit the
    * association — no segment is read back in full or rewritten. The scan
    * that finds the positions is DV-merged against EXISTING vectors, so
    * positions across a snapshot's vectors stay disjoint and repeated
    * overlapping deletes count each row once. Cost: one filtered scan (the
    * same discovery scan copy-on-write runs) + O(rows deleted) written. */
  private def deleteWhereMor(spark: SparkSession, dir: java.nio.file.Path,
                             meta: GraftMeta, segs: Seq[String],
                             matches: Column): (Int, Int, Long) = {
    import org.apache.spark.sql.functions.element_at
    import org.apache.spark.sql.functions.split
    val hits = readLive(spark, dir, meta, segs, keepMeta = true)
      .where(matches)
      .select(
        element_at(split(col("__g_fp"), "/"), -2).as("seg"),
        element_at(split(col("__g_fp"), "/"), -1).as("file"),
        col("__g_pos").as("pos"))
    val dvName = s"${GraftDv.Prefix}${UUID.randomUUID().toString.take(12)}"
    hits.write.parquet(dir.resolve(dvName).toString)
    // counts from the just-written vector (tiny) — one big scan total
    val perSeg = spark.read.parquet(dir.resolve(dvName).toString)
      .groupBy("seg").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    if (perSeg.isEmpty) {
      GraftMeta.deleteRecursively(dir.resolve(dvName))
      return (segs.size, 0, 0L)
    }
    cleanupOnFailedCommit(dir, Seq(dvName)) {
      GraftMeta.commitAddDeletesAndAppend(dir, dvName, perSeg.keySet,
        baseDvs = GraftDv.forSegments(meta, meta.current, segs), Nil,
        dvSegCounts = perSeg)
    }
    (segs.size, perSeg.size, perSeg.values.sum)
  }
}

/** `CALL <cat>.system.rollback_to_snapshot(table, snapshot)` — restore the
  * table to an earlier snapshot's content by committing that snapshot's
  * segment list as a NEW snapshot (Iceberg's rollback semantics): the bad
  * commits stay in history for audit, time travel to them keeps working, and
  * the rollback itself is one more zero-IO metadata commit — no segment is
  * copied or rewritten. Note the exactly-once registry is deliberately NOT
  * rolled back: a streaming epoch committed before the rollback point stays
  * recorded, so a replay after rollback is still discarded (rolling back
  * INTENTIONALLY removes those rows; re-ingesting them needs a fresh writer
  * appId — the same contract as Delta's txnVersion watermark). */
private[catalog] final class RollbackProcedure(catalog: GraftCatalog)
  extends GraftProcedure(catalog) {

  override def name(): String = "rollback_to_snapshot"
  override def description(): String =
    "make an earlier snapshot current again via a new metadata-only commit"

  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("table", StringType).build(),
    ProcedureParameter.in("snapshot", LongType).build())

  override val outputSchema: StructType = StructType(Seq(
    StructField("previous_snapshot", LongType, nullable = false),
    StructField("rolled_back_to", LongType, nullable = false),
    StructField("new_snapshot", LongType, nullable = false)))

  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val dir = resolveTableDir(input.getUTF8String(0).toString)
    val target = input.getLong(1)
    var prev = -1L
    var next = -1L
    GraftMeta.mutate(dir) { meta =>
      require(meta.snapshots.contains(target),
        s"graft rollback_to_snapshot: no snapshot $target " +
          s"(have ${meta.snapshots.keys.toSeq.sorted.mkString(",")})")
      prev = meta.current
      next = meta.current + 1
      meta.copy(current = next,
        snapshots = meta.snapshots + (next -> meta.snapshots(target)),
        snapshotTimes = meta.snapshotTimes + (next -> System.currentTimeMillis()),
        // restore the target's DELETE VECTORS with its segments — rolling
        // back past a merge-on-read DELETE must resurrect those rows, and
        // rolling back TO one must keep them deleted
        dvs = meta.dvs + (next -> meta.dvs.getOrElse(target, Map.empty)))
    }
    result(prev, target, next)
  }
}

/** `CALL <cat>.system.expire_snapshots(table, keep_last, dry_run,
  * orphan_retention_ms)` — drop all but the newest `keep_last` snapshots from
  * metadata, delete every segment directory no retained snapshot references,
  * then sweep ORPHANS: `seg-*` directories on disk that no snapshot (kept or
  * expired) references at all — the residue of rewrites whose optimistic
  * commit lost to a concurrent writer (the new segment was fully written but
  * never entered any snapshot, so plain expiry could never find it). Orphans
  * younger than `orphan_retention_ms` are kept — an in-flight write's segment
  * dir looks exactly like an orphan until its commit lands (the same
  * retention contract as Iceberg's remove_orphan_files).
  *
  * `dry_run => true` mutates NOTHING and reports what a live run would
  * remove, with `bytes_reclaimable` summing the dead-segment and orphan
  * payloads — the "how much disk does maintenance buy" answer without taking
  * the destructive step. After a live run, `VERSION AS OF` an expired id
  * fails by design, and superseded `_graft_commits` files are GC'd (each is
  * full-state, so only the newest is ever needed). */
private[catalog] final class ExpireSnapshotsProcedure(catalog: GraftCatalog)
  extends GraftProcedure(catalog) {

  override def name(): String = "expire_snapshots"
  override def description(): String =
    "drop expirable snapshots (beyond keep_last AND older than older_than_ms), delete unreferenced segments and aged orphans"

  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("table", StringType).build(),
    ProcedureParameter.in("keep_last", IntegerType).defaultValue("1").build(),
    ProcedureParameter.in("dry_run", BooleanType).defaultValue("false").build(),
    // 24h default (Iceberg's remove_orphan_files uses 3 days for the same
    // reason): an in-flight write longer than retention would see its
    // still-uncommitted segment swept. Commit additionally touches the seg
    // dir just before the meta CAS, so the mtime reflects commit time, not
    // job start — belt and braces against long-running writers.
    ProcedureParameter.in("orphan_retention_ms", LongType)
      .defaultValue(String.valueOf(24L * 60 * 60 * 1000)).build(),
    // AGE-based retention (Iceberg's primary expire form): a snapshot is
    // expirable only if it is BOTH beyond the newest keep_last AND older
    // than this horizon — age makes expiry strictly more conservative.
    // -1 (default) disables the age test: the original keep_last-only
    // behavior. Appended LAST so existing positional callers are unchanged.
    ProcedureParameter.in("older_than_ms", LongType).defaultValue("-1").build())

  override val outputSchema: StructType = StructType(Seq(
    StructField("snapshots_removed", IntegerType, nullable = false),
    StructField("snapshots_kept", IntegerType, nullable = false),
    StructField("segments_deleted", IntegerType, nullable = false),
    StructField("orphans_deleted", IntegerType, nullable = false),
    StructField("bytes_reclaimed", LongType, nullable = false)))

  private def dirBytes(p: Path): Long =
    if (!Files.exists(p)) 0L
    else if (Files.isDirectory(p)) GraftMeta.listDir(p).map(dirBytes).sum
    else Files.size(p)

  /** seg-* and dv-* dirs referenced by NO snapshot in `meta`, older than the
    * retention horizon (mtime — a fresh dir may be an in-flight uncommitted
    * write or an about-to-commit delete vector). */
  private def orphanDirs(dir: Path, meta: GraftMeta, retentionMs: Long): Seq[Path] = {
    val referenced = meta.snapshots.valuesIterator.flatten.toSet ++
      meta.dvs.valuesIterator.flatMap(_.valuesIterator.flatten) ++
      GraftRefs.all(meta).valuesIterator.flatMap(_.dirs) // unpublished branch state
    val horizon = System.currentTimeMillis() - retentionMs
    GraftMeta.listDir(dir).filter { p =>
      val n = p.getFileName.toString
      Files.isDirectory(p) &&
        (n.startsWith("seg-") || n.startsWith(GraftDv.Prefix)) &&
        !referenced(n) &&
        Files.getLastModifiedTime(p).toMillis <= horizon
    }
  }

  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val dir = resolveTableDir(input.getUTF8String(0).toString)
    val keepLast = input.getInt(1)
    val dryRun = input.getBoolean(2)
    val retentionMs = input.getLong(3)
    val olderThanMs = input.getLong(4)
    require(keepLast >= 1, "graft expire_snapshots: keep_last must be >= 1")
    require(retentionMs >= 0, "graft expire_snapshots: orphan_retention_ms must be >= 0")
    val now = System.currentTimeMillis()

    def plan(meta: GraftMeta): (Seq[Long], Set[Long], Seq[String]) = {
      val ids = meta.snapshots.keys.toSeq.sorted
      val refs = GraftRefs.all(meta)
      // age protection: with older_than_ms >= 0, snapshots committed inside
      // the horizon are NOT expirable even when beyond keep_last (a missing
      // commit time — pre-upgrade metadata — conservatively counts as young)
      val ageProtected =
        if (olderThanMs < 0) Set.empty[Long]
        else ids.filter(id =>
          meta.snapshotTimes.getOrElse(id, Long.MaxValue) > now - olderThanMs).toSet
      // a ref's BASE snapshot stays retained (its delete vectors define the
      // branch's live rows) and every ref-listed segment stays referenced —
      // maintenance can never eat an unpublished branch; TAGGED snapshots are
      // retained outright (a tag is a release pointer — only drop_tag frees it)
      val keptIds = ids.takeRight(keepLast).toSet + meta.current ++ ageProtected ++
        refs.valuesIterator.map(_.base).filter(meta.snapshots.contains) ++
        GraftRefs.allTags(meta).valuesIterator.filter(meta.snapshots.contains)
      val removedIds = ids.filterNot(keptIds)
      val referenced = keptIds.flatMap(id => meta.snapshots(id)) ++
        refs.valuesIterator.flatMap(_.dirs)
      val dead = removedIds.flatMap(meta.snapshots).distinct.filterNot(referenced)
      // delete-vector dirs referenced only by expired snapshots die with them
      val keptDvs = keptIds.flatMap(id =>
        meta.dvs.getOrElse(id, Map.empty).valuesIterator.flatten)
      val deadDvs = removedIds
        .flatMap(id => meta.dvs.getOrElse(id, Map.empty).valuesIterator.flatten)
        .distinct.filterNot(keptDvs)
      (removedIds, keptIds, dead ++ deadDvs)
    }

    if (dryRun) {
      val meta = GraftMeta.read(dir)
      val (removedIds, keptIds, dead) = plan(meta)
      // orphans judged against the post-expiry reference set = pre-expiry one:
      // expiry only drops WHOLE snapshots, and dead segments are counted
      // separately, so "referenced by nothing at all" is the same either way
      val orphans = orphanDirs(dir, meta, retentionMs)
      val bytes = dead.map(s => dirBytes(dir.resolve(s))).sum + orphans.map(dirBytes).sum
      return result(removedIds.size, keptIds.size, dead.size, orphans.size, bytes)
    }

    // live: CAS the snapshot drop, then delete — metadata first, so a crash
    // mid-delete leaves only unreferenced dirs (the orphan sweep's job)
    var planned: (Seq[Long], Set[Long], Seq[String]) = null
    GraftMeta.mutate(dir) { meta =>
      planned = plan(meta)
      val (_, keptIds, dead) = planned
      meta.copy(snapshots = meta.snapshots.view.filterKeys(keptIds).toMap,
        zstats = meta.zstats -- dead,
        snapshotTimes = meta.snapshotTimes.view.filterKeys(keptIds).toMap,
        dvs = meta.dvs.view.filterKeys(keptIds).toMap)
    }
    val (removedIds, keptIds, dead) = planned
    val deadBytes = dead.map(s => dirBytes(dir.resolve(s))).sum
    // recursive: a dead segment may hold subdirectories (e.g. a _temporary
    // dir from a crashed task attempt); a flat delete would throw after the
    // metadata was already rewritten
    dead.foreach(seg => GraftMeta.deleteRecursively(dir.resolve(seg)))
    // materialized change-feed deltas (_cdc/v=<id>) for expired snapshots can
    // never be requested again — a CDC range requires every snapshot in it
    // retained — so they expire with their snapshot
    val cdcDir = dir.resolve("_cdc")
    if (Files.isDirectory(cdcDir))
      removedIds.foreach(id => GraftMeta.deleteRecursively(cdcDir.resolve(s"v=$id")))
    // orphan sweep against the committed post-expiry state
    val after = GraftMeta.readVersioned(dir)
    val orphans = orphanDirs(dir, after._1, retentionMs)
    val orphanBytes = orphans.map(dirBytes).sum
    orphans.foreach(GraftMeta.deleteRecursively)
    // commit-file GC: every version below the latest is superseded full state.
    // Also sweep aged `.tmp.*` residue — a crash between writing the casWrite
    // temp file and createLink leaks it forever otherwise (readVersioned
    // ignores tmp files, and the numeric GC above never matches them); the
    // orphan retention horizon bounds the race against a live casWrite.
    val cd = dir.resolve(GraftMeta.CommitsDir)
    val tmpHorizon = System.currentTimeMillis() - retentionMs
    if (Files.isDirectory(cd)) GraftMeta.listDir(cd).foreach { p =>
      val name = p.getFileName.toString
      val superseded = scala.util.Try(name.toLong).toOption.exists(_ < after._2)
      val agedTmp = name.startsWith(".tmp.") &&
        scala.util.Try(Files.getLastModifiedTime(p).toMillis <= tmpHorizon)
          .getOrElse(false)
      if (superseded || agedTmp) Files.deleteIfExists(p)
    }
    result(removedIds.size, keptIds.size, dead.size, orphans.size, deadBytes + orphanBytes)
  }
}
