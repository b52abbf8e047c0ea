package graft.catalog

import java.nio.file.{Files, Path}
import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.mapreduce.{Job, TaskAttemptID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{InternalRow, ProjectingInternalRow}
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expression, Expressions, SortDirection, SortOrder}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.execution.datasources.OutputWriter
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.{DataType, StructType}

/** The write path for identity-partitioned graft tables: every job lands one
  * PARTITION-PURE segment per partition value it touches (see GraftPartitions
  * for why purity is the whole design), committed as ONE snapshot.
  *
  * Spark's v2 file write (ParquetWrite) writes a single directory per job —
  * it cannot split output by a column — so this Write owns the task-side
  * fan-out itself, on the same public building blocks FileFormatWriter uses:
  *
  *   - the TABLE declares `clustered(partitionCols)` distribution, so Spark
  *     shuffles each partition value to one task (≈1 file per partition per
  *     write — the layout a 1000-executor job needs; without it every task
  *     would write every partition);
  *   - each task opens one ParquetFileFormat OutputWriter per partition value
  *     it actually sees, writing into a private STAGING directory
  *     (`seg-staging@<uuid>` — never referenced by any snapshot, so crashes
  *     leak only invisible files the orphan sweep reclaims);
  *   - each task's commit message is a MANIFEST of the files it wrote; job
  *     commit moves exactly the manifest files into final per-partition
  *     segment dirs and publishes them in one meta CAS. Files from failed or
  *     speculative task attempts are never in a manifest, so they vanish
  *     with the staging dir — the classic manifest commit protocol
  *     (Iceberg's), which needs no rename-based Hadoop committer.
  *
  * Commit modes: plain append; `replaceAll` (INSERT OVERWRITE / group-based
  * row-level rewrite — the new segments ARE the table); `dynamicOverwrite`
  * (replace-partitions: current segments whose partition suffix appears in
  * the written data swap out, guarded by expectedCurrent so a concurrent
  * append is never silently clobbered).
  *
  * Exactly-once streaming composes unchanged: `graft.segment`-named jobs
  * register ONE registry key for the whole job; a replayed epoch is detected
  * at build time (no IO) or, if it raced, at the commit CAS (the freshly
  * moved segments are deleted). */
private[catalog] final class GraftPartitionedWrite(
    tableDir: Path, info: LogicalWriteInfo, routed: Seq[GraftPartitions.PartField],
    replaceAll: Boolean, dynamicOverwrite: Boolean,
    fromRowLevelOp: Boolean, expectedCurrent: Option[Long],
    groupRemovals: () => Option[Seq[String]] = () => None)
  extends Write with RequiresDistributionAndOrdering {

  /** Source columns of the routed dimensions (identity cols, or the bucket
    * transform's hash input). */
  private val partCols: Seq[String] = routed.map(_.source)

  private val metaAtBuild = GraftMeta.read(tableDir)
  private val props = metaAtBuild.props

  // IDENTITY columns (r17): the round-robin allocator is partition-agnostic
  // (`next + (rowIdx*numPartitions + partitionId)*step` doesn't care where a
  // row routes), so allocation simply wraps OUTSIDE the partition router —
  // rows reach the fan-out with their ids already filled — and the
  // high-water CAS rides the same commitMany that publishes the segments.
  private val identitySpecs = GraftIdentity.of(props, info.schema())

  private val named = Option(info.options.get("graft.segment"))
  named.foreach(n => require(n.matches("[A-Za-z0-9_.\\-]+"),
    s"graft.segment must be [A-Za-z0-9_.-]+, got '$n'"))
  private val namedKey = named.map("seg-" + _)

  // WAP: stage this append's partition-pure segments onto a branch — same
  // contract as the unpartitioned path (plain appends only; existence checked
  // here to fail before the job runs, re-checked under the commit lock)
  private val branch = Option(info.options.get("graft.branch"))
  branch.foreach { b =>
    require(!replaceAll && !dynamicOverwrite && !fromRowLevelOp && named.isEmpty,
      "graft: branch writes are plain unnamed appends (no overwrite/DML on a branch)")
    require(GraftRefs.get(metaAtBuild, b).isDefined,
      s"graft: no branch '$b' — CALL create_branch first")
    // identity WAP appends allocate at stage time (r18): the branch commit's
    // propCas rider advances the main high-water, so staged and main
    // allocations stay disjoint; a dropped branch leaves a gap, never a
    // collision (identity promises uniqueness, not density)
  }
  // a crashed earlier attempt of a NAMED job can leave final segment dirs
  // (moved before the meta CAS ran); a retry must not merge new files into
  // them — doubled rows — so they are swept here, before any new IO. The
  // sweep holds the per-table lock and RE-READS meta inside it (not
  // metaAtBuild, which can predate a racing attempt's CAS), and the named
  // commit path below holds the same lock across its move+CAS — so an
  // in-process racing first attempt can never have its freshly-moved dirs
  // swept after its CAS is destined to win. A zombie writer in ANOTHER
  // process remains exposed here (the lock is per-JVM): its failure mode is
  // a published snapshot referencing swept dirs — worse than the
  // unpartitioned path's torn-segment-never-doubled-rows — mitigated by the
  // registry contract that a named retry only launches once its predecessor
  // is known dead.
  private val alreadyCommitted = namedKey.exists { k =>
    metaAtBuild.committedNamed.contains(k) ||
      tableDir.toString.intern().synchronized {
        if (GraftMeta.read(tableDir).committedNamed.contains(k)) true
        else {
          val prefix = s"$k${GraftPartitions.Marker}"
          GraftMeta.listDir(tableDir)
            .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith(prefix))
            .foreach(GraftMeta.deleteRecursively)
          false
        }
      }
  }

  private val writeId = named.getOrElse(UUID.randomUUID().toString.take(12))
  private val staging = tableDir.resolve(s"seg-staging@${UUID.randomUUID().toString.take(12)}")

  // partition columns resolved against the DATA schema (row-level-op rows
  // carry a leading __row_operation column the writer strips before lookup)
  private val dataSchema: StructType = info.schema()
  private val partFields: Seq[(Int, DataType, Option[Int])] = routed.map { pf =>
    val i = dataSchema.fieldNames.indexWhere(_.equalsIgnoreCase(pf.source))
    require(i >= 0, s"graft: partition column '${pf.source}' missing from write schema $dataSchema")
    (i, dataSchema.fields(i).dataType, pf.bucketN)
  }

  // STEADY-STATE PER-PARTITION Z-ORDER (r18, closes the one-shot seam): a
  // partitioned rewrite_clustered persists the same routing spec the
  // unpartitioned path does, and every later batch write composes it with
  // the partition router — rows land `<part>~zc<i>` (partition-pure AND
  // cell-pure), so the grid survives ongoing ingest, INSERT OVERWRITE, and
  // SQL row-level COW exactly like the unpartitioned steady state, and
  // `compact` folds per (partition, cell). Spec columns resolved against the
  // DATA schema (row-level rows carry the leading __row_operation column the
  // writer strips before extraction). rewrite_clustered refuses bucketed
  // tables, so a spec never coexists with bucket routing.
  private val zspec: Option[GraftZOrder.Spec] = GraftZOrder.of(props)
  private val zFields: Seq[(Int, DataType)] = zspec.toSeq.flatMap(_.cols.map { c =>
    val i = dataSchema.fieldNames.indexWhere(_.equalsIgnoreCase(c))
    require(i >= 0, s"graft z-order: routed column '$c' missing from write schema $dataSchema")
    (i, dataSchema.fields(i).dataType)
  })

  /** Partition-first clustering: rows shuffle on (partition cols ++ the
    * z-cell router when a grid is persisted ++ any write.cluster-by cols),
    * so each task sees few (partition, cell) pairs and each pair's rows are
    * not scattered across the job — one writer stream per (partition, cell)
    * at any executor count. */
  override def requiredDistribution(): Distribution = {
    val cluster = props.get(GraftTable.ClusterByProp).toSeq.flatMap(_.split(',')).map(_.trim)
    Distributions.clustered(
      (partCols.map(Expressions.column) ++
        zspec.map(GraftZOrder.distributionExpr).toSeq ++
        cluster.filterNot(partCols.contains).map(Expressions.column)).toArray[Expression])
  }

  override def requiredOrdering(): Array[SortOrder] =
    props.get(GraftTable.OrderByProp).toSeq.flatMap(_.split(',')).map { c =>
      Expressions.sort(Expressions.column(c.trim), SortDirection.ASCENDING)
    }.toArray

  override def description(): String =
    s"graft-partitioned-write($writeId, partitions=${partCols.mkString(",")}, " +
      s"replaceAll=$replaceAll, dynamic=$dynamicOverwrite)"

  /** `writeStream.toTable` on a partitioned table — partition-pure per-epoch
    * segments via the native exactly-once streaming sink. Append mode only. */
  override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
    require(!replaceAll && !dynamicOverwrite && branch.isEmpty &&
        !fromRowLevelOp && named.isEmpty,
      "graft: streaming writes are plain unnamed appends")
    new GraftStreamingWrite(tableDir, info, routed, metaAtBuild)
  }

  override def toBatch: BatchWrite =
    if (alreadyCommitted) new NoopBatchWrite(namedKey.get)
    else new BatchWrite {
      override def createBatchWriterFactory(pInfo: PhysicalWriteInfo): DataWriterFactory = {
        val spark = SparkSession.active
        val job = Job.getInstance(spark.sessionState.newHadoopConf())
        val owf = new ParquetFileFormat()
          .prepareWrite(spark, job, Map.empty[String, String], dataSchema)
        // CHECK constraints wrap OUTSIDE the partition router (it strips the
        // row-level op column internally), so bound ordinals shift by the op
        // prefix when present
        val checked = GraftChecks.wrap(
          new GraftPartitionedWriterFactory(owf,
            new SerializableHadoopConf(job.getConfiguration),
            staging.toString, dataSchema, partFields, fromRowLevelOp,
            GraftPartitions.specId(props), zspec, zFields),
          dataSchema, props, writeId,
          ordinalOffset = if (fromRowLevelOp) 1 else 0)
        // generated columns fill BEFORE checks and before the partition
        // router, so derived partition values route correctly; the
        // row-level-op path carries a leading op column the projection
        // cannot rebuild generically — group-rewrite rows are already
        // filled, the documented seam is partitioned MERGE INSERT clauses
        if (fromRowLevelOp)
          // existing rows carry their ids; NULLs are MERGE-INSERT-minted rows
          // — allocated here (r18), the high-water advancing in the rewrite
          // commit's propCas rider. Rows here still carry the leading
          // __row_operation column (the router strips it), so the allocator
          // shifts its ordinals by one, like the checks'.
          GraftIdentity.rowLevelWrap(checked, identitySpecs, dataSchema,
            pInfo.numPartitions(), writeId, ordinalOffset = 1)
        else
          // identity fills OUTERMOST (before generation/checks/routing) so
          // derived columns, constraints, and the partition router all see
          // the final id — an identity PARTITION column routes correctly
          GraftIdentity.wrap(GraftGenerate.wrap(checked, dataSchema, props, writeId),
            identitySpecs, dataSchema, pInfo.numPartitions(), writeId)
      }

      override def commit(messages: Array[WriterCommitMessage]): Unit = {
        // NAMED jobs hold the per-table lock across move+CAS so a concurrent
        // retry's crashed-attempt sweep (see alreadyCommitted above) can
        // never delete dirs this attempt just moved but has not yet
        // published; mutate() re-entering the same monitor is fine
        if (namedKey.isDefined)
          tableDir.toString.intern().synchronized(doCommit(messages))
        else doCommit(messages)
      }

      private def doCommit(messages: Array[WriterCommitMessage]): Unit = {
        val (innerMessages, identityExtremes) =
          GraftIdentity.unwrap(messages, identitySpecs)
        val manifest = innerMessages.flatMap {
          case m: GraftPartitionFilesMessage => m.files
          case _ => Nil
        }
        val byPart: Map[String, Seq[String]] =
          manifest.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
        // land files serially (cheap local renames), then harvest every
        // partition segment's stats CONCURRENTLY (r21 — the per-partition
        // footer pass was the commit's serial driver tail)
        val landed = byPart.toSeq.sortBy(_._1).map { case (enc, fileNames) =>
          val seg = s"seg-$writeId${GraftPartitions.Marker}$enc"
          val segDir = tableDir.resolve(seg)
          Files.createDirectories(segDir)
          fileNames.foreach(f =>
            Files.move(staging.resolve(enc).resolve(f), segDir.resolve(f)))
          (seg, segDir)
        }
        val allStats = SegmentStats.harvestAll(
          SparkSession.active, landed.map(_._2.toString), metaAtBuild.readSchema,
          SegmentStats.sumCols(metaAtBuild.props, metaAtBuild.schema),
          GraftBloom.cols(metaAtBuild.props, metaAtBuild.schema),
          SegmentStats.ndvCols(metaAtBuild.props, metaAtBuild.schema),
          klls = SegmentStats.kllCols(metaAtBuild.props, metaAtBuild.schema))
        val segments = landed.map(_._1).zip(allStats)
        try {
          val removedByGroupFilter =
            if (fromRowLevelOp) groupRemovals() else None
          if (branch.isDefined) {
            if (segments.nonEmpty) GraftRefs.commitToBranch(tableDir, branch.get, segments,
              propCas = GraftIdentity.propCas(identitySpecs, identityExtremes))
          } else if (segments.nonEmpty || replaceAll || namedKey.isDefined ||
              removedByGroupFilter.exists(_.nonEmpty)) {
            val guard = expectedCurrent.orElse(
              if (dynamicOverwrite) Some(metaAtBuild.current) else None)
            removedByGroupFilter match {
              case Some(removed) =>
                // runtime group filtering ran on the row-level scan: the
                // replacement rows cover exactly the scanned segments — swap
                // those (a DELETE emptying a partition removes its segment
                // with nothing added), untouched partitions carry by reference
                GraftMeta.commitReplaceSegments(tableDir, segments,
                  removed.toSet, guard,
                  propCas = GraftIdentity.propCas(identitySpecs, identityExtremes))
              case None =>
                val applied = GraftMeta.commitMany(tableDir, segments,
                  replaceAll = replaceAll,
                  // dynamic overwrite replaces partition VALUES: strip the
                  // z-cell tail so `<part>~zc<i>` written segments remove
                  // every current segment of `<part>` (commitMany matches
                  // existing suffixes through baseSuffix symmetrically)
                  removeSuffixes =
                    if (dynamicOverwrite)
                      byPart.keySet.map(GraftPartitions.baseSuffix)
                    else Set.empty[String],
                  expectedCurrent = guard, namedKey = namedKey,
                  // identity high-water: CAS-advances with the data, fails
                  // loudly on a concurrent allocator (the unpartitioned
                  // path's contract, unchanged)
                  propCas = GraftIdentity.propCas(identitySpecs, identityExtremes))
                // a replayed named job that raced past the build-time check
                // loses at the CAS: its rows are already in the table — drop
                // the copies
                if (!applied)
                  segments.foreach { case (s, _) =>
                    GraftMeta.deleteRecursively(tableDir.resolve(s)) }
            }
          }
        } catch {
          case e: Throwable =>
            segments.foreach { case (s, _) =>
              scala.util.Try(GraftMeta.deleteRecursively(tableDir.resolve(s))) }
            throw e
        } finally GraftMeta.deleteRecursively(staging)
      }

      override def abort(messages: Array[WriterCommitMessage]): Unit =
        GraftMeta.deleteRecursively(staging)
    }
}

/** One task's manifest: (partition suffix, file name) per file it wrote. */
private[catalog] final case class GraftPartitionFilesMessage(
    files: Seq[(String, String)]) extends WriterCommitMessage

private[catalog] final class GraftPartitionedWriterFactory(
    owf: org.apache.spark.sql.execution.datasources.OutputWriterFactory,
    conf: SerializableHadoopConf, staging: String, dataSchema: StructType,
    partFields: Seq[(Int, DataType, Option[Int])], fromRowLevelOp: Boolean,
    specId: Long, zspec: Option[GraftZOrder.Spec] = None,
    zFields: Seq[(Int, DataType)] = Nil)
  extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val ctx = new TaskAttemptContextImpl(conf.value,
        new TaskAttemptID("graft", 0, TaskType.MAP, partitionId, (taskId & 0x7fffffff).toInt))
      private val ext = owf.getFileExtension(ctx)
      private val extractors = partFields.map { case (i, dt, bucketN) =>
        GraftPartitions.routeExtractor(dt, i, bucketN)
      }
      // composed z-cell tail (steady-state per-partition grid, r18)
      private val zExtract = zspec.map { spec =>
        (spec, zFields.map { case (i, dt) => GraftZOrder.extractor(dt, i) }.toArray)
      }
      private val zVals = zExtract.map { case (_, ex) => new Array[java.lang.Long](ex.length) }
      private val opStrip =
        if (fromRowLevelOp)
          Some(new ProjectingInternalRow(dataSchema, (1 to dataSchema.length).toIndexedSeq))
        else None
      private val writers = scala.collection.mutable.HashMap.empty[String, OutputWriter]
      private val manifest = Seq.newBuilder[(String, String)]

      override def write(row: InternalRow): Unit = {
        val data = opStrip match {
          case Some(p) => p.project(row); p
          case None    => row
        }
        val part = GraftPartitions.suffix(extractors.map(_(data)), specId)
        val enc = zExtract match {
          case Some((spec, ex)) =>
            val vals = zVals.get
            var i = 0
            while (i < ex.length) { vals(i) = ex(i)(data); i += 1 }
            part + "~zc" + spec.cellOf(spec.zkeyOf(vals))
          case None => part
        }
        writers.getOrElseUpdate(enc, {
          val file = s"part-$partitionId-$taskId$ext"
          manifest += enc -> file
          owf.newInstance(s"$staging/$enc/$file", dataSchema, ctx)
        }).write(data)
      }

      override def commit(): WriterCommitMessage = {
        writers.values.foreach(_.close())
        writers.clear()
        GraftPartitionFilesMessage(manifest.result())
      }

      override def abort(): Unit =
        writers.values.foreach(w => scala.util.Try(w.close()))

      override def close(): Unit = ()
    }
}

/** Fan-out factory routing on a PRE-COMPUTED (suffix string, slot) pair
  * carried as the row's FIRST TWO columns ('' = unsuffixed) instead of
  * re-encoding partition VALUES under the current spec. Compaction's one-job
  * rewrite uses it to preserve each segment generation's own layout
  * byte-identically — per-spec suffixes survive exactly
  * (PartitionEvolutionSpec's "compact groups by FULL suffix" pin), which the
  * value-based factory above cannot do (it would migrate old-spec rows to
  * the current spec). The SLOT picks the output file within the suffix, so
  * size targeting (ceil(bytes/target) files per group) holds exactly even
  * when AQE coalesces the whole shuffle into one task. Same staging/manifest
  * protocol; both routing columns are stripped before the row hits parquet. */
private[catalog] final class GraftRouteWriterFactory(
    owf: org.apache.spark.sql.execution.datasources.OutputWriterFactory,
    conf: SerializableHadoopConf, staging: String, dataSchema: StructType)
  extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val ctx = new TaskAttemptContextImpl(conf.value,
        new TaskAttemptID("graft", 0, TaskType.MAP, partitionId, (taskId & 0x7fffffff).toInt))
      private val ext = owf.getFileExtension(ctx)
      private val strip =
        new ProjectingInternalRow(dataSchema, (2 to dataSchema.length + 1).toIndexedSeq)
      private val writers = scala.collection.mutable.HashMap.empty[(String, Int), OutputWriter]
      private val manifest = Seq.newBuilder[(String, String)]

      override def write(row: InternalRow): Unit = {
        val enc = row.getUTF8String(0).toString
        val slot = row.getInt(1)
        strip.project(row)
        writers.getOrElseUpdate((enc, slot), {
          val file = s"part-$partitionId-$taskId-s$slot$ext"
          manifest += enc -> file
          owf.newInstance(s"$staging/$enc/$file", dataSchema, ctx)
        }).write(strip)
      }

      override def commit(): WriterCommitMessage = {
        writers.values.foreach(_.close())
        writers.clear()
        GraftPartitionFilesMessage(manifest.result())
      }

      override def abort(): Unit =
        writers.values.foreach(w => scala.util.Try(w.close()))

      override def close(): Unit = ()
    }
}

/** Hadoop Configuration is not Serializable; ship it via its own writable
  * form (the standard Spark trick, re-stated locally because Spark's helper
  * is not public API). */
private[catalog] final class SerializableHadoopConf(
    @transient var value: Configuration) extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
