package graft.catalog

import java.nio.file.{Files, Path}

import org.apache.hadoop.mapreduce.{Job, TaskAttemptID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{EqualNullSafe, Literal, Predicate}
import org.apache.spark.sql.connector.write.{DataWriter, LogicalWriteInfo, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.execution.datasources.OutputWriter
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

/** NATIVE streaming sink for graft tables — `df.writeStream.toTable("graft
  * .ns.t")`, no foreachBatch glue required.
  *
  * Exactly-once falls out of the catalog's existing contracts: every epoch
  * lands as ONE named commit, `seg-str-<queryId>-e<epochId>` (plus a
  * partition suffix per value on partitioned tables), registered in the
  * durable exactly-once registry. A replayed epoch — restart from checkpoint,
  * failure re-delivery — finds its name registered and discards its staged
  * files instead of appending twice; the registry survives compaction and
  * snapshot expiry, so maintenance can never re-open the door (the same
  * guarantee the foreachBatch landing pattern pins in StreamingSpec, now
  * engine-owned).
  *
  * Mechanics mirror the partitioned batch writer: tasks write parquet through
  * the same `OutputWriterFactory` into `seg-staging@str-<queryId>/<epoch>/`
  * (a `seg-` prefixed dir, so a crashed query's staging ages into the orphan
  * sweep), the driver's epoch commit moves files into per-partition
  * final segment dirs, harvests zone-map stats from the just-written footers,
  * and publishes ONE snapshot via commitMany. CHECK constraints ride the
  * writer exactly as on the batch path. Append-mode only: streaming
  * truncate/overwrite has no graft semantics and is refused at build. */
private[catalog] final class GraftStreamingWrite(
    tableDir: Path, info: LogicalWriteInfo, routed: Seq[GraftPartitions.PartField],
    metaAtBuild: GraftMeta) extends StreamingWrite {

  private val dataSchema: StructType = info.schema()
  private val partFields: Seq[(Int, org.apache.spark.sql.types.DataType, Option[Int])] =
    routed.map { pf =>
      val i = dataSchema.fieldNames.indexWhere(_.equalsIgnoreCase(pf.source))
      require(i >= 0, s"graft: partition column '${pf.source}' missing from stream schema $dataSchema")
      (i, dataSchema.fields(i).dataType, pf.bucketN)
    }
  // z-order-routed tables (r17; partitioned grids since r18): streaming
  // epochs land per-cell segments through the persisted spec, exactly like
  // batch appends — the grid survives continuous ingest, and compact folds
  // each (partition,) cell's epoch generations. On a partitioned table the
  // cell tail composes with the partition suffix (`<part>~zc<i>`).
  private val zroute: Option[(GraftZOrder.Spec, Seq[(Int, org.apache.spark.sql.types.DataType)])] =
    GraftZOrder.of(metaAtBuild.props).map { spec =>
      spec -> spec.cols.map { c =>
        val i = dataSchema.fieldNames.indexWhere(_.equalsIgnoreCase(c))
        require(i >= 0,
          s"graft: z-order routing column '$c' missing from stream schema $dataSchema")
        (i, dataSchema.fields(i).dataType)
      }
    }
  // queryId is stable across restarts from the same checkpoint — exactly the
  // identity the exactly-once epoch names need
  private val queryKey = {
    val q = info.queryId()
    require(q != null && q.matches("[A-Za-z0-9_.\\-]+"),
      s"graft streaming write: unusable query id '$q'")
    s"str-$q"
  }
  private val staging = tableDir.resolve(s"seg-staging@$queryKey")

  // Identity allocation per EPOCH: the factory is created once per
  // micro-batch, so the specs (and their high-water) are re-read from the
  // COMMITTED meta here — epoch N allocates from the value epoch N-1's
  // commit advanced, and the epoch commit CAS-advances it again (riding the
  // same commitMany that registers the epoch name, so a replayed epoch is a
  // no-op for the high-water too). Volatile hand-off factory→commit: the
  // micro-batch loop is single-threaded per query, commit(e) always follows
  // its own factory creation.
  @volatile private var identitySpecs: Seq[GraftIdentity.Spec] = Nil

  override def createStreamingWriterFactory(
      pInfo: PhysicalWriteInfo): StreamingDataWriterFactory = {
    val spark = SparkSession.active
    val job = Job.getInstance(spark.sessionState.newHadoopConf())
    val owf = new ParquetFileFormat().prepareWrite(spark, job, Map.empty, dataSchema)
    identitySpecs = GraftIdentity.of(GraftMeta.read(tableDir).props, dataSchema)
    GraftIdentity.wrapStreaming(
      GraftGenerate.wrapStreaming(
        new GraftStreamingWriterFactory(owf,
          new SerializableHadoopConf(job.getConfiguration), staging.toString,
          dataSchema, partFields,
          GraftChecks.boundChecks(dataSchema, metaAtBuild.props),
          tableDir.getFileName.toString,
          GraftPartitions.specId(metaAtBuild.props), zroute),
        dataSchema, metaAtBuild.props, tableDir.getFileName.toString),
      identitySpecs, dataSchema, pInfo.numPartitions(), tableDir.getFileName.toString)
  }

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val epochStaging = staging.resolve(epochId.toString)
    val base = s"seg-$queryKey-e$epochId"
    val specs = identitySpecs
    try {
      // the registry pre-check is advisory (cheap skip for the common replay);
      // the commitMany CAS re-checks under the lock and is authoritative
      if (GraftMeta.read(tableDir).committedNamed.contains(base)) return
      val (innerMessages, identityMaxes) = GraftIdentity.unwrap(messages, specs)
      val manifest = innerMessages.flatMap {
        case m: GraftPartitionFilesMessage => m.files
        case _ => Nil
      }
      val byPart = manifest.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
      if (byPart.isEmpty) return // empty epoch: nothing to publish
      val segments = byPart.toSeq.sortBy(_._1).map { case (enc, fileNames) =>
        val seg = if (enc.isEmpty) base else s"$base${GraftPartitions.Marker}$enc"
        val segDir = tableDir.resolve(seg)
        Files.createDirectories(segDir)
        fileNames.foreach(f => Files.move(epochStaging.resolve(enc).resolve(f),
          segDir.resolve(f)))
        val stats = scala.util.Try(SegmentStats.encode(SegmentStats.harvest(
          SparkSession.active, segDir.toString, metaAtBuild.readSchema,
          SegmentStats.sumCols(metaAtBuild.props, metaAtBuild.schema),
          GraftBloom.cols(metaAtBuild.props, metaAtBuild.schema),
          SegmentStats.ndvCols(metaAtBuild.props, metaAtBuild.schema),
          klls = SegmentStats.kllCols(metaAtBuild.props, metaAtBuild.schema)))).toOption
        (seg, stats)
      }
      val applied = GraftMeta.commitMany(tableDir, segments, replaceAll = false,
        removeSuffixes = Set.empty, expectedCurrent = None, namedKey = Some(base),
        propCas = GraftIdentity.propCas(specs, identityMaxes))
      // lost to a racing replay of this very epoch: drop the duplicate copies
      if (!applied)
        segments.foreach { case (s, _) => GraftMeta.deleteRecursively(tableDir.resolve(s)) }
    } finally GraftMeta.deleteRecursively(epochStaging)
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    GraftMeta.deleteRecursively(staging.resolve(epochId.toString))

  override def toString: String =
    s"graft-streaming-write($queryKey, partitions=${routed.map(_.source).mkString(",")})"
}

/** Per-epoch parquet writer: files land under `<staging>/<epoch>/<partition
  * suffix>/`, one writer per partition value per task (same shape as the
  * batch GraftPartitionedWriterFactory; unpartitioned tables use the empty
  * suffix). CHECK constraints are evaluated per row before anything is
  * written. */
private[catalog] final class GraftStreamingWriterFactory(
    owf: org.apache.spark.sql.execution.datasources.OutputWriterFactory,
    conf: SerializableHadoopConf, staging: String, dataSchema: StructType,
    partFields: Seq[(Int, org.apache.spark.sql.types.DataType, Option[Int])],
    checks: Seq[(String, String, org.apache.spark.sql.catalyst.expressions.Expression)],
    table: String, specId: Long,
    zroute: Option[(GraftZOrder.Spec, Seq[(Int, org.apache.spark.sql.types.DataType)])] = None)
  extends StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val ctx = new TaskAttemptContextImpl(conf.value,
        new TaskAttemptID("graft-stream", 0, TaskType.MAP, partitionId,
          (taskId & 0x7fffffff).toInt))
      private val ext = owf.getFileExtension(ctx)
      private val extractors = partFields.map { case (i, dt, bucketN) =>
        GraftPartitions.routeExtractor(dt, i, bucketN)
      }
      // z-cell routing (per-CELL epoch segments, r17; composed with the
      // partition suffix on partitioned grids since r18); an unrouted
      // unpartitioned table keeps the empty suffix regardless of a
      // departitioned table's surviving spec id
      private val zextract = zroute.map { case (spec, fields) =>
        (spec, fields.map { case (i, dt) => GraftZOrder.extractor(dt, i) }.toArray)
      }
      private def encOf(row: InternalRow): String = {
        val part =
          if (extractors.isEmpty) ""
          else GraftPartitions.suffix(extractors.map(_(row)), specId)
        zextract match {
          case Some((spec, ex)) =>
            val vals = new Array[java.lang.Long](ex.length)
            var i = 0
            while (i < ex.length) { vals(i) = ex(i)(row); i += 1 }
            val cell = "zc" + spec.cellOf(spec.zkeyOf(vals))
            if (part.isEmpty) cell else part + "~" + cell
          case None => part
        }
      }
      private val violated = checks.map { case (n, sql, e) =>
        (n, sql, Predicate.create(EqualNullSafe(e, Literal(false, e.dataType))))
      }
      violated.foreach(_._3.initialize(partitionId))
      private val writers = scala.collection.mutable.HashMap.empty[String, OutputWriter]
      private val manifest = Seq.newBuilder[(String, String)]

      override def write(row: InternalRow): Unit = {
        violated.foreach { case (n, sql, p) =>
          if (p.eval(row)) throw new IllegalArgumentException(
            s"graft: CHECK constraint '$n' ($sql) violated on a row streamed to $table")
        }
        val enc = encOf(row)
        writers.getOrElseUpdate(enc, {
          val file = s"part-$partitionId-$taskId$ext"
          manifest += enc -> file
          owf.newInstance(s"$staging/$epochId/$enc/$file", dataSchema, ctx)
        }).write(row)
      }

      override def commit(): WriterCommitMessage = {
        writers.values.foreach(_.close())
        writers.clear()
        GraftPartitionFilesMessage(manifest.result())
      }

      override def abort(): Unit = writers.values.foreach(w => scala.util.Try(w.close()))
      override def close(): Unit = ()
    }
}
