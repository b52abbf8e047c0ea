package graft.catalog

import java.nio.file.{Files, Path}
import java.util.UUID

import org.apache.hadoop.mapreduce.{Job, TaskAttemptID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{InternalRow, ProjectingInternalRow}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.execution.datasources.OutputWriter
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types._

/** PERSISTED Z-ORDER ROUTING (r17) — the steady-state rung above
  * `rewrite_clustered`'s one-shot grid: the rewrite persists its routing
  * function (clustered columns, normalization bounds, and the n-1 zkey SPLIT
  * POINTS that define the cells), and every subsequent batch write routes its
  * rows through that function into `zc<i>`-suffixed segments. The table then
  * STAYS clustered under ongoing ingest and row-level DML — the
  * Delta-liquid-clustering shape, re-derived on the graft segment layer:
  *
  *   - INSERT INTO appends land per-cell segments (several small generations
  *     per cell over time; compaction already groups by FULL suffix, so
  *     `CALL compact` folds each cell back to one segment — ingest + compact
  *     is the maintenance loop, never a full re-cluster);
  *   - INSERT OVERWRITE rewrites the whole table under the grid;
  *   - SQL UPDATE/DELETE/MERGE (group-based row-level COW) rewrite their
  *     touched rows INTO CELLS — including rows whose clustered-column
  *     values changed, which re-route to their now-correct cell (tighter
  *     than the suffix-carry the procedure DML path uses);
  *   - STREAMING epochs route through the spec too (GraftStreamingWrite),
  *     landing per-cell epoch segments — continuous ingest stays in-grid;
  *   - a NEW row's cell assignment only needs the persisted spec: no reread,
  *     no coordination, pure per-row arithmetic in the writer.
  *
  * The split points come from approx-quantiles of the zkey at rewrite time,
  * so cells stay mass-balanced for the distribution the rewrite saw; drift
  * (new data outside the old bounds) degrades BALANCE, never correctness —
  * zone bounds are harvested from actual file contents, so pruning follows
  * the data wherever the router puts it. Re-running rewrite_clustered
  * refreshes the spec. The spec's columns are evolution-guarded like bucket
  * sources (no drop/retype-beyond-widening; renames re-key the props). */
private[catalog] object GraftZOrder {
  val ColsProp = "graft.zorder.cols"     // clustered columns, canonical csv
  val BoundsProp = "graft.zorder.bounds" // per-col "min:max" csv, long domain
  val SplitsProp = "graft.zorder.splits" // n-1 ascending zkey split points, csv

  final case class Spec(cols: Seq[String], bounds: Seq[(Long, Long)],
                        splits: Array[Long]) {
    val d: Int = cols.length
    val bits: Int = 62 / d
    val maxNorm: Long = (1L << bits) - 1

    /** The interleaved Morton key of one row's extracted long values (null →
      * 0, the lowest cell — the rewrite's convention). SAME arithmetic as
      * the rewrite's SQL expression ((v-mn)*maxNorm/range in double), so the
      * two paths assign rows identically up to double rounding — which only
      * blurs cell edges, never content (bounds are harvested from files). */
    def zkeyOf(vals: Array[java.lang.Long]): Long = {
      var key = 0L
      var j = 0
      while (j < d) {
        val (mn, mx) = bounds(j)
        val range = math.max(1L, mx - mn).toDouble
        val v = vals(j)
        val norm =
          if (v == null) 0L
          else math.min(maxNorm, math.max(0L,
            math.floor((v.longValue - mn).toDouble * maxNorm / range).toLong))
        var b = 0
        while (b < bits) {
          key |= ((norm >> b) & 1L) << (b * d + j)
          b += 1
        }
        j += 1
      }
      key
    }

    /** Cell index: count of split points at/below the key (cell 0 = below
      * the first split). Duplicate splits just leave empty cells. */
    def cellOf(zkey: Long): Int = {
      var lo = 0
      var hi = splits.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (splits(mid) <= zkey) lo = mid + 1 else hi = mid
      }
      lo
    }

    def cellCount: Int = splits.length + 1
  }

  def of(props: Map[String, String]): Option[Spec] =
    for {
      cols <- props.get(ColsProp).map(_.split(',').map(_.trim).toSeq.filter(_.nonEmpty))
      if cols.nonEmpty
      boundsRaw <- props.get(BoundsProp)
      splitsRaw <- props.get(SplitsProp)
      bounds <- scala.util.Try(boundsRaw.split(',').toSeq.map { b =>
        val Array(mn, mx) = b.split(':'); (mn.toLong, mx.toLong)
      }).toOption
      if bounds.length == cols.length
      splits <- scala.util.Try(
        if (splitsRaw.isEmpty) Array.empty[Long]
        else splitsRaw.split(',').map(_.toLong)).toOption
    } yield Spec(cols, bounds, splits)

  def render(spec: Spec): Map[String, String] = Map(
    ColsProp -> spec.cols.mkString(","),
    BoundsProp -> spec.bounds.map { case (mn, mx) => s"$mn:$mx" }.mkString(","),
    SplitsProp -> spec.splits.mkString(","))

  private[catalog] def parseBounds(csv: String): Seq[(Long, Long)] =
    csv.split(',').toSeq.map { b => val Array(mn, mx) = b.split(':'); (mn.toLong, mx.toLong) }
  private[catalog] def parseSplits(csv: String): Array[Long] =
    if (csv.isEmpty) Array.empty[Long] else csv.split(',').map(_.toLong)

  /** The `zcell(splits, bounds, cols...)` call as a v2 connector expression —
    * the distribution both clustered write paths declare (unpartitioned:
    * alone; partitioned: beside the partition columns), so Spark shuffles
    * each cell to one task before the writers open. */
  def distributionExpr(spec: Spec): org.apache.spark.sql.connector.expressions.Expression = {
    import org.apache.spark.sql.connector.expressions.Expressions
    val args: Seq[org.apache.spark.sql.connector.expressions.Expression] =
      Seq(Expressions.literal(org.apache.spark.unsafe.types.UTF8String.fromString(
            spec.splits.mkString(","))),
          Expressions.literal(org.apache.spark.unsafe.types.UTF8String.fromString(
            spec.bounds.map { case (mn, mx) => s"$mn:$mx" }.mkString(",")))) ++
        spec.cols.map(Expressions.column)
    Expressions.apply("zcell", args: _*)
  }

  /** The FunctionCatalog face (like GraftBucket.BucketFunction):
    * `zcell(splitsCsv, boundsCsv, cols...)` — the routing function AS a v2
    * catalog function, so [[GraftClusteredWrite]] can DECLARE
    * `clustered(zcell(...))` as its required distribution and Spark shuffles
    * each cell to ONE task before the write. Without it every task fans
    * across every cell it sees — cellCount × tasks files per append on a
    * 1000-executor job; with it, one writer stream per cell. The spec rides
    * the call as two STRING LITERALS (the persisted csv forms), parsed once
    * per task. */
  object ZCellFunction
    extends org.apache.spark.sql.connector.catalog.functions.UnboundFunction {
    override def name(): String = "zcell"
    override def description(): String =
      "zcell(splits, bounds, cols...) -> z-order cell id; the graft clustering router"
    override def bind(inputType: StructType)
      : org.apache.spark.sql.connector.catalog.functions.BoundFunction = {
      require(inputType.length >= 3,
        s"graft zcell(splits, bounds, col...) takes >= 3 arguments, got ${inputType.length}")
      require(inputType.fields(0).dataType == StringType &&
        inputType.fields(1).dataType == StringType,
        "graft zcell: the first two arguments are the csv split points and bounds")
      val colTypes = inputType.fields.drop(2).map(_.dataType)
      colTypes.foreach(dt => require(dt match {
        case ByteType | ShortType | IntegerType | LongType | DateType | TimestampType => true
        case _ => false
      }, s"graft zcell: unsupported routed column type ${dt.simpleString}"))
      // measurement hook (tools/ZCellAb): -Dgraft.zcell.nomagic=true binds a
      // function WITHOUT the invoke overloads, forcing the row-boxed
      // ApplyFunctionExpression path — the A/B for the codegen claim
      if (java.lang.Boolean.getBoolean("graft.zcell.nomagic"))
        new ZCellScalarNoMagic(colTypes)
      else new ZCellScalar(colTypes)
    }
  }

  /** produceResult-only twin for the codegen A/B (no magic overloads). */
  private[catalog] final class ZCellScalarNoMagic(colTypes: Array[DataType])
    extends org.apache.spark.sql.connector.catalog.functions.ScalarFunction[Int] {
    private val inner = new ZCellScalar(colTypes)
    override def inputTypes(): Array[DataType] = inner.inputTypes()
    override def resultType(): DataType = IntegerType
    override def name(): String = "zcell"
    override def canonicalName(): String = inner.canonicalName()
    override def isResultNullable: Boolean = false
    override def produceResult(input: InternalRow): Int = inner.produceResult(input)
  }

  /** The bound zcell router. Codegen contract (r18): the `invoke` magic
    * method overloads below cover every int/long-physical routed-column
    * shape (int/date -> int, long/timestamp -> long; d = 2 or 3), so the v2
    * function resolution plans a codegen'd `Invoke` instead of the row-boxed
    * `ApplyFunctionExpression` — the append's distribution shuffle hashes
    * the cell without building an InternalRow per row. byte/short routed
    * columns (rare) fall back to [[produceResult]].
    *
    * Null caveat, documented: the magic path is resolved with
    * propagateNull=false, so a NULL routed value reaches `invoke` as the
    * primitive default (0) where [[produceResult]] (and the WRITER's own
    * router, which always recomputes from the real row) maps NULL to the
    * lowest cell. The cell id only picks the SHUFFLE TARGET — file contents
    * are decided by the writer — so a null-bearing row may add one extra
    * file to its cell, never a wrong row.
    *
    * `spec`/`extractors` parse lazily from the constant literal args;
    * volatile (ADVICE r17): a shared deserialized instance evaluated from
    * two threads must never observe a half-initialized spec. */
  private[catalog] final class ZCellScalar(colTypes: Array[DataType])
    extends org.apache.spark.sql.connector.catalog.functions.ScalarFunction[Int] {
    import org.apache.spark.unsafe.types.UTF8String

    override def inputTypes(): Array[DataType] =
      (StringType +: StringType +: colTypes.toSeq).toArray
    override def resultType(): DataType = IntegerType
    override def name(): String = "zcell"
    override def canonicalName(): String =
      s"graft.zcell(${colTypes.map(_.catalogString).mkString(",")})"
    override def isResultNullable: Boolean = false

    @volatile private var spec: Spec = _
    @volatile private var extractors: Array[InternalRow => java.lang.Long] = _

    private def ensureSpec(splits: UTF8String, bounds: UTF8String): Spec = {
      var s = spec
      if (s == null) {
        val sp = parseSplits(splits.toString)
        val bd = parseBounds(bounds.toString)
        require(bd.length == colTypes.length,
          s"graft zcell: ${bd.length} bounds for ${colTypes.length} columns")
        s = Spec(Seq.fill(colTypes.length)("_"), bd, sp)
        spec = s
      }
      s
    }

    private def cell2(sp: UTF8String, bd: UTF8String, a: Long, b: Long): Int = {
      val s = ensureSpec(sp, bd)
      val vals = new Array[java.lang.Long](2)
      vals(0) = Long.box(a); vals(1) = Long.box(b)
      s.cellOf(s.zkeyOf(vals))
    }
    private def cell3(sp: UTF8String, bd: UTF8String, a: Long, b: Long, c: Long): Int = {
      val s = ensureSpec(sp, bd)
      val vals = new Array[java.lang.Long](3)
      vals(0) = Long.box(a); vals(1) = Long.box(b); vals(2) = Long.box(c)
      s.cellOf(s.zkeyOf(vals))
    }

    // the magic-method overload set: every int/long physical combination
    def invoke(sp: UTF8String, bd: UTF8String, a: Long, b: Long): Int = cell2(sp, bd, a, b)
    def invoke(sp: UTF8String, bd: UTF8String, a: Long, b: Int): Int = cell2(sp, bd, a, b.toLong)
    def invoke(sp: UTF8String, bd: UTF8String, a: Int, b: Long): Int = cell2(sp, bd, a.toLong, b)
    def invoke(sp: UTF8String, bd: UTF8String, a: Int, b: Int): Int = cell2(sp, bd, a.toLong, b.toLong)
    def invoke(sp: UTF8String, bd: UTF8String, a: Long, b: Long, c: Long): Int = cell3(sp, bd, a, b, c)
    def invoke(sp: UTF8String, bd: UTF8String, a: Long, b: Long, c: Int): Int = cell3(sp, bd, a, b, c.toLong)
    def invoke(sp: UTF8String, bd: UTF8String, a: Long, b: Int, c: Long): Int = cell3(sp, bd, a, b.toLong, c)
    def invoke(sp: UTF8String, bd: UTF8String, a: Long, b: Int, c: Int): Int = cell3(sp, bd, a, b.toLong, c.toLong)
    def invoke(sp: UTF8String, bd: UTF8String, a: Int, b: Long, c: Long): Int = cell3(sp, bd, a.toLong, b, c)
    def invoke(sp: UTF8String, bd: UTF8String, a: Int, b: Long, c: Int): Int = cell3(sp, bd, a.toLong, b, c.toLong)
    def invoke(sp: UTF8String, bd: UTF8String, a: Int, b: Int, c: Long): Int = cell3(sp, bd, a.toLong, b.toLong, c)
    def invoke(sp: UTF8String, bd: UTF8String, a: Int, b: Int, c: Int): Int = cell3(sp, bd, a.toLong, b.toLong, c.toLong)

    override def produceResult(input: InternalRow): Int = {
      var ex = extractors
      if (ex == null) {
        ensureSpec(input.getUTF8String(0), input.getUTF8String(1))
        ex = colTypes.zipWithIndex.map { case (dt, i) => extractor(dt, i + 2) }
        extractors = ex
      }
      val s = spec
      val vals = new Array[java.lang.Long](ex.length)
      var i = 0
      while (i < ex.length) { vals(i) = ex(i)(input); i += 1 }
      s.cellOf(s.zkeyOf(vals))
    }
  }

  /** Long-domain extractor for one routed column (the zone-entry domains:
    * dates epoch days, timestamps micros). */
  def extractor(dt: DataType, ordinal: Int): InternalRow => java.lang.Long = dt match {
    case ByteType      => r => if (r.isNullAt(ordinal)) null else Long.box(r.getByte(ordinal).toLong)
    case ShortType     => r => if (r.isNullAt(ordinal)) null else Long.box(r.getShort(ordinal).toLong)
    case IntegerType | DateType =>
      r => if (r.isNullAt(ordinal)) null else Long.box(r.getInt(ordinal).toLong)
    case LongType | TimestampType =>
      r => if (r.isNullAt(ordinal)) null else Long.box(r.getLong(ordinal))
    case other => throw new IllegalArgumentException(
      s"graft z-order: unsupported routed column type $other")
  }
}

/** The batch write for z-order-routed tables: identical commit machinery to
  * [[GraftPartitionedWrite]] (staging + manifest + one-snapshot commitMany /
  * commitReplaceSegments), with the row's CELL — computed from the persisted
  * spec — as the routing suffix instead of a partition value. */
private[catalog] final class GraftClusteredWrite(
    tableDir: Path, info: LogicalWriteInfo, spec: GraftZOrder.Spec,
    replaceAll: Boolean, fromRowLevelOp: Boolean, expectedCurrent: Option[Long],
    groupRemovals: () => Option[Seq[String]] = () => None)
  extends Write with RequiresDistributionAndOrdering {

  /** Cluster on the CELL (the zcell catalog function, resolved against this
    * table's FunctionCatalog exactly like the bucket transform): each cell's
    * rows shuffle to one task, so an append writes one stream per cell
    * instead of cellCount files from every task — the layout a
    * 1000-executor ingest needs. Row-level replacement writes (r18) declare
    * the SAME distribution: the column references resolve BY NAME against
    * the replacement query's output (which carries the data columns beside
    * the leading __row_operation), so a whole-table UPDATE on a clustered
    * table shuffles once and writes ~one file per cell instead of
    * cells x tasks. */
  override def requiredDistribution(): org.apache.spark.sql.connector.distributions.Distribution =
    org.apache.spark.sql.connector.distributions.Distributions.clustered(
      Array(GraftZOrder.distributionExpr(spec)))

  override def requiredOrdering(): Array[org.apache.spark.sql.connector.expressions.SortOrder] =
    Array.empty

  private val metaAtBuild = GraftMeta.read(tableDir)
  private val props = metaAtBuild.props
  private val identitySpecs = GraftIdentity.of(props, info.schema())

  private val named = Option(info.options.get("graft.segment"))
  named.foreach(n => require(n.matches("[A-Za-z0-9_.\\-]+"),
    s"graft.segment must be [A-Za-z0-9_.-]+, got '$n'"))
  private val namedKey = named.map("seg-" + _)

  private val branch = Option(info.options.get("graft.branch"))
  branch.foreach { b =>
    require(!replaceAll && !fromRowLevelOp && named.isEmpty,
      "graft: branch writes are plain unnamed appends (no overwrite/DML on a branch)")
    require(GraftRefs.get(metaAtBuild, b).isDefined,
      s"graft: no branch '$b' — CALL create_branch first")
    // identity WAP appends allocate at stage time (r18): the branch commit's
    // propCas rider advances the main high-water (see GraftRefs.commitToBranch)
  }

  // named-retry sweep: same contract as the partitioned writer (a crashed
  // attempt's moved-but-uncommitted cell dirs must not double rows)
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

  private val dataSchema: StructType = info.schema()
  // spec columns resolved against the DATA schema (row-level rows carry the
  // leading __row_operation column; the writer strips it before extraction)
  private val routedFields: Seq[(Int, DataType)] = spec.cols.map { c =>
    val i = dataSchema.fieldNames.indexWhere(_.equalsIgnoreCase(c))
    require(i >= 0, s"graft z-order: routed column '$c' missing from write schema $dataSchema")
    (i, dataSchema.fields(i).dataType)
  }

  override def description(): String =
    s"graft-clustered-write($writeId, cells=${spec.cellCount}, " +
      s"cols=${spec.cols.mkString(",")}, replaceAll=$replaceAll)"

  /** Streaming appends route through the spec too (GraftStreamingWrite
    * derives the cell router from the table props): every epoch lands
    * per-cell segments, so continuous ingest stays in-grid and compact
    * folds each cell's epoch generations. */
  override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
    require(!replaceAll && branch.isEmpty && !fromRowLevelOp && named.isEmpty,
      "graft: streaming writes are plain unnamed appends")
    new GraftStreamingWrite(tableDir, info, Nil, metaAtBuild)
  }

  override def toBatch: BatchWrite =
    if (alreadyCommitted) new NoopBatchWrite(namedKey.get)
    else new BatchWrite {
      override def createBatchWriterFactory(pInfo: PhysicalWriteInfo): DataWriterFactory = {
        val spark = SparkSession.active
        val job = Job.getInstance(spark.sessionState.newHadoopConf())
        val owf = new ParquetFileFormat()
          .prepareWrite(spark, job, Map.empty[String, String], dataSchema)
        val checked = GraftChecks.wrap(
          new GraftZCellWriterFactory(owf,
            new SerializableHadoopConf(job.getConfiguration),
            staging.toString, dataSchema, spec, routedFields, fromRowLevelOp),
          dataSchema, props, writeId,
          ordinalOffset = if (fromRowLevelOp) 1 else 0)
        if (fromRowLevelOp)
          // NULLs are MERGE-INSERT-minted rows — allocated here (r18), the
          // high-water advancing in the rewrite commit's propCas rider
          GraftIdentity.rowLevelWrap(checked, identitySpecs, dataSchema,
            pInfo.numPartitions(), writeId, ordinalOffset = 1)
        else
          GraftIdentity.wrap(GraftGenerate.wrap(checked, dataSchema, props, writeId),
            identitySpecs, dataSchema, pInfo.numPartitions(), writeId)
      }

      override def commit(messages: Array[WriterCommitMessage]): Unit = {
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
        val byCell: Map[String, Seq[String]] =
          manifest.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
        // land files serially (cheap local renames), then harvest every
        // cell segment's stats CONCURRENTLY (r21 — the per-cell footer pass
        // was the commit's serial driver tail)
        val landed = byCell.toSeq.sortBy(_._1).map { case (enc, fileNames) =>
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
            removedByGroupFilter match {
              case Some(removed) =>
                GraftMeta.commitReplaceSegments(tableDir, segments,
                  removed.toSet, expectedCurrent,
                  propCas = GraftIdentity.propCas(identitySpecs, identityExtremes))
              case None =>
                val applied = GraftMeta.commitMany(tableDir, segments,
                  replaceAll = replaceAll, removeSuffixes = Set.empty,
                  expectedCurrent = expectedCurrent, namedKey = namedKey,
                  propCas = GraftIdentity.propCas(identitySpecs, identityExtremes))
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

/** Per-task fan-out writer routing each row to its z-cell ("zc<i>"): same
  * staging/manifest protocol as the partitioned writer factory. */
private[catalog] final class GraftZCellWriterFactory(
    owf: org.apache.spark.sql.execution.datasources.OutputWriterFactory,
    conf: SerializableHadoopConf, staging: String, dataSchema: StructType,
    spec: GraftZOrder.Spec, routedFields: Seq[(Int, DataType)],
    fromRowLevelOp: Boolean)
  extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val ctx = new TaskAttemptContextImpl(conf.value,
        new TaskAttemptID("graft", 0, TaskType.MAP, partitionId, (taskId & 0x7fffffff).toInt))
      private val ext = owf.getFileExtension(ctx)
      private val extractors = routedFields.map { case (i, dt) =>
        GraftZOrder.extractor(dt, i)
      }.toArray
      private val vals = new Array[java.lang.Long](extractors.length)
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
        var i = 0
        while (i < extractors.length) { vals(i) = extractors(i)(data); i += 1 }
        val enc = "zc" + spec.cellOf(spec.zkeyOf(vals))
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
