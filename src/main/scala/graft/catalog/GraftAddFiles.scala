package graft.catalog

import java.nio.file.{Files, Path}
import java.util.UUID

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.procedures.ProcedureParameter
import org.apache.spark.sql.connector.read.Scan
import org.apache.spark.sql.types._

/** `CALL graft.system.add_files(table, path)` — ZERO-COPY IMPORT of existing
  * parquet files into a graft table: the files are HARD-LINKED (not read, not
  * rewritten) into a fresh segment directory, zone-map stats are harvested
  * with the same footer pass every write path uses, and ONE append commit
  * publishes them. The migration primitive for onboarding raw parquet into
  * the engine at O(#files) metadata cost — 100 TB imports in seconds.
  * (Published Iceberg `add_files` contract, re-derived — contract only.)
  *
  * Honesty gates (each refusal names its remediation):
  *   - SCHEMA must match the table exactly by name and type (order-free;
  *     nullability ignored — the scan null-fills), validated against EVERY
  *     file's own footer — per-file drift among the linked files must fail
  *     here, not at some future read. Anything else would defer a read error
  *     to some future query instead of failing the import.
  *   - NESTED parquet (a partitioned or multi-level export) is refused: a
  *     flat top-level link would silently skip the nested files, and a
  *     partition-dir export keeps its partition values in directory names
  *     that a flat import would drop.
  *   - PARTITIONED tables refuse BY DEFAULT: imported files are not known
  *     partition-pure, and faking a suffix would poison pruning and
  *     partition-scoped DML. `validate_partitions => true` (r19) buys the
  *     layout with ONE check scan projected to the partition columns: every
  *     file must hold exactly one partition tuple (an impure file refuses BY
  *     NAME), pure files group into one correctly-suffixed segment per
  *     tuple (the same canonical CAST-AS-STRING %-encoding every
  *     partition-pure writer shares), and the import commits them all as
  *     one snapshot — the onboarding path for a migrating lakehouse whose
  *     exports are per-tenant/per-day files. The scan reads ONLY the
  *     partition columns (columnar projection), the deliberate opt-in cost;
  *     unvalidated flat imports stay zero-read.
  *   - Tables with CHECK constraints are refused: imported rows would bypass
  *     the write gate (validating them requires the full read the procedure
  *     exists to avoid).
  *   - The source files must live on the same filesystem (hard links); a
  *     cross-device source falls back to a copy — correct, just not shared.
  */
private[catalog] final class AddFilesProcedure(catalog: GraftCatalog)
  extends GraftProcedure(catalog) {

  override def name(): String = "add_files"
  override def description(): String =
    "zero-copy import: hard-link existing parquet files as a new segment"

  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("table", StringType).build(),
    ProcedureParameter.in("path", StringType).build(),
    // opt-in partition-purity check scan for identity-partitioned targets
    ProcedureParameter.in("validate_partitions", BooleanType)
      .defaultValue("false").build())

  override val outputSchema: StructType = StructType(Seq(
    StructField("segment", StringType, nullable = false),
    StructField("files_added", IntegerType, nullable = false),
    StructField("bytes", LongType, nullable = false),
    StructField("rows", LongType, nullable = true)))

  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val dir = resolveTableDir(input.getUTF8String(0).toString)
    val srcPath = java.nio.file.Paths.get(input.getUTF8String(1).toString)
    require(Files.isDirectory(srcPath),
      s"graft add_files: '$srcPath' is not a directory")
    val files = GraftMeta.listDir(srcPath)
      .filter(p => Files.isRegularFile(p) && p.getFileName.toString.endsWith(".parquet"))
    // nested parquet (a partitioned or multi-level export) must refuse, not
    // silently import only the top level: partition-dir exports carry the
    // partition VALUES in directory names, which a flat link would drop
    val nested = {
      val walk = Files.walk(srcPath)
      try {
        val it = walk.iterator()
        var found = false
        while (!found && it.hasNext) {
          val p = it.next()
          found = Files.isRegularFile(p) && p.getFileName.toString.endsWith(".parquet") &&
            p.getParent != srcPath
        }
        found
      } finally walk.close()
    }
    require(!nested,
      s"graft add_files: '$srcPath' contains .parquet files in nested " +
        "subdirectories — a flat import would skip them (and a partitioned " +
        "export's partition values live in the directory names); import each " +
        "leaf directory separately or load via INSERT ... SELECT")
    require(files.nonEmpty, s"graft add_files: no .parquet files under '$srcPath'")

    val spark = SparkSession.active
    val meta = GraftMeta.read(dir)
    require(GraftBucket.of(meta.props).isEmpty,
      "graft add_files: table is bucket-partitioned — imported files would " +
        "break the bucket-pure layout; use INSERT ... SELECT instead")
    val validate = !input.isNullAt(2) && input.getBoolean(2)
    val partCols = GraftPartitions.cols(meta.props)
    require(partCols.isEmpty || validate,
      "graft add_files: table is identity-partitioned — imported files are not " +
        "known partition-pure; pass validate_partitions => true for a one-scan " +
        "purity check (each file must hold one partition tuple), or use " +
        "INSERT ... SELECT")
    require(!meta.props.keys.exists(_.startsWith(GraftChecks.Prefix)),
      "graft add_files: table declares CHECK constraints — imported rows would " +
        "bypass the write gate; use INSERT ... SELECT instead")
    require(!meta.props.keys.exists(_.startsWith(GraftGenerate.Prefix)),
      "graft add_files: table declares GENERATED columns — imported rows would " +
        "bypass fill/validation; use INSERT ... SELECT instead")
    require(!GraftIdentity.isIdentityTable(meta.props),
      "graft add_files: table declares IDENTITY columns — imported rows would " +
        "carry ids outside the allocator; use INSERT ... SELECT instead")
    // a RENAMEd table resolves columns BY FIELD ID (GraftFieldIds) and
    // imported foreign parquet carries no footer ids — its files would
    // refuse to read; the Iceberg answer is a per-file name mapping, which
    // this catalog does not claim — refuse at import, not at read
    require(!GraftFieldIds.resolveById(meta.props),
      "graft add_files: table has renamed columns and resolves reads by " +
        "field id; imported files carry no footer ids — load via " +
        "INSERT ... SELECT instead")

    // schema gate, PER FILE: every footer must carry every table column with
    // the same type (order-free); extra source columns are refused (they would
    // silently vanish on read — surprise data loss at import is worse than an
    // error). A directory-level sampled read would let per-file drift through
    // the gate and defer the error to read time, contradicting fail-at-import.
    // Cost: one driver-side footer read per file — the same O(#files)
    // metadata class as the link loop and the stats harvest below.
    files.foreach { file =>
      val srcSchema = spark.read.parquet(file.toString).schema
      val byName = srcSchema.fields.map(f => f.name -> f.dataType).toMap
      meta.schema.fields.foreach { f =>
        byName.get(f.name) match {
          case Some(dt) => require(dt == f.dataType,
            s"graft add_files: column '${f.name}' is ${dt.simpleString} in " +
              s"'${file.getFileName}', ${f.dataType.simpleString} in the table")
          case None => throw new IllegalArgumentException(
            s"graft add_files: '${file.getFileName}' lacks table column '${f.name}'")
        }
      }
      val extra = srcSchema.fieldNames.toSet -- meta.schema.fieldNames.toSet
      require(extra.isEmpty,
        s"graft add_files: '${file.getFileName}' has columns the table lacks: " +
          s"${extra.mkString(", ")} — ALTER TABLE ADD COLUMNS first, or project " +
          "them away and INSERT")
    }

    // file groups: the whole directory as one segment (unpartitioned), or —
    // under validate_partitions — one group per proven partition tuple
    val groups: Seq[(String, Seq[Path])] =
      if (partCols.isEmpty) Seq(("", files))
      else {
        // ONE check scan, projected to the partition columns and AGGREGATED
        // per file (r20): `count(distinct tuple)` + a representative tuple.
        // The driver-side result is file-count-sized UNCONDITIONALLY — the
        // old distinct-pairs collect was file-count-sized only on pure
        // exports, and an impure high-cardinality import flooded the driver
        // before the refusal landed.
        import org.apache.spark.sql.functions.{col, countDistinct, first, struct}
        val tuple = struct(partCols.map(col): _*)
        val perFile = spark.read.parquet(files.map(_.toString): _*)
          .select(col("_metadata.file_path").as("__g_fp") +:
            partCols.map(c => col(c).cast("string").as(c)): _*)
          .groupBy(col("__g_fp"))
          .agg(countDistinct(tuple).as("__nt"), first(tuple).as("__t"))
          .collect()
        val byFile = perFile.map(r => java.nio.file.Paths.get(
          java.net.URI.create(r.getString(0)).getPath).getFileName.toString -> r).toMap
        byFile.toSeq.sortBy(_._1).find(_._2.getLong(1) > 1).foreach { case (f, r) =>
          throw new IllegalArgumentException(
            s"graft add_files: file '$f' holds ${r.getLong(1)} distinct partition " +
              s"tuples over (${partCols.mkString(", ")}) — not partition-pure; " +
              "split it by partition value (or load via INSERT ... SELECT)")
        }
        val sid = GraftPartitions.specId(meta.props)
        files.map { p =>
          val row = byFile.getOrElse(p.getFileName.toString, throw
            new IllegalArgumentException(
              s"graft add_files: file '${p.getFileName}' is empty — an empty " +
                "file proves no partition value; drop it from the import"))
          // __nt == 1, so the per-file `first` tuple IS the proven value
          val t = row.getStruct(2)
          val values = partCols.indices.map(i =>
            if (t.isNullAt(i)) null else t.getString(i))
          (GraftPartitions.suffix(values, sid), p)
        }.groupBy(_._1).toSeq.sortBy(_._1).map { case (s, fs) => (s, fs.map(_._2)) }
      }

    var bytes = 0L
    var totalRows = 0L
    var anyRowsUnknown = false
    val segments: Seq[(String, Option[String])] = groups.map { case (sfx, fs) =>
      val segment = s"seg-add-${UUID.randomUUID().toString.take(12)}" +
        (if (sfx.isEmpty) "" else s"${GraftPartitions.Marker}$sfx")
      val segDir = dir.resolve(segment)
      Files.createDirectories(segDir)
      fs.foreach { p =>
        val t = segDir.resolve(p.getFileName.toString)
        try Files.createLink(t, p)
        catch { case _: UnsupportedOperationException | _: java.io.IOException =>
          Files.copy(p, t) }
        bytes += Files.size(p)
      }
      // same commit-time stats harvest as every write path: zone maps (and
      // blooms/sums if the table opted in) come from footers, no data scan.
      // selfWritten=false: a FOREIGN writer may have truncated its binary
      // statistics, so imported string bounds stay brackets (prune, never
      // answer MIN/MAX) — the one provenance the exactness flag must not trust
      val harvested = scala.util.Try(SegmentStats.harvest(
        spark, segDir.toString, meta.readSchema,
        SegmentStats.sumCols(meta.props, meta.schema),
        GraftBloom.cols(meta.props, meta.schema),
        SegmentStats.ndvCols(meta.props, meta.schema), selfWritten = false,
        klls = SegmentStats.kllCols(meta.props, meta.schema))).toOption
      harvested match {
        case Some(h) => totalRows += h.rows
        case None    => anyRowsUnknown = true
      }
      segment -> harvested.flatMap(h => scala.util.Try(SegmentStats.encode(h)).toOption)
    }
    GraftDml.cleanupOnFailedCommit(dir, segments.map(_._1)) {
      GraftMeta.commitMany(dir, segments,
        replaceAll = false, removeSuffixes = Set.empty, expectedCurrent = None,
        namedKey = None)
    }
    result(org.apache.spark.unsafe.types.UTF8String.fromString(
        segments.map(_._1).mkString(",")),
      files.size, bytes, if (anyRowsUnknown) null else Long.box(totalRows))
  }
}
