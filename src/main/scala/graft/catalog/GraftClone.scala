package graft.catalog

import java.nio.file.{Files, Path}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.procedures.ProcedureParameter
import org.apache.spark.sql.connector.read.Scan
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `CALL graft.system.clone_table(source, target [, snapshot])` — ZERO-COPY
  * table clone: the target is a brand-new table whose first snapshot holds
  * HARD LINKS to the source snapshot's parquet files (and its delete-vector
  * files), so cloning a 100 TB table costs O(#files) metadata operations and
  * zero data bytes.
  *
  * Hard links — not path references — are what make the clone SAFE under
  * maintenance, which is where published shallow-clone designs carry a
  * documented foot-gun (vacuuming the source breaks Delta shallow clones):
  * each side owns its own directory entries, so the source expiring,
  * compacting, or deleting a shared segment merely unlinks ITS name — the
  * clone's links keep the bytes alive, and vice versa. The two tables share
  * storage until either side diverges, and divergence is per-file.
  *
  * The clone starts a FRESH lineage: its own snapshot counter, empty
  * exactly-once registry (a streaming query replaying into the clone is a
  * different table), copied zone-map stats (pruning works immediately), and
  * the source's table properties (partitioning, layout, DML modes, CHECK
  * constraints) minus MV bookkeeping — a cloned MV is just a table. An
  * optional `snapshot` clones a historical version: time travel that you can
  * then write to (the "branch from the past" Iceberg/Delta cannot express
  * without copying). Falls back to a real copy per file iff the filesystem
  * refuses links (cross-device) — correctness never depends on sharing. */
private[catalog] final class CloneTableProcedure(catalog: GraftCatalog)
  extends GraftProcedure(catalog) {

  override def name(): String = "clone_table"
  override def description(): String =
    "zero-copy clone: a new table hard-linking the source snapshot's files"

  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("source", StringType).build(),
    ProcedureParameter.in("target", StringType).build(),
    ProcedureParameter.in("snapshot", LongType).defaultValue("-1").build())

  override val outputSchema: StructType = StructType(Seq(
    StructField("target", StringType, nullable = false),
    StructField("source_snapshot", LongType, nullable = false),
    StructField("segments", IntegerType, nullable = false),
    StructField("files_linked", IntegerType, nullable = false),
    StructField("bytes_shared", LongType, nullable = false)))

  private def linkTree(src: Path, dst: Path): (Int, Long) = {
    Files.createDirectories(dst)
    var files = 0; var bytes = 0L
    GraftMeta.listDir(src).foreach { p =>
      val t = dst.resolve(p.getFileName.toString)
      if (Files.isDirectory(p)) {
        val (f, b) = linkTree(p, t); files += f; bytes += b
      } else {
        try Files.createLink(t, p)
        catch { case _: UnsupportedOperationException | _: java.io.IOException =>
          Files.copy(p, t) } // cross-device fallback: correct, just not shared
        files += 1; bytes += Files.size(p)
      }
    }
    (files, bytes)
  }

  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val srcDir = resolveTableDir(input.getUTF8String(0).toString)
    val targetArg = input.getUTF8String(1).toString
    val snapArg = input.getLong(2)
    val meta = GraftMeta.read(srcDir)
    val snap = if (snapArg < 0) meta.current else snapArg
    require(meta.snapshots.contains(snap),
      s"graft clone_table: no snapshot $snap " +
        s"(have ${meta.snapshots.keys.toSeq.sorted.mkString(",")})")
    val parts = targetArg.split('.')
    val dstDir = catalog.tableDirFor(
      org.apache.spark.sql.connector.catalog.Identifier.of(parts.init, parts.last))
    require(!Files.exists(dstDir.resolve(GraftMeta.FileName)),
      s"graft clone_table: target '$targetArg' already exists")
    Files.createDirectories(dstDir)

    val segs = meta.snapshots(snap)
    val dvs = meta.dvs.getOrElse(snap, Map.empty)
    val dvDirs = dvs.valuesIterator.flatten.toSeq.distinct
    var files = 0; var bytes = 0L
    (segs ++ dvDirs).foreach { d =>
      val (f, b) = linkTree(srcDir.resolve(d), dstDir.resolve(d))
      files += f; bytes += b
    }
    // fresh lineage: snapshot 0 empty (the created state), snapshot 1 = the
    // cloned content; no registry entries, stats carried for shared segments
    val now = System.currentTimeMillis()
    GraftMeta.write(dstDir, GraftMeta(
      schema = meta.schema, current = 1L,
      snapshots = Map(0L -> Nil, 1L -> segs),
      props = meta.props.view.filterKeys(k => !k.startsWith("graft.mv.") &&
        !k.startsWith(GraftRefs.Prefix) &&
        // tags pin SOURCE snapshot ids — meaningless in the clone's fresh
        // lineage (its history starts at 1), so they don't carry
        !k.startsWith(GraftRefs.TagPrefix)).toMap,
      zstats = meta.zstats.view.filterKeys(segs.contains).toMap,
      snapshotTimes = Map(0L -> now, 1L -> now),
      dvs = if (dvs.isEmpty) Map.empty else Map(1L -> dvs)))
    result(UTF8String.fromString(targetArg), snap, segs.size, files, bytes)
  }
}
