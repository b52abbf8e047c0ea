package graft.catalog

import java.nio.file.{Files, Path}

import org.apache.spark.sql.connector.catalog.{StagedTable, SupportsWrite, Table, TableCapability}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}

/** ATOMIC CTAS / RTAS (`CREATE [OR REPLACE] TABLE ... AS SELECT`) via Spark's
  * StagingTableCatalog. Without a staging catalog Spark falls back to
  * non-atomic drop-then-create — a mid-write failure loses the old table and
  * readers can observe the name missing or half-filled. The graft rendering:
  *
  *   - CREATE stages IN PLACE: the meta file is written create-exclusively
  *     with a `graft.staged=<ms>` marker, so the name is claimed (a racing
  *     CREATE collides immediately) but `loadTable` refuses it — no reader
  *     ever sees the half-built table. `commitStagedChanges` clears the
  *     marker in one meta mutate (the visibility flip IS the atomic commit);
  *     abort deletes the directory.
  *   - REPLACE stages in a SIBLING directory (`<table>.__staged__<id>`): the
  *     live table keeps serving every reader while the replacement builds.
  *     Commit moves the staged segment dirs into the live directory (inert
  *     until referenced — the same reason plain appends are safe) and then
  *     swaps schema + snapshot + properties in ONE meta mutate. REPLACE
  *     discards prior history by contract: old snapshots, branch refs, tags
  *     and delete vectors describe a table definition that no longer exists,
  *     so `VERSION AS OF` a pre-replace id fails loudly and the dead segment
  *     dirs become orphans for `expire_snapshots`' aged sweep.
  *   - crash residue: a staged CREATE that never commits would squat on its
  *     name forever, so `createAt`/`stageCreate` reclaim staged metas older
  *     than [[GraceMs]] (an ACTIVE staging job is minutes old; the residue
  *     of a crashed one is hours old). Staged REPLACE residue is only a
  *     sibling dir — invisible, reclaimed by the same age rule on the next
  *     stageReplace of that table, and never blocks the live name. */
private[catalog] object GraftStaging {

  /** Meta property marking a staged-invisible table; value = stage wall ms. */
  val StagedProp = "graft.staged"

  /** Sibling-directory suffix for staged REPLACE builds. */
  val Suffix = ".__staged__"

  /** Residue older than this is reclaimable (Iceberg's orphan-grace shape). */
  val GraceMs: Long = 60L * 60 * 1000

  def isStaged(props: Map[String, String]): Boolean = props.contains(StagedProp)

  /** Delete `dir` iff it holds a STAGED meta older than the grace period.
    * Returns true when the caller may proceed as if the dir were absent. */
  def reclaimIfStale(dir: Path): Boolean = {
    val meta = scala.util.Try(GraftMeta.read(dir)).toOption
    meta.exists { m =>
      m.props.get(StagedProp).exists { t =>
        val stale = System.currentTimeMillis() - t.toLong > GraceMs
        if (stale) GraftMeta.deleteRecursively(dir)
        stale
      }
    }
  }

  /** Sweep aged `<table>.__staged__*` sibling residue of crashed REPLACE
    * attempts (they sit OUTSIDE the table dir, so expire_snapshots never
    * sees them); called by the next stageReplace of the same table. */
  def reclaimStaleSiblings(live: Path): Unit = {
    val parent = live.getParent
    val prefix = live.getFileName.toString + Suffix
    if (parent != null && Files.isDirectory(parent))
      GraftMeta.listDir(parent)
        .filter(_.getFileName.toString.startsWith(prefix))
        .foreach(reclaimIfStale)
  }

  /** Staged CREATE: inner table lives at its final path, marker-invisible. */
  def stagedCreate(inner: GraftTable, dir: Path): StagedTable =
    new StagedGraftTable(inner,
      onCommit = () => GraftMeta.mutate(dir)(m => m.copy(props = m.props - StagedProp)),
      onAbort = () => GraftMeta.deleteRecursively(dir))

  /** Staged REPLACE: inner table builds in `staging`; commit swaps `live`. */
  def stagedReplace(inner: GraftTable, live: Path, staging: Path): StagedTable =
    new StagedGraftTable(inner,
      onCommit = () => commitReplace(live, staging),
      onAbort = () => GraftMeta.deleteRecursively(staging))

  private def commitReplace(live: Path, staging: Path): Unit = {
    val sm = GraftMeta.read(staging)
    val segs = sm.snapshots.getOrElse(sm.current, Nil)
    // segment names are UUID-fresh, so moves cannot collide; moved dirs are
    // inert in the live dir until the meta mutate below references them
    segs.foreach { s =>
      Files.move(staging.resolve(s), live.resolve(s))
      GraftMeta.touchSegment(live, s)
    }
    GraftMeta.mutate(live) { m =>
      GraftMeta(schema = sm.schema, current = m.current + 1,
        snapshots = Map(m.current + 1 -> segs),
        props = sm.props - StagedProp,
        zstats = sm.zstats.filter { case (k, _) => segs.contains(k) },
        committedNamed = Map.empty,
        snapshotTimes = Map(m.current + 1 -> System.currentTimeMillis()),
        dvs = Map.empty)
    }
    GraftMeta.deleteRecursively(staging)
  }
}

/** The StagedTable Spark writes CTAS/RTAS data through: a thin delegate to a
  * fully-validated (invisible or sibling-staged) GraftTable, plus the atomic
  * visibility flip. The inner table's own write path runs unchanged — zone
  * stats, constraints, generated/identity columns, partitioned routing all
  * apply to staged writes exactly as to normal ones. */
private[catalog] final class StagedGraftTable(
    inner: GraftTable, onCommit: () => Unit, onAbort: () => Unit)
  extends StagedTable with SupportsWrite {

  override def name(): String = inner.name()
  override def schema(): org.apache.spark.sql.types.StructType = inner.schema()
  override def partitioning() = inner.partitioning()
  override def properties(): java.util.Map[String, String] = inner.properties()
  override def capabilities(): java.util.Set[TableCapability] = inner.capabilities()
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    inner.newWriteBuilder(info)

  override def commitStagedChanges(): Unit = onCommit()
  override def abortStagedChanges(): Unit = onAbort()
}
