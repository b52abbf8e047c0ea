package graft.catalog

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.procedures.ProcedureParameter
import org.apache.spark.sql.connector.read.Scan
import org.apache.spark.sql.types._

/** Branch refs: the write-audit-publish (WAP) surface of the graft catalog.
  *
  * A branch is a NAMED REF — `(base main snapshot, full segment list)` — stored
  * as a table property (`ref.<name>`), deliberately OUTSIDE the snapshot
  * lineage: `meta.snapshots` stays the pure main history, so every consumer
  * that walks consecutive snapshot ids (the CDC feed `t.changes`, per-commit
  * attribution, the streaming source's offset ranges, expiry's keep-last
  * arithmetic) is untouched by branch activity. Publishing a branch
  * (`fast_forward`) lands its whole staged state as ONE ordinary main commit —
  * downstream CDC sees exactly the audited net change, which is the point of
  * WAP: nothing unaudited ever enters the main lineage.
  *
  * Contract (behavior derived from the PUBLISHED Iceberg branch/WAP docs —
  * contract only, no code):
  *   - `CALL graft.system.create_branch(t, b)` forks `b` at the current main
  *     snapshot (the ref records that base id for divergence detection and
  *     for the base's delete-vector associations).
  *   - appends with `.option("graft.branch", b)` stage new segments into the
  *     ref's list; main's `current` never moves. Only plain appends: replace /
  *     dynamic-overwrite / row-level DML on a branch is refused — WAP stages
  *     additions for audit, it is not a parallel-universe DML surface.
  *   - reads via `VERSION AS OF '<b>'` (or `.option("graft.branch", b)`) see
  *     base + staged, with the BASE snapshot's delete vectors applied — the
  *     audit query runs against exactly what publishing would make current.
  *   - `fast_forward(t, b)` publishes atomically IF main has not moved since
  *     the fork (`current == base`); a diverged main fails typed — re-stage
  *     against the new current rather than silently merging unaudited state.
  *   - `drop_branch(t, b)` discards the ref and deletes staged-only segments
  *     (never anything a snapshot or another ref still references).
  *
  * Retention: `expire_snapshots` treats every ref's base snapshot as kept and
  * every ref-listed segment as referenced, so an unpublished branch can never
  * lose its data or its base's delete vectors to maintenance. */
private[catalog] object GraftRefs {
  val Prefix = "ref."

  /** TAGS are the IMMUTABLE sibling of branches: a named pointer to one main
    * snapshot (`tag.<name> = <snapshot id>`), read via `VERSION AS OF '<tag>'`.
    * The separate property prefix is what makes the immutability structural —
    * the branch write path (`.option("graft.branch", ...)`) looks up `ref.*`
    * only, so a tag can NEVER accept staged segments; there is no "commit to a
    * tag" to forbid. Retention: `expire_snapshots` keeps every tagged
    * snapshot (a tag is a release pointer — `drop_tag` is the only way it
    * stops pinning history). Published Iceberg tag contract, re-derived —
    * contract only, no code. */
  val TagPrefix = "tag."

  final case class Ref(base: Long, dirs: Seq[String])

  def tagKey(name: String): String = TagPrefix + name

  def getTag(meta: GraftMeta, name: String): Option[Long] =
    meta.props.get(tagKey(name)).map(_.toLong)

  def allTags(meta: GraftMeta): Map[String, Long] =
    meta.props.collect { case (k, v) if k.startsWith(TagPrefix) =>
      k.stripPrefix(TagPrefix) -> v.toLong
    }

  def key(name: String): String = Prefix + name

  /** No dots/commas/'@' (encoding + property-key safety) and not all-digits —
    * a numeric name would be shadowed by `VERSION AS OF <snapshot-id>`. */
  def requireValidName(name: String): Unit =
    require(name.matches("[A-Za-z0-9_\\-]+") && !name.forall(_.isDigit),
      s"graft: branch name '$name' must match [A-Za-z0-9_-]+ and not be all digits")

  def encode(r: Ref): String = s"${r.base}@${r.dirs.mkString(",")}"

  def decode(v: String): Ref = {
    val Array(base, dirs) = v.split("@", 2)
    Ref(base.toLong, if (dirs.isEmpty) Nil else dirs.split(",").toSeq)
  }

  def get(meta: GraftMeta, name: String): Option[Ref] =
    meta.props.get(key(name)).map(decode)

  def all(meta: GraftMeta): Map[String, Ref] =
    meta.props.collect { case (k, v) if k.startsWith(Prefix) =>
      k.stripPrefix(Prefix) -> decode(v)
    }

  /** Stage freshly written segments onto a branch: ONE CAS commit that extends
    * the ref's segment list and records zone-map stats; snapshots and
    * `current` never move. The branch must exist (checked again under the
    * lock — a concurrent drop_branch between a write's build and its commit
    * must fail the commit, not resurrect the ref).
    *
    * `propCas` (r18): identity high-water riders. A WAP append to an
    * identity table allocates ids at STAGE time and advances the main
    * high-water IN THIS COMMIT — so a second staged write (same or another
    * branch) and concurrent main appends all allocate disjoint ranges, and
    * fast_forward needs no identity logic at all. A later drop_branch
    * leaves the staged range as a GAP in the id space — identity promises
    * uniqueness and monotonic growth, never density (the Delta trade). */
  def commitToBranch(tableDir: java.nio.file.Path, branch: String,
                     segments: Seq[(String, Option[String])],
                     propCas: Seq[(String, String, String)] = Nil): Unit =
    GraftMeta.mutate(tableDir) { meta =>
      val ref = get(meta, branch).getOrElse(throw new IllegalStateException(
        s"graft: no branch '$branch' (create_branch first; a concurrent " +
          "drop_branch also lands here)"))
      propCas.foreach { case (k, expected, _) =>
        require(meta.props.get(k).contains(expected),
          s"graft: concurrent allocation detected on '$k' (allocated from " +
            s"$expected, committed value is ${meta.props.getOrElse(k, "<absent>")}); " +
            "retry the write")
      }
      val fresh = segments.filterNot { case (s, _) => ref.dirs.contains(s) }
      meta.copy(
        props = meta.props + (key(branch) -> encode(ref.copy(dirs = ref.dirs ++ fresh.map(_._1)))) ++
          propCas.map(t => t._1 -> t._3),
        zstats = meta.zstats ++ fresh.collect { case (s, Some(z)) => s -> z })
    }
}

/** `CALL graft.system.create_branch(table, branch)` — fork a WAP branch at the
  * current main snapshot. */
private[catalog] final class CreateBranchProcedure(catalog: GraftCatalog)
  extends GraftProcedure(catalog) {

  override def name(): String = "create_branch"
  override def description(): String =
    "fork a write-audit-publish branch at the current main snapshot"

  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("table", StringType).build(),
    ProcedureParameter.in("branch", StringType).build())

  override val outputSchema: StructType = StructType(Seq(
    StructField("branch", StringType, nullable = false),
    StructField("base_snapshot", LongType, nullable = false),
    StructField("n_segments", IntegerType, nullable = false)))

  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val dir = resolveTableDir(input.getUTF8String(0).toString)
    val branch = input.getUTF8String(1).toString
    GraftRefs.requireValidName(branch)
    var out: GraftRefs.Ref = null
    GraftMeta.mutate(dir) { meta =>
      require(!meta.props.contains(GraftRefs.key(branch)),
        s"graft: branch '$branch' already exists")
      // shared namespace with tags: `VERSION AS OF '<name>'` must be unambiguous
      require(!meta.props.contains(GraftRefs.tagKey(branch)),
        s"graft: '$branch' already names a tag")
      out = GraftRefs.Ref(meta.current, meta.snapshots.getOrElse(meta.current, Nil))
      meta.copy(props = meta.props + (GraftRefs.key(branch) -> GraftRefs.encode(out)))
    }
    result(org.apache.spark.unsafe.types.UTF8String.fromString(branch),
      out.base, out.dirs.size)
  }
}

/** `CALL graft.system.drop_branch(table, branch)` — discard a branch; staged
  * segments referenced by NO snapshot and NO other ref are deleted. */
private[catalog] final class DropBranchProcedure(catalog: GraftCatalog)
  extends GraftProcedure(catalog) {

  override def name(): String = "drop_branch"
  override def description(): String =
    "discard a branch and delete its staged-only segments"

  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("table", StringType).build(),
    ProcedureParameter.in("branch", StringType).build())

  override val outputSchema: StructType = StructType(Seq(
    StructField("branch", StringType, nullable = false),
    StructField("segments_deleted", IntegerType, nullable = false)))

  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val dir = resolveTableDir(input.getUTF8String(0).toString)
    val branch = input.getUTF8String(1).toString
    var staged: Seq[String] = Nil
    GraftMeta.mutate(dir) { meta =>
      val ref = GraftRefs.get(meta, branch).getOrElse(
        throw new IllegalArgumentException(s"graft: no branch '$branch'"))
      val snapRefs = meta.snapshots.valuesIterator.flatten.toSet
      val otherRefs = (GraftRefs.all(meta) - branch).valuesIterator.flatMap(_.dirs).toSet
      staged = ref.dirs.filterNot(s => snapRefs(s) || otherRefs(s))
      meta.copy(props = meta.props - GraftRefs.key(branch),
        zstats = meta.zstats -- staged)
    }
    // delete AFTER the metadata drop commits (same order as expiry: a crash
    // mid-delete leaves unreferenced dirs for the orphan sweep, never a live
    // ref pointing at deleted data)
    staged.foreach(s => GraftMeta.deleteRecursively(dir.resolve(s)))
    result(org.apache.spark.unsafe.types.UTF8String.fromString(branch), staged.size)
  }
}

/** `CALL graft.system.fast_forward(table, branch)` — PUBLISH: make the
  * branch's staged state the current main snapshot, atomically, iff main has
  * not moved since the fork. The whole audited batch lands as ONE main
  * commit; the ref is consumed. */
private[catalog] final class FastForwardProcedure(catalog: GraftCatalog)
  extends GraftProcedure(catalog) {

  override def name(): String = "fast_forward"
  override def description(): String =
    "publish a branch: its staged state becomes the current main snapshot"

  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("table", StringType).build(),
    ProcedureParameter.in("branch", StringType).build())

  override val outputSchema: StructType = StructType(Seq(
    StructField("previous_snapshot", LongType, nullable = false),
    StructField("new_snapshot", LongType, nullable = false),
    StructField("segments_published", IntegerType, nullable = false)))

  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val dir = resolveTableDir(input.getUTF8String(0).toString)
    val branch = input.getUTF8String(1).toString
    var prev = -1L; var next = -1L; var published = 0
    GraftMeta.mutate(dir) { meta =>
      val ref = GraftRefs.get(meta, branch).getOrElse(
        throw new IllegalArgumentException(s"graft: no branch '$branch'"))
      if (meta.current != ref.base) throw new GraftConcurrentCommitException(
        s"graft fast_forward: main moved since branch '$branch' forked " +
          s"(base ${ref.base}, current ${meta.current}) — the staged state was " +
          "audited against a stale base; re-stage against the new current")
      prev = meta.current
      next = meta.current + 1
      published = ref.dirs.count(s => !meta.snapshots.getOrElse(prev, Nil).contains(s))
      meta.copy(current = next,
        snapshots = meta.snapshots + (next -> ref.dirs),
        snapshotTimes = meta.snapshotTimes + (next -> System.currentTimeMillis()),
        // the base's delete vectors ride along with its surviving segments —
        // publishing a branch must not resurrect rows a MOR DELETE removed
        dvs = meta.dvs + (next -> meta.dvsAfter(ref.dirs)),
        props = meta.props - GraftRefs.key(branch))
    }
    result(prev, next, published)
  }
}

/** `CALL graft.system.create_tag(table, tag[, snapshot])` — pin an immutable
  * named pointer at a snapshot (default: the current one). Reads resolve via
  * `VERSION AS OF '<tag>'`; `expire_snapshots` retains the tagged snapshot for
  * as long as the tag exists. */
private[catalog] final class CreateTagProcedure(catalog: GraftCatalog)
  extends GraftProcedure(catalog) {

  override def name(): String = "create_tag"
  override def description(): String =
    "pin an immutable named tag at a snapshot (default: current)"

  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("table", StringType).build(),
    ProcedureParameter.in("tag", StringType).build(),
    ProcedureParameter.in("snapshot", LongType).defaultValue("-1").build())

  override val outputSchema: StructType = StructType(Seq(
    StructField("tag", StringType, nullable = false),
    StructField("snapshot", LongType, nullable = false)))

  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val dir = resolveTableDir(input.getUTF8String(0).toString)
    val tag = input.getUTF8String(1).toString
    val requested = input.getLong(2)
    GraftRefs.requireValidName(tag)
    var pinned = -1L
    GraftMeta.mutate(dir) { meta =>
      pinned = if (requested >= 0) requested else meta.current
      require(meta.snapshots.contains(pinned),
        s"graft create_tag: no snapshot $pinned (have ${meta.snapshots.keys.toSeq.sorted})")
      require(!meta.props.contains(GraftRefs.tagKey(tag)),
        s"graft: tag '$tag' already exists")
      // one NAMESPACE across both ref kinds: `VERSION AS OF '<name>'` must
      // resolve unambiguously, so a name can't be a branch and a tag at once
      require(!meta.props.contains(GraftRefs.key(tag)),
        s"graft: '$tag' already names a branch")
      meta.copy(props = meta.props + (GraftRefs.tagKey(tag) -> pinned.toString))
    }
    result(org.apache.spark.unsafe.types.UTF8String.fromString(tag), pinned)
  }
}

/** `CALL graft.system.drop_tag(table, tag)` — remove the pointer; the
  * snapshot it pinned becomes expirable again (data is untouched here). */
private[catalog] final class DropTagProcedure(catalog: GraftCatalog)
  extends GraftProcedure(catalog) {

  override def name(): String = "drop_tag"
  override def description(): String = "drop a tag (the snapshot stays; it just stops being retained)"

  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("table", StringType).build(),
    ProcedureParameter.in("tag", StringType).build())

  override val outputSchema: StructType = StructType(Seq(
    StructField("tag", StringType, nullable = false),
    StructField("snapshot", LongType, nullable = false)))

  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val dir = resolveTableDir(input.getUTF8String(0).toString)
    val tag = input.getUTF8String(1).toString
    var pinned = -1L
    GraftMeta.mutate(dir) { meta =>
      pinned = GraftRefs.getTag(meta, tag).getOrElse(
        throw new IllegalArgumentException(s"graft: no tag '$tag'"))
      meta.copy(props = meta.props - GraftRefs.tagKey(tag))
    }
    result(org.apache.spark.unsafe.types.UTF8String.fromString(tag), pinned)
  }
}
