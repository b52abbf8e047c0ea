package graft.catalog

import java.nio.file.Paths

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.lit

/** NET row-level change-data capture between two snapshots of a graft table —
  * the increment the append-only changes feed (q178, `graft.changes.from`)
  * honestly refuses: ranges containing REPLACE/REWRITE commits (MERGE,
  * UPDATE/DELETE copy-on-write, compaction, dynamic partition overwrite).
  *
  * Derivation is pure segment-list algebra plus one distributed multiset
  * difference, reading ONLY segments that changed:
  *
  *   - `base \ target` segments hold every row that MAY have left the table;
  *   - `target \ base` segments hold every row that MAY have arrived;
  *   - segments in both carry identical rows by immutability and contribute
  *     nothing — they are never read;
  *   - a copy-on-write rewrite copies untouched survivor rows into a new
  *     segment, so the two reads share those rows: `EXCEPT ALL` in both
  *     directions cancels them exactly (multiset semantics keep genuine
  *     duplicate rows), leaving true row deltas. Pure compaction or a
  *     rollback-and-restore nets to ZERO deltas, as it must.
  *
  * Output schema: the table's columns plus `_change_type` ('insert' |
  * 'delete'). `rowDeltas` gives RANGE-LEVEL net changes (Delta CDF's "net
  * changes between versions" shape); `commitDeltas` attributes each delta to
  * the commit that produced it (Delta CDF's `table_changes` / Iceberg's
  * changelog shape) by diffing every CONSECUTIVE snapshot pair in the range —
  * attribution per commit is exact because each pair is diffed in isolation;
  * only the range-level call nets a row's intermediate hops away. Cost
  * scales with the CHANGED segments, not the table — on a 100 TB table a
  * one-partition MERGE yields a delta read of one partition.
  *
  * Retention contract: the snapshot ids a call diffs must still be retained
  * (`expire_snapshots` keeps the consumer's horizon, same as the streaming
  * source) — for `commitDeltas` that is every snapshot in the range, since
  * attribution needs each intermediate state.
  *
  * Reference behaviour derived from the published Delta CDF contract
  * (`_change_type`, net-vs-per-commit ranges); derivation itself is segment
  * algebra over the graft meta, no reference code involved. */
object GraftCdc {

  /** Row deltas turning snapshot `from` of `catalog`.`table` into snapshot
    * `to` (defaults to current). `table` is 'ns.t' relative to the catalog. */
  def rowDeltas(spark: SparkSession, catalog: String, table: String,
                from: Long, to: Option[Long] = None): DataFrame = {
    val root = spark.conf.getOption(s"spark.sql.catalog.$catalog.root").getOrElse(
      throw new IllegalArgumentException(s"no graft catalog named '$catalog' in this session"))
    val dir = table.split('.').foldLeft(Paths.get(root))(_ resolve _)
    val meta = GraftMeta.read(dir)
    val toSnap = to.getOrElse(meta.current)
    Seq(from, toSnap).foreach(s => require(meta.snapshots.contains(s),
      s"$catalog.$table: no snapshot $s (have ${meta.snapshots.keys.toSeq.sorted.mkString(",")})"))
    require(from <= toSnap, s"$catalog.$table: from $from must be <= to $toSnap")
    diffSnapshots(spark, catalog, table, meta, from, toSnap)
  }

  /** Per-commit row deltas over `(from, to]`: every delta row tagged with the
    * `_commit_version` (and `_commit_timestamp`) of the commit that produced
    * it. Each consecutive snapshot pair is diffed independently, so a row
    * UPDATEd at v and DELETEd at v+2 yields its full history (delete+insert
    * at v, delete at v+2) where `rowDeltas(from, to)` would net it to one
    * delete. A pure-compaction commit contributes ZERO rows, as it must.
    * Requires every snapshot in the range to still be retained. */
  def commitDeltas(spark: SparkSession, catalog: String, table: String,
                   from: Long, to: Option[Long] = None): DataFrame = {
    val root = spark.conf.getOption(s"spark.sql.catalog.$catalog.root").getOrElse(
      throw new IllegalArgumentException(s"no graft catalog named '$catalog' in this session"))
    val dir = table.split('.').foldLeft(Paths.get(root))(_ resolve _)
    val meta = GraftMeta.read(dir)
    val toSnap = to.getOrElse(meta.current)
    require(from <= toSnap, s"$catalog.$table: from $from must be <= to $toSnap")
    val versions = from to toSnap
    val missing = versions.filterNot(meta.snapshots.contains)
    require(missing.isEmpty,
      s"$catalog.$table: snapshots ${missing.mkString(",")} expired — per-commit " +
        "attribution needs every snapshot in the range (use rowDeltas for net changes)")
    val perCommit = versions.sliding(2).collect { case Seq(prev, v) =>
      diffSnapshots(spark, catalog, table, meta, prev, v)
        .withColumn("_commit_version", lit(v))
        // snapshots recorded before snapshotTimes existed have no commit
        // time: emit null (the column is nullable) rather than silently
        // attributing them to the 1970 epoch
        .withColumn("_commit_timestamp", meta.snapshotTimes.get(v) match {
          case Some(ms) => lit(new java.sql.Timestamp(ms))
          case None     => lit(null).cast("timestamp")
        })
    }.toSeq
    if (perCommit.isEmpty) {
      import org.apache.spark.sql.types._
      val schema = meta.schema
        .add("_change_type", StringType).add("_commit_version", LongType)
        .add("_commit_timestamp", TimestampType)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    } else perCommit.reduce(_ unionAll _)
  }

  /** One snapshot-pair diff: read only the segments that CHANGED between the
    * sides (shared segments with identical delete vectors carry identical
    * live rows by immutability and are never touched); bidirectional EXCEPT
    * ALL cancels copy-on-write survivor copies. A segment present on both
    * sides whose DELETE-VECTOR list changed (a merge-on-read DELETE) is read
    * on BOTH sides, each side merged against its own snapshot's vectors —
    * the surviving rows cancel and exactly the newly-deleted rows remain as
    * 'delete' deltas. */
  private def diffSnapshots(spark: SparkSession, catalog: String, table: String,
                            meta: GraftMeta, baseSnap: Long,
                            targetSnap: Long): DataFrame = {
    val base = meta.snapshots(baseSnap)
    val target = meta.snapshots(targetSnap)
    val baseDvs = meta.dvs.getOrElse(baseSnap, Map.empty)
    val targetDvs = meta.dvs.getOrElse(targetSnap, Map.empty)
    val dvChanged = base.toSet.intersect(target.toSet).filter(s =>
      baseDvs.getOrElse(s, Nil) != targetDvs.getOrElse(s, Nil))
    val leftOnly = base.filterNot(target.toSet) ++ dvChanged.toSeq.sorted
    val rightOnly = target.filterNot(base.toSet) ++ dvChanged.toSeq.sorted

    def readSegs(segs: Seq[String], dvs: Map[String, Seq[String]]): DataFrame =
      if (segs.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          meta.schema)
      else {
        val reader = spark.read.option("graft.segments", segs.mkString(","))
        val applicable = dvs.filter { case (s, _) => segs.contains(s) }
        (if (applicable.isEmpty) reader
         else reader.option(GraftDv.DvsOption, GraftDv.encode(applicable)))
          .table(s"$catalog.$table")
      }

    val removed = readSegs(leftOnly, baseDvs)
    val added = readSegs(rightOnly, targetDvs)
    // ONE-PASS net diff (r21, guide §2.3/§2.4): the previous shape was two
    // EXCEPT ALLs (added \ removed, removed \ added) — Spark rewrites EACH
    // into its own union+aggregate+replicate, so every changed segment was
    // scanned twice and the union shuffled twice. The signed-count aggregate
    // below computes the same multiset net in ONE union+aggregate: each
    // changed segment scans once, one exchange. Pure appends (nothing
    // removed) and pure reaps (nothing added) skip the aggregate entirely —
    // with no other side, nothing can cancel, so the delta IS the scan.
    import org.apache.spark.sql.functions.{abs, col, explode, least, sequence, sum, when}
    if (rightOnly.isEmpty) removed.withColumn("_change_type", lit("delete"))
    else if (leftOnly.isEmpty) added.withColumn("_change_type", lit("insert"))
    else {
      val cols = meta.schema.fieldNames.toSeq
      val signed = added.withColumn("__sign", lit(1L))
        .unionAll(removed.withColumn("__sign", lit(-1L)))
      val net = signed.groupBy(cols.map(col): _*)
        .agg(sum(col("__sign")).as("__net"))
        .where(col("__net") =!= 0L)
      // |net| copies of each surviving row — multiset semantics identical to
      // the bidirectional EXCEPT ALL (a row is never on both sides of the
      // net). Replication is CHUNKED (≤4096-element arrays) so a pathological
      // multiplicity of one exact-duplicate row streams instead of
      // materializing a single giant array.
      val n = abs(col("__net"))
      net
        .withColumn("_change_type",
          when(col("__net") > 0L, lit("insert")).otherwise(lit("delete")))
        .withColumn("__chunk",
          explode(sequence(lit(0L), ((n - lit(1L)) / lit(4096L)).cast("long"))))
        .withColumn("__i",
          explode(sequence(lit(1L),
            least(lit(4096L), n - col("__chunk") * lit(4096L)))))
        .select((cols.map(col) :+ col("_change_type")): _*)
    }
  }
}
