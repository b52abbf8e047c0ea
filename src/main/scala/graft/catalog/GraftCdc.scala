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
  * 'delete'). Deltas are RANGE-LEVEL net changes (Delta CDF's "net changes
  * between versions" shape): per-commit attribution is not claimed because a
  * row surviving several rewrites in the range has no single commit of
  * record. Cost scales with the CHANGED segments, not the table — on a
  * 100 TB table a one-partition MERGE yields a delta read of one partition.
  *
  * Retention contract: both snapshot ids must still be retained
  * (`expire_snapshots` keeps the consumer's horizon, same as the streaming
  * source). */
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
    val base = meta.snapshots(from)
    val target = meta.snapshots(toSnap)
    val leftOnly = base.filterNot(target.toSet)
    val rightOnly = target.filterNot(base.toSet)

    def readSegs(segs: Seq[String]): DataFrame =
      if (segs.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          meta.schema)
      else
        spark.read.option("graft.segments", segs.mkString(","))
          .table(s"$catalog.$table")

    val removed = readSegs(leftOnly)
    val added = readSegs(rightOnly)
    added.exceptAll(removed).withColumn("_change_type", lit("insert"))
      .unionAll(removed.exceptAll(added).withColumn("_change_type", lit("delete")))
  }
}
