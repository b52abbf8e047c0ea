package graft.catalog

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count, CountStar, Max, Min, Sum}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** METADATA-ONLY aggregate pushdown: answer `COUNT(*)` / `COUNT(col)` /
  * `MIN(col)` / `MAX(col)` from the committed segment zone maps — zero file
  * IO, zero tasks reading data. The Iceberg/Delta "scan-less count" recipe
  * one level up from parquet's footer-serving aggregate pushdown: the stats
  * were harvested once at commit (SegmentStats) and live in the table meta,
  * so on a 100 TB table the whole aggregate is a driver-side fold over
  * segment-count entries.
  *
  * GROUP BY is served too, when every visible segment is CONSTANT in every
  * grouped column — each zone entry must be all-null (`nulls == rows`, the
  * NULL group) or null-free with `min == max` (the value IS the group key).
  * Identity-partitioned tables satisfy this by construction (segments are
  * partition-pure, so `SELECT day, COUNT(*) ... GROUP BY day` folds segment
  * row counts with zero IO — the per-partition audit a 100 TB lakehouse runs
  * constantly), but the gate is the value-level invariant, not the declared
  * spec, so pre-evolution generations and add_files imports qualify whenever
  * their footers prove constancy. `min == max` stays exact even under
  * bound-truncating parquet writers: truncation rounds min down and max up,
  * so truncMin == truncMax == v brackets every real value at exactly v —
  * which also makes STRING group keys safe where string MIN/MAX answers are
  * not (a truncated bound is a wrong ANSWER but a correct BRACKET).
  *
  * Strictly exactness-gated, refusing (→ normal scan) when:
  *   - any predicate was pushed (stats cannot apply row filters),
  *   - any GROUP BY expression is not a plain top-level column, or any
  *     segment is non-constant in it (mixed values, partial nulls, missing
  *     entry, zero-row segments excepted),
  *   - any aggregate is not COUNT(*)/COUNT(col)/MIN/MAX (COUNT DISTINCT,
  *     AVG need rows) or an opted-in integral SUM,
  *   - MIN/MAX targets a column outside integral/date/timestamp/string, or
  *     a STRING column whose bounds are not flagged EXACT (Col.strExact,
  *     r17): engine-written segments' footer bounds are untruncated by
  *     construction and answer MIN/MAX zero-IO in UTF8String binary order;
  *     add_files imports and pre-r17 entries may be writer-truncated
  *     brackets — safe for PRUNING, refused for answers,
  *   - any visible segment lacks decodable stats for a referenced column
  *     (e.g. segments written before an ADD COLUMN),
  *   - the snapshot carries delete vectors (physical row counts overcount;
  *     the DV scan builder simply never offers the interface).
  *
  * Pushdown is PARTIAL (supportCompletePushDown = false): the scan emits one
  * pre-aggregated row per group and Spark's final aggregate merges them —
  * the same contract the built-in parquet pushdown uses, which keeps
  * query-side semantics (empty-table nulls, type widening) Spark's own. */
private[catalog] object GraftStatsAgg {

  /** Try to answer `agg` from stats. Returns the scan output schema (group
    * columns first, then one field per aggregate, positional — the layout
    * Spark's pushed-aggregate rewrite expects) and the pre-aggregated rows
    * (one per group; exactly one for the global form). */
  def plan(agg: Aggregation, segments: Seq[String], zstats: Map[String, String],
           schema: StructType): Option[(StructType, Seq[InternalRow])] = {
    val decoded = segments.map(s => zstats.get(s)
      .flatMap(z => scala.util.Try(SegmentStats.decode(z)).toOption))
    if (decoded.exists(_.isEmpty)) return None
    // zero-row segments carry no values: they contribute nothing to any
    // group or aggregate, and their (None,None) bounds must not refuse the
    // constancy gate below
    val stats = decoded.flatten.filter(_.rows > 0L)

    def colOf(e: org.apache.spark.sql.connector.expressions.Expression): Option[StructField] =
      e match {
        case nr: NamedReference if nr.fieldNames().length == 1 =>
          schema.fields.find(_.name.equalsIgnoreCase(nr.fieldNames()(0)))
        case _ => None
      }

    /** decode one bound ('i' Long / 'd' epoch-days / 't' micros / 's' raw
      * string) to the column's PHYSICAL catalyst value */
    def physical(dt: DataType, raw: String): Any = dt match {
      case ByteType      => raw.toLong.toByte
      case ShortType     => raw.toLong.toShort
      case IntegerType   => raw.toLong.toInt
      case LongType      => raw.toLong
      case DateType      => raw.toLong.toInt   // epoch days
      case TimestampType => raw.toLong          // micros
      case StringType    => UTF8String.fromString(raw)
      case other => throw new IllegalStateException(s"unreachable: $other")
    }

    // ---- GROUP BY resolution: every grouped column constant per segment ----
    val groupFields: Seq[StructField] = agg.groupByExpressions.toSeq.map { e =>
      val f = colOf(e).getOrElse(return None)
      f.dataType match {
        case ByteType | ShortType | IntegerType | LongType | DateType |
             TimestampType | StringType => f
        case _ => return None // no zone entry kind can reconstruct the value
      }
    }
    // per-segment group key (null = the NULL group); refuse on any
    // non-constant segment
    def groupKey(s: SegmentStats.Stats): Option[List[Any]] = {
      val vals = groupFields.map { f =>
        s.cols.get(f.name) match {
          case Some(c) if c.nulls == s.rows => null
          case Some(c) if c.nulls == 0L && c.min.isDefined && c.min == c.max =>
            physical(f.dataType, c.min.get)
          case _ => return None
        }
      }
      Some(vals.toList)
    }
    // groups in first-seen order (deterministic given the segment list)
    val grouped: Seq[(List[Any], Seq[SegmentStats.Stats])] =
      if (groupFields.isEmpty) Seq(Nil -> stats)
      else {
        val order = scala.collection.mutable.LinkedHashMap.empty[List[Any], Vector[SegmentStats.Stats]]
        stats.foreach { s =>
          val k = groupKey(s).getOrElse(return None)
          order.update(k, order.getOrElse(k, Vector.empty) :+ s)
        }
        order.toSeq
      }

    /** every segment's stats entry for `name` within one group, or None if
      * any is missing */
    def colStats(group: Seq[SegmentStats.Stats], name: String): Option[Seq[SegmentStats.Col]] = {
      val per = group.map(_.cols.get(name))
      if (per.exists(_.isEmpty)) None else Some(per.flatten)
    }

    def minMaxType(dt: DataType): Boolean = dt match {
      case ByteType | ShortType | IntegerType | LongType | DateType | TimestampType => true
      case _ => false
    }

    /** STRING MIN/MAX (r17): served iff every bound involved is EXACT
      * (Col.strExact — harvested from an engine-written segment or the
      * aggregate fallback; add_files imports and pre-r17 entries refuse).
      * Bounds merge in UTF8String BINARY order — the exact total order
      * Spark's row-reading min/max uses — NOT java String order, which
      * disagrees beyond the BMP (a supplementary character sorts above
      * U+E000..U+FFFF in UTF-8 byte order but below it in UTF-16).
      * All-null segments (min absent) contribute nothing and need no flag. */
    def stringBound(per: Seq[SegmentStats.Col], wantMin: Boolean): Option[Any] = {
      val defined = per.filter(c => if (wantMin) c.min.isDefined else c.max.isDefined)
      if (defined.exists(!_.strExact)) return None // bracket-only bound: refuse
      val vs = defined.map(c => UTF8String.fromString(if (wantMin) c.min.get else c.max.get))
      Some(if (vs.isEmpty) null
           else vs.reduce((a, b) =>
             if ((a.compareTo(b) <= 0) == wantMin) a else b))
    }

    // ---- plan the aggregate schema once, values per group ----
    val aggFields = Seq.newBuilder[StructField]
    // one evaluator per aggregate, applied to each group's segment stats;
    // a None from any evaluator on any group refuses the whole pushdown
    val evals = Seq.newBuilder[Seq[SegmentStats.Stats] => Option[Any]]
    agg.aggregateExpressions.foreach {
      case _: CountStar =>
        aggFields += StructField("count(*)", LongType, nullable = false)
        evals += (g => Some(g.map(_.rows).sum))
      case c: Count if !c.isDistinct =>
        val f = colOf(c.column()).getOrElse(return None)
        aggFields += StructField(s"count(${f.name})", LongType, nullable = false)
        evals += (g => colStats(g, f.name).map(per =>
          g.zip(per).map { case (s, col) => s.rows - col.nulls }.sum))
      case m: Min =>
        val f = colOf(m.column()).getOrElse(return None)
        if (f.dataType == StringType) {
          aggFields += StructField(s"min(${f.name})", StringType, nullable = true)
          evals += (g => colStats(g, f.name).flatMap(stringBound(_, wantMin = true)))
        } else if (minMaxType(f.dataType)) {
          aggFields += StructField(s"min(${f.name})", f.dataType, nullable = true)
          evals += (g => colStats(g, f.name).map { per =>
            val mins = per.flatMap(_.min).map(_.toLong)
            if (mins.isEmpty) null else physical(f.dataType, mins.min.toString)
          })
        } else return None
      case m: Max =>
        val f = colOf(m.column()).getOrElse(return None)
        if (f.dataType == StringType) {
          aggFields += StructField(s"max(${f.name})", StringType, nullable = true)
          evals += (g => colStats(g, f.name).flatMap(stringBound(_, wantMin = false)))
        } else if (minMaxType(f.dataType)) {
          aggFields += StructField(s"max(${f.name})", f.dataType, nullable = true)
          evals += (g => colStats(g, f.name).map { per =>
            val maxes = per.flatMap(_.max).map(_.toLong)
            if (maxes.isEmpty) null else physical(f.dataType, maxes.max.toString)
          })
        } else return None
      case sm: Sum if !sm.isDistinct =>
        // served only when the table opted into commit-time SUM harvest
        // (graft.stats.sums) AND every visible segment carries the sum for
        // this integral column; the partial is LongType (Spark's sum result
        // for integral inputs), merged with overflow-checked addition — an
        // overflowing total refuses pushdown rather than wrapping where the
        // row-reading plan would raise
        val f = colOf(sm.column()).getOrElse(return None)
        val integral = f.dataType match {
          case ByteType | ShortType | IntegerType | LongType => true
          case _ => false
        }
        if (!integral) return None
        aggFields += StructField(s"sum(${f.name})", LongType, nullable = true)
        evals += { g =>
          colStats(g, f.name).flatMap { per =>
            if (per.exists(_.sum.isEmpty)) None
            else {
              val nonNull = g.zip(per).map { case (s, c) => s.rows - c.nulls }.sum
              try {
                val total = per.flatMap(_.sum).map(_.toLong).foldLeft(0L)(Math.addExact)
                Some(if (nonNull == 0) null else total)
              } catch { case _: ArithmeticException => None }
            }
          }
        }
      // AVG never arrives here: Spark's partial-pushdown rewrite decomposes
      // it into Sum + Count, so AVG over a sums-opted table serves zero-IO
      // through the two cases above (StatsAggSpec pins it)
      case _ => return None // COUNT DISTINCT/UDAFs need rows
    }

    val evaluators = evals.result()
    val rows = grouped.map { case (key, group) =>
      val aggVals = evaluators.map(_(group).getOrElse(return None))
      new GenericInternalRow((key ++ aggVals).toArray): InternalRow
    }
    Some((StructType(groupFields ++ aggFields.result()), rows))
  }
}

/** The scan a stats-served aggregate plans: one partition, one row per
  * group (one total for the global form), no IO. */
private[catalog] final class GraftStatsAggScan(
    aggSchema: StructType, rows: Seq[InternalRow], tableName: String,
    segmentCount: Int) extends Scan {

  override def readSchema(): StructType = aggSchema

  override def description(): String =
    s"graft-stats-agg($tableName: ${aggSchema.fieldNames.mkString(", ")} " +
      s"from $segmentCount segment zone maps, ${rows.size} group row(s), no file IO)"

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      Array(new InputPartition {})
    override def createReaderFactory(): PartitionReaderFactory = {
      val rs = rows.toArray
      new PartitionReaderFactory {
        override def createReader(p: InputPartition): PartitionReader[InternalRow] =
          new PartitionReader[InternalRow] {
            private var i = -1
            override def next(): Boolean = { i += 1; i < rs.length }
            override def get(): InternalRow = rs(i)
            override def close(): Unit = ()
          }
      }
    }
  }
}
