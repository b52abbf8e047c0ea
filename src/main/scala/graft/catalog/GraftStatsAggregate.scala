package graft.catalog

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count, CountStar, Max, Min, Sum}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan}
import org.apache.spark.sql.types._

/** METADATA-ONLY aggregate pushdown: answer `COUNT(*)` / `COUNT(col)` /
  * `MIN(col)` / `MAX(col)` from the committed segment zone maps — zero file
  * IO, zero tasks reading data. The Iceberg/Delta "scan-less count" recipe
  * one level up from parquet's footer-serving aggregate pushdown: the stats
  * were harvested once at commit (SegmentStats) and live in the table meta,
  * so on a 100 TB table the whole aggregate is a driver-side fold over
  * segment-count entries.
  *
  * Strictly exactness-gated, refusing (→ normal scan) when:
  *   - any predicate was pushed (stats cannot apply row filters),
  *   - any GROUP BY is present,
  *   - any aggregate is not COUNT(*)/COUNT(col)/MIN/MAX (COUNT DISTINCT,
  *     SUM, AVG need rows),
  *   - MIN/MAX targets a non-integral/date/timestamp column (string footer
  *     bounds are merge-exact here, but truncating writers exist — bounds
  *     are safe for PRUNING, not for answers),
  *   - any visible segment lacks decodable stats for a referenced column
  *     (e.g. segments written before an ADD COLUMN),
  *   - the snapshot carries delete vectors (physical row counts overcount;
  *     the DV scan builder simply never offers the interface).
  *
  * Pushdown is PARTIAL (supportCompletePushDown = false): the scan emits one
  * pre-aggregated row and Spark's final aggregate merges it — the same
  * contract the built-in parquet pushdown uses, which keeps query-side
  * semantics (empty-table nulls, type widening) Spark's own. */
private[catalog] object GraftStatsAgg {

  /** Try to answer `agg` from stats. Returns the scan output schema (one
    * field per aggregate, positional) and the single pre-aggregated row. */
  def plan(agg: Aggregation, segments: Seq[String], zstats: Map[String, String],
           schema: StructType): Option[(StructType, InternalRow)] = {
    if (agg.groupByExpressions.nonEmpty) return None
    val decoded = segments.map(s => zstats.get(s)
      .flatMap(z => scala.util.Try(SegmentStats.decode(z)).toOption))
    if (decoded.exists(_.isEmpty)) return None
    val stats = decoded.flatten

    def colOf(e: org.apache.spark.sql.connector.expressions.Expression): Option[StructField] =
      e match {
        case nr: NamedReference if nr.fieldNames().length == 1 =>
          schema.fields.find(_.name.equalsIgnoreCase(nr.fieldNames()(0)))
        case _ => None
      }

    /** every segment's stats entry for `name`, or None if any is missing */
    def colStats(name: String): Option[Seq[SegmentStats.Col]] = {
      val per = stats.map(_.cols.get(name))
      if (per.exists(_.isEmpty)) None else Some(per.flatten)
    }

    def minMaxType(dt: DataType): Boolean = dt match {
      case ByteType | ShortType | IntegerType | LongType | DateType | TimestampType => true
      case _ => false
    }

    /** decode one bound ('i' Long / 'd' epoch-days / 't' micros string) to
      * the column's PHYSICAL catalyst value */
    def physical(dt: DataType, raw: String): Any = dt match {
      case ByteType      => raw.toLong.toByte
      case ShortType     => raw.toLong.toShort
      case IntegerType   => raw.toLong.toInt
      case LongType      => raw.toLong
      case DateType      => raw.toLong.toInt   // epoch days
      case TimestampType => raw.toLong          // micros
      case other => throw new IllegalStateException(s"unreachable: $other")
    }

    val fields = Seq.newBuilder[StructField]
    val values = Seq.newBuilder[Any]
    agg.aggregateExpressions.foreach {
      case _: CountStar =>
        fields += StructField("count(*)", LongType, nullable = false)
        values += stats.map(_.rows).sum
      case c: Count if !c.isDistinct =>
        val f = colOf(c.column()).getOrElse(return None)
        val per = colStats(f.name).getOrElse(return None)
        fields += StructField(s"count(${f.name})", LongType, nullable = false)
        values += stats.zip(per).map { case (s, col) => s.rows - col.nulls }.sum
      case m: Min =>
        val f = colOf(m.column()).getOrElse(return None)
        if (!minMaxType(f.dataType)) return None
        val per = colStats(f.name).getOrElse(return None)
        val mins = per.flatMap(_.min).map(_.toLong)
        fields += StructField(s"min(${f.name})", f.dataType, nullable = true)
        values += (if (mins.isEmpty) null else physical(f.dataType, mins.min.toString))
      case m: Max =>
        val f = colOf(m.column()).getOrElse(return None)
        if (!minMaxType(f.dataType)) return None
        val per = colStats(f.name).getOrElse(return None)
        val maxes = per.flatMap(_.max).map(_.toLong)
        fields += StructField(s"max(${f.name})", f.dataType, nullable = true)
        values += (if (maxes.isEmpty) null else physical(f.dataType, maxes.max.toString))
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
        val per = colStats(f.name).getOrElse(return None)
        if (per.exists(_.sum.isEmpty)) return None
        val nonNull = stats.zip(per).map { case (s, c) => s.rows - c.nulls }.sum
        val total =
          try Some(per.flatMap(_.sum).map(_.toLong).foldLeft(0L)(Math.addExact))
          catch { case _: ArithmeticException => return None }
        fields += StructField(s"sum(${f.name})", LongType, nullable = true)
        values += (if (nonNull == 0) null else total.get)
      case _ => return None // AVG/COUNT DISTINCT/UDAFs need rows
    }
    Some((StructType(fields.result()), new GenericInternalRow(values.result().toArray)))
  }
}

/** The scan a stats-served aggregate plans: one partition, one row, no IO. */
private[catalog] final class GraftStatsAggScan(
    aggSchema: StructType, row: InternalRow, tableName: String,
    segmentCount: Int) extends Scan {

  override def readSchema(): StructType = aggSchema

  override def description(): String =
    s"graft-stats-agg($tableName: ${aggSchema.fieldNames.mkString(", ")} " +
      s"from $segmentCount segment zone maps, no file IO)"

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      Array(new InputPartition {})
    override def createReaderFactory(): PartitionReaderFactory = {
      val r = row
      new PartitionReaderFactory {
        override def createReader(p: InputPartition): PartitionReader[InternalRow] =
          new PartitionReader[InternalRow] {
            private var served = false
            override def next(): Boolean = { val n = !served; served = true; n }
            override def get(): InternalRow = r
            override def close(): Unit = ()
          }
      }
    }
  }
}
