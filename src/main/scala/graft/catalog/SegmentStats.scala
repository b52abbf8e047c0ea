package graft.catalog

import java.nio.charset.StandardCharsets
import java.util.Base64

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.functions.{col, count, datediff, lit, max, min, sum, unix_micros, when}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Segment-level zone maps for the graft catalog: per-segment min/max/null
  * statistics, computed once when a segment is committed and stored in the
  * `_graft_meta` file (`z.<segment>=` lines). Scans consult them at PLAN time
  * to drop whole segments whose ranges cannot satisfy the pushed predicates —
  * parquet footer min/max lifted one level up, so a selective query over a
  * `write.order-by`/cluster-by layout plans 1/N of the files without opening
  * any of them. This is the catalog half of the Iceberg/Delta data-skipping
  * recipe (manifest column bounds), re-derived on the graft meta layer.
  *
  * Supported columns: integral (byte/short/int/long), date, timestamp, and
  * ASCII-comparable strings. Everything else — and every predicate shape not
  * listed in [[mayMatch]] — conservatively keeps the segment. Pruning is
  * always an under-approximation: a kept segment only costs IO; a wrongly
  * dropped one would cost rows, so every conversion failure keeps.
  */
private[catalog] object SegmentStats {

  /** One column's zone entry. `min`/`max` are None when every row is null.
    * Domains by kind: 'i' integral → Long, 'd' date → epoch days Long,
    * 't' timestamp → micros Long, 's' string → String. */
  final case class Col(kind: Char, min: Option[String], max: Option[String], nulls: Long)

  final case class Stats(rows: Long, cols: Map[String, Col])

  private def kindOf(dt: DataType): Option[Char] = dt match {
    case ByteType | ShortType | IntegerType | LongType => Some('i')
    case DateType                                      => Some('d')
    case TimestampType                                 => Some('t')
    case StringType                                    => Some('s')
    case _                                             => None
  }

  /** One aggregate pass over the freshly written segment (at scale the same
    * numbers come free from the parquet footers the write just produced — the
    * documented seam; one extra columnar scan of the NEW segment keeps this
    * implementation honest and engine-only). */
  def compute(spark: SparkSession, segmentDir: String, schema: StructType): Stats = {
    val eligible = schema.fields.flatMap(f => kindOf(f.dataType).map(f.name -> _)).toSeq
    val df = spark.read.schema(schema).parquet(segmentDir)
    val aggs = count(lit(1)).as("__rows") +: eligible.flatMap { case (name, kind) =>
      val c = kind match {
        case 'i' | 's' => col(name)
        case 'd'       => datediff(col(name), lit("1970-01-01")).cast(LongType)
        case 't'       => unix_micros(col(name))
      }
      Seq(min(c).as(s"__min_$name"), max(c).as(s"__max_$name"),
        sum(when(col(name).isNull, 1L).otherwise(0L)).as(s"__nulls_$name"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val cols = eligible.map { case (name, kind) =>
      val mn = Option(row.getAs[Any](s"__min_$name")).map(_.toString)
      val mx = Option(row.getAs[Any](s"__max_$name")).map(_.toString)
      name -> Col(kind, mn, mx, row.getAs[Long](s"__nulls_$name"))
    }.toMap
    Stats(row.getAs[Long]("__rows"), cols)
  }

  private def b64(s: String): String =
    Base64.getEncoder.encodeToString(s.getBytes(StandardCharsets.UTF_8))
  private def unb64(s: String): String =
    new String(Base64.getDecoder.decode(s), StandardCharsets.UTF_8)

  /** `rows;name:kind:minB64:maxB64:nulls,...` — base64 keeps arbitrary string
    * bounds clear of the line format's delimiters. '-' marks all-null. */
  def encode(s: Stats): String = {
    val cols = s.cols.toSeq.sortBy(_._1).map { case (n, c) =>
      s"$n:${c.kind}:${c.min.map(b64).getOrElse("-")}:${c.max.map(b64).getOrElse("-")}:${c.nulls}"
    }
    s"${s.rows};${cols.mkString(",")}"
  }

  def decode(line: String): Stats = {
    val Array(rows, rest) = line.split(";", 2)
    val cols =
      if (rest.isEmpty) Map.empty[String, Col]
      else rest.split(',').map { rec =>
        val Array(n, k, mn, mx, nulls) = rec.split(':')
        n -> Col(k.head,
          if (mn == "-") None else Some(unb64(mn)),
          if (mx == "-") None else Some(unb64(mx)),
          nulls.toLong)
      }.toMap
    Stats(rows.toLong, cols)
  }

  // ---------------------------------------------------------------------------
  // Plan-time satisfiability of pushed catalyst predicates against a segment.
  // ---------------------------------------------------------------------------

  /** Literal internal value → the column kind's comparison domain. Catalyst
    * internals line up with the stored encodings: DateType literals are epoch
    * days, TimestampType literals are micros, integral literals widen to Long. */
  private def litValue(kind: Char, v: Any): Option[Any] = (kind, v) match {
    case (_, null)                   => None
    case ('i' | 'd' | 't', n: Byte)  => Some(n.toLong)
    case ('i' | 'd' | 't', n: Short) => Some(n.toLong)
    case ('i' | 'd' | 't', n: Int)   => Some(n.toLong)
    case ('i' | 'd' | 't', n: Long)  => Some(n)
    case ('s', u: UTF8String) =>
      val s = u.toString
      // UTF8String orders by UTF-8 bytes; java String by UTF-16 chars — they
      // agree only on ASCII, so non-ASCII bounds never prune
      if (s.forall(_ < 128)) Some(s) else None
    case _ => None
  }

  private def cmp(kind: Char, bound: String, v: Any): Int = kind match {
    case 's' => bound.compareTo(v.asInstanceOf[String])
    case _   => java.lang.Long.compare(bound.toLong, v.asInstanceOf[Long])
  }

  /** Could a row of this segment satisfy `e`? Unknown shapes/columns → true. */
  def mayMatch(stats: Stats, e: Expression): Boolean = {
    def colOf(ex: Expression): Option[(String, Col)] = ex match {
      case a: AttributeReference => stats.cols.get(a.name).map(a.name -> _)
      case _                     => None
    }
    def stringSafe(c: Col): Boolean =
      c.kind != 's' || (c.min.forall(_.forall(_ < 128)) && c.max.forall(_.forall(_ < 128)))
    def range(c: Col, v: Any)(keep: (Int, Int) => Boolean): Boolean =
      (c.min, c.max) match {
        case (Some(mn), Some(mx)) if stringSafe(c) => keep(cmp(c.kind, mn, v), cmp(c.kind, mx, v))
        case (None, None)                          => false // all-null column: no comparison matches
        case _                                     => true
      }
    def test(attr: Expression, lt: Literal)(keep: (Int, Int) => Boolean): Boolean =
      colOf(attr) match {
        case Some((_, c)) =>
          litValue(c.kind, lt.value) match {
            case Some(v) => range(c, v)(keep)
            case None    => true
          }
        case None => true
      }
    e match {
      case And(l, r) => mayMatch(stats, l) && mayMatch(stats, r)
      case Or(l, r)  => mayMatch(stats, l) || mayMatch(stats, r)
      case EqualTo(a, lt: Literal)            => test(a, lt)((mn, mx) => mn <= 0 && mx >= 0)
      case EqualTo(lt: Literal, a)            => test(a, lt)((mn, mx) => mn <= 0 && mx >= 0)
      case GreaterThan(a, lt: Literal)        => test(a, lt)((_, mx) => mx > 0)
      case GreaterThan(lt: Literal, a)        => test(a, lt)((mn, _) => mn < 0)
      case GreaterThanOrEqual(a, lt: Literal) => test(a, lt)((_, mx) => mx >= 0)
      case GreaterThanOrEqual(lt: Literal, a) => test(a, lt)((mn, _) => mn <= 0)
      case LessThan(a, lt: Literal)           => test(a, lt)((mn, _) => mn < 0)
      case LessThan(lt: Literal, a)           => test(a, lt)((_, mx) => mx > 0)
      case LessThanOrEqual(a, lt: Literal)    => test(a, lt)((mn, _) => mn <= 0)
      case LessThanOrEqual(lt: Literal, a)    => test(a, lt)((_, mx) => mx >= 0)
      case In(a, vs) if vs.forall(_.isInstanceOf[Literal]) =>
        vs.exists(v => mayMatch(stats, EqualTo(a, v.asInstanceOf[Literal])))
      case IsNull(a) =>
        colOf(a) match {
          case Some((_, c)) => c.nulls > 0
          case None         => true
        }
      case IsNotNull(a) =>
        colOf(a) match {
          case Some((_, c)) => stats.rows - c.nulls > 0
          case None         => true
        }
      case _ => true
    }
  }
}
