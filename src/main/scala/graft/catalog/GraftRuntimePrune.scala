package graft.catalog

import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, GreaterThanOrEqual, LessThanOrEqual, Literal}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, Literal => V2Literal}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.Scan
import org.apache.spark.sql.types._

/** RUNTIME (join-driven) SEGMENT PRUNING — dynamic partition pruning for the
  * graft segment layout, served through `SupportsRuntimeV2Filtering`:
  *
  * A selective dimension filter in a join only becomes a FACT-side predicate
  * at execution time (the classic star-schema DPP shape). Spark's
  * PartitionPruning rule plants a DynamicPruningSubquery on any scan that
  * reports prunable attributes; when the build side finishes (reusing its
  * broadcast where possible), BatchScanExec hands the resulting
  * `IN (v1..vk)` predicate to [[GraftStreamableScan.filter]], which lands
  * here: every still-planned segment re-checks its committed ZONE bounds and
  * opt-in BLOOM index against the runtime values, and the scan re-plans over
  * the survivors before a single fact row is read.
  *
  * ADVERTISEMENT IS SELECTIVE — this is load-bearing for performance, not
  * just politeness: Spark plants (and under AQE sometimes EXECUTES) a
  * subquery per advertised join key, so advertising a column whose segments
  * all span the full value range buys zero pruning and pays real planning
  * and probe cost (measured: +150% on an SCD2 pipeline when every column
  * advertised). A column is advertised iff its committed layout can
  * actually separate values:
  *
  *   - its per-segment zone ranges cover on average ≤ HALF the global range
  *     (identity-partition values are per-segment constants → coverage 0;
  *     z-order cells and time-correlated ingest are tight; a shuffled fact
  *     column covers ~everything → dropped), or
  *   - it carries an opt-in BLOOM index (point-lookup pruning works
  *     regardless of ranges), or
  *   - (r19) it is a STRING column whose every live segment carries
  *     exactness-flagged ASCII bounds and whose byte-wise ranges pass the
  *     same separation test — identity-partitioned and clustered string
  *     keys prune on equality probes without opting into blooms.
  *
  * Probe cost is bounded: ≤ 256 runtime values probe zone bounds per value
  * (≤ 64 also probe blooms); larger value sets collapse to ONE range check
  * per segment — still sound, just coarser.
  *
  * At 100 TB this is `orders ⋈ (dim WHERE selective)` reading only the fact
  * segments whose join-key layout admits the surviving keys — the pruning
  * no plan-time filter can do. The re-planned scan replays the build-time
  * state exactly (same pruned schema, same pushed filters) over fewer
  * segment dirs, so row content is untouched — runtime pruning can only
  * SKIP data the predicate proves dead. Storage-partitioned-join plans skip
  * runtime pruning (Spark requires a KeyGroupedPartitioning-reporting scan
  * to preserve its partitioning across filter()). Sound under delete
  * vectors: zone/bloom OVER-approximate live rows. */
private[catalog] final class GraftRuntimePrune(
    rebuild: Seq[String] => Scan,
    initialLive: Seq[(String, String)], // (segment name, absolute dir)
    zstats: Map[String, String],
    schema: StructType) extends Serializable {

  @volatile private var liveNow: Seq[(String, String)] = initialLive
  @volatile private var rebuilt: Option[Scan] = None

  /** The re-planned scan, present iff runtime predicates pruned anything. */
  def current: Option[Scan] = rebuilt
  def survivors: Int = liveNow.size

  private def longDomain(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType | TimestampType => true
    case _ => false
  }

  /** Columns whose committed layout can separate runtime values — see the
    * class doc. Decodes each live segment's stats once, lazily (only when
    * the planner actually consults filterAttributes).
    *
    * SIZE-GATED like AQE's thresholds: below `spark.graft.runtime.prune
    * .minRows` committed rows (default 1M) nothing is advertised — at toy
    * scale the planted subquery + scan re-plan tax exceeds any read it
    * could skip (measured: +30-80% on sf0.1 CDC pipelines), while at the
    * scales the skip matters the tax is noise. */
  lazy val prunableColumns: Array[NamedReference] = {
    def confLong(key: String, dflt: Long): Long =
      scala.util.Try(org.apache.spark.sql.SparkSession.active
        .conf.get(key).toLong).getOrElse(dflt)
    val minRows = confLong("spark.graft.runtime.prune.minRows", 1000000L)
    // the tax (planted subquery + probe + scan re-plan) is O(1) per join;
    // the win is O(segments skipped) — a handful of segments cannot repay
    // it even at large row counts (measured +24% on a 6M-row CDC pipeline
    // with ~8 segments), thousands of segments at 100 TB repay it richly
    val minSegments = confLong("spark.graft.runtime.prune.minSegments", 32L)
    val decoded = liveNow.flatMap { case (n, dir) =>
      zstats.get(n).flatMap(z => scala.util.Try(SegmentStats.decode(z)).toOption)
        .map(dir -> _)
    }
    if (decoded.isEmpty || liveNow.size < minSegments ||
        decoded.map(_._2.rows).sum < minRows) Array.empty
    else {
      val separated = schema.fields.filter(f => longDomain(f.dataType)).filter { f =>
        val entries = decoded.flatMap(_._2.cols.get(f.name))
        val ranges = entries.flatMap(e =>
          for {
            mn <- e.min.flatMap(v => scala.util.Try(v.toLong).toOption)
            mx <- e.max.flatMap(v => scala.util.Try(v.toLong).toOption)
          } yield (mn, mx))
        ranges.length >= 2 && {
          val span = math.max(1L, ranges.map(_._2).max - ranges.map(_._1).min).toDouble
          val avgCoverage = ranges.map(r => (r._2 - r._1).toDouble / span).sum / ranges.length
          avgCoverage <= 0.5
        }
      }.map(_.name)
      // r19: STRING columns advertise through their byte-wise zone bounds —
      // the SAME separation test, computed on a 56-bit big-endian prefix of
      // the UTF-8 bounds (prefix order embeds string order, so prefix
      // coverage measures how much of the global range each segment spans).
      // Gated on every live segment carrying EXACTNESS-FLAGGED, ASCII-safe
      // bounds (r17's strExact): truncated brackets stay SOUND for the probe
      // (mayMatch brackets conservatively), but foreign/legacy bounds are
      // exactly the layouts whose separation the flag can't vouch for — the
      // advertisement tax needs a layout the engine itself laid down.
      val stringSeparated = schema.fields.filter(_.dataType == StringType).filter { f =>
        val entries = decoded.flatMap(_._2.cols.get(f.name))
        entries.length >= 2 &&
          entries.forall(e => e.strExact &&
            e.min.forall(_.forall(_ < 128)) && e.max.forall(_.forall(_ < 128))) && {
            val ranges = entries.flatMap(e =>
              for { mn <- e.min; mx <- e.max }
                yield (SegmentStats.prefix56(mn), SegmentStats.prefix56(mx)))
            ranges.length >= 2 && {
              val span = math.max(1L, ranges.map(_._2).max - ranges.map(_._1).min).toDouble
              val avgCoverage =
                ranges.map(r => (r._2 - r._1).toDouble / span).sum / ranges.length
              avgCoverage <= 0.5
            }
          }
      }.map(_.name)
      val bloomed = schema.fieldNames.filter { f =>
        decoded.exists { case (dir, _) =>
          java.nio.file.Files.exists(GraftBloom.fileFor(dir, f))
        }
      }
      (separated ++ stringSeparated ++ bloomed).distinct.map(Expressions.column)
    }
  }

  /** One runtime predicate as (column, candidate values): Spark's
    * translateRuntimeFilterV2 emits `IN(field, lit...)` (and `=` for a
    * single-value build side). Anything else prunes nothing. */
  private def inShape(p: Predicate): Option[(String, Seq[V2Literal[_]])] = {
    val kids = p.children()
    p.name() match {
      case "IN" | "=" => kids.headOption match {
        case Some(f: NamedReference) if f.fieldNames().length == 1 &&
            kids.tail.forall(_.isInstanceOf[V2Literal[_]]) =>
          Some((f.fieldNames()(0), kids.tail.toSeq.map(_.asInstanceOf[V2Literal[_]])))
        case _ => None
      }
      case _ => None
    }
  }

  private val MaxExactValues = 256
  private val MaxBloomValues = 64

  /** Apply runtime predicates: a segment survives a predicate iff SOME value
    * passes BOTH its zone bounds and its bloom (absent stats keep it — prune
    * only on proof). Cumulative across calls; re-plans on any shrink. */
  def filter(predicates: Array[Predicate]): Unit = {
    // per predicate: the catalyst probes to test one segment with
    val conds: Seq[(String, Seq[org.apache.spark.sql.catalyst.expressions.Expression], Boolean)] =
      predicates.toSeq.flatMap(inShape).flatMap { case (colName, vals) =>
        schema.fields.find(_.name.equalsIgnoreCase(colName)).flatMap { f =>
          val attr = AttributeReference(f.name, f.dataType)()
          if (vals.isEmpty)
            // IN () — an empty build side matches nothing anywhere
            Some((f.name, Nil, false))
          else if (vals.length <= MaxExactValues)
            Some((f.name, vals.map(lv => EqualTo(attr, Literal(lv.value(), lv.dataType()))),
              vals.length <= MaxBloomValues))
          else if (longDomain(f.dataType)) {
            // large value set: one sound range check per segment
            val typed = vals.map(lv => Literal(lv.value(), lv.dataType()))
            val nums = typed.flatMap(l => l.value match {
              case n: java.lang.Number => Some((n.longValue(), l))
              case _ => None
            })
            if (nums.length != typed.length) None
            else Some((f.name, Seq(And(
              GreaterThanOrEqual(attr, nums.minBy(_._1)._2),
              LessThanOrEqual(attr, nums.maxBy(_._1)._2))), false))
          } else if (f.dataType == StringType) {
            // large STRING set (r19): collapse to the values' byte-wise
            // [min, max] — mayMatch brackets string zone bounds soundly
            // (non-ASCII bounds conservatively keep), so one range probe
            // per segment still prunes layouts that separate string keys
            val strs = vals.flatMap(lv => lv.value match {
              case u: org.apache.spark.unsafe.types.UTF8String => Some(u)
              case _ => None
            })
            if (strs.length != vals.length) None
            else {
              val ord = Ordering.fromLessThan[org.apache.spark.unsafe.types.UTF8String](
                (a, b) => a.compareTo(b) < 0)
              Some((f.name, Seq(And(
                GreaterThanOrEqual(attr, Literal(strs.min(ord), StringType)),
                LessThanOrEqual(attr, Literal(strs.max(ord), StringType)))), false))
            }
          } else None // huge non-orderable set: keep everything
        }
      }
    if (conds.isEmpty) return
    val surviving = liveNow.filter { case (name, dir) =>
      lazy val st = zstats.get(name)
        .flatMap(z => scala.util.Try(SegmentStats.decode(z)).toOption)
      conds.forall { case (_, probes, bloomToo) =>
        probes.exists(eq =>
          st.forall(SegmentStats.mayMatch(_, eq)) &&
            (!bloomToo || GraftBloom.mayContain(dir, eq)))
      }
    }
    if (surviving.size < liveNow.size) {
      liveNow = surviving
      rebuilt = Some(rebuild(surviving.map(_._2)))
    }
  }
}
