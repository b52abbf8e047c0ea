package graft.catalog

import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, Literal}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, Literal => V2Literal}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.Scan
import org.apache.spark.sql.types.StructType

/** RUNTIME (join-driven) SEGMENT PRUNING — dynamic partition pruning for the
  * graft segment layout, served through `SupportsRuntimeV2Filtering`:
  *
  * A selective dimension filter in a join only becomes a FACT-side predicate
  * at execution time (the classic star-schema DPP shape). Spark's
  * PartitionPruning rule plants a DynamicPruningSubquery on any scan that
  * reports prunable attributes; when the build side finishes (reusing its
  * broadcast — no extra job by default), BatchScanExec hands the resulting
  * `IN (v1..vk)` predicate to [[GraftStreamableScan.filter]], which lands
  * here: every still-planned segment re-checks its committed ZONE bounds and
  * opt-in BLOOM index against the runtime values, and the scan re-plans over
  * the survivors before a single fact row is read.
  *
  * At 100 TB this is the pruning a plan-time filter can never do: `orders ⋈
  * (SELECT .. FROM nation WHERE n_name = 'KENYA')` reads only the fact
  * segments whose join-key range/bloom admits the dim's surviving keys —
  * zone maps make it effective on clustered/z-ordered keys, blooms on
  * point-lookup keys, and identity-partition columns fall out for free
  * (their zone entry is the constant partition value).
  *
  * The re-planned scan replays the build-time state exactly (same pruned
  * schema, same pushed filters) over fewer segment dirs, so row content is
  * untouched — runtime pruning can only SKIP data the predicate proves
  * dead. Storage-partitioned-join plans skip runtime pruning (Spark requires
  * a KeyGroupedPartitioning-reporting scan to preserve its partitioning
  * across filter(); dropping key groups would break the zero-exchange
  * contract loudly). */
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

  /** Columns worth advertising for runtime filtering: top-level fields with
    * a committed zone entry (one decoded segment is representative — the
    * harvest covers every leaf column it can) — i.e. nearly every scalar
    * column. Over-advertising is safe: Spark's DPP heuristics pick
    * beneficial keys, and an unprunable predicate just keeps all segments. */
  lazy val prunableColumns: Array[NamedReference] = {
    val statCols = liveNow.iterator
      .flatMap { case (n, _) => zstats.get(n) }
      .flatMap(z => scala.util.Try(SegmentStats.decode(z)).toOption)
      .take(1)
      .flatMap(_.cols.keysIterator)
      .filter(!_.contains('.'))
      .toSeq
    schema.fieldNames.filter(f => statCols.exists(_.equalsIgnoreCase(f)))
      .map(Expressions.column)
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

  /** Apply runtime predicates: a segment survives a predicate iff SOME value
    * passes BOTH its zone bounds and its bloom (absent stats keep it — prune
    * only on proof). Cumulative across calls; re-plans on any shrink. */
  def filter(predicates: Array[Predicate]): Unit = {
    val conds = predicates.toSeq.flatMap(inShape).flatMap { case (colName, vals) =>
      schema.fields.find(_.name.equalsIgnoreCase(colName)).map { f =>
        val attr = AttributeReference(f.name, f.dataType)()
        vals.map(lv => EqualTo(attr, Literal(lv.value(), lv.dataType())))
      }
    }
    if (conds.isEmpty) return
    val surviving = liveNow.filter { case (name, dir) =>
      lazy val st = zstats.get(name)
        .flatMap(z => scala.util.Try(SegmentStats.decode(z)).toOption)
      conds.forall(eqs => eqs.exists(eq =>
        st.forall(SegmentStats.mayMatch(_, eq)) && GraftBloom.mayContain(dir, eq)))
    }
    if (surviving.size < liveNow.size) {
      liveNow = surviving
      rebuilt = Some(rebuild(surviving.map(_._2)))
    }
  }
}
