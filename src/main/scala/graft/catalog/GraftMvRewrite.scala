package graft.catalog

import scala.util.control.NonFatal

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.DoubleType

/** TRANSPARENT MATERIALIZED-VIEW REWRITE — the serving half of the MV
  * subsystem (GraftMaterializedView owns creation + incremental refresh):
  * an aggregate query over a graft table is answered FROM a registered MV
  * when the MV provably holds the same answer, without the query changing.
  *
  * A query
  * {{{ SELECT k..., COUNT(*), COUNT(c), SUM(c), AVG(c), MIN(m), MAX(x)
  *     FROM t [WHERE p(keys)] GROUP BY k... }}}
  * rewrites to an aggregate over the MV (`CALL create_mv(mv, t, keys, ...)`)
  * when ALL of:
  *
  *   - FRESH: the MV's refresh watermark (`graft.mv.version`) equals the
  *     snapshot the query's relation pinned at load — equal versions mean
  *     the MV is exactly `aggregate(t@version)` by the refresh contract, so
  *     the rewrite is an identity on results, not an approximation. A stale
  *     MV never serves (run `refresh_mv` first); there is no "allowed
  *     staleness" knob because a silently stale answer is a wrong answer.
  *   - COVERED: grouping columns ⊆ MV keys (grouping by a SUBSET re-rolls
  *     the MV: COUNT(*) → SUM(n_rows), SUM(c) → SUM(sum_c), MIN/MAX →
  *     MIN(min_c)/MAX(max_c), COUNT(c) → SUM(nn_c), AVG(c) →
  *     SUM(sum_c)/SUM(nn_c) — the rollup property of distributive
  *     aggregates plus the r18 non-null counts); every aggregate is one of
  *     those six over a registered column; any WHERE references KEY columns
  *     only (a key predicate commutes with GROUP BY, so it applies verbatim
  *     to the MV's key columns). DISTINCT aggregates, FILTER clauses,
  *     decimal AVG, and non-key predicates all refuse — unservable from
  *     these summaries.
  *   - CURRENT-STATE READ: no time travel, branch, or CDC options on the
  *     relation (those address snapshots other than the watermark).
  *
  * STAR SHAPE (r19): `SELECT d.attr, agg(fact.c)... FROM fact JOIN dim1 ON
  * fact.k1 = dim1.x [JOIN dim2 ...] GROUP BY ...` — the canonical dashboard
  * rollup, any number of dims (star or snowflake) — serves from a FACT-side
  * MV when additionally every join on the path to the fact is INNER, every
  * fact-side join column is an MV key, every fact-side grouping column is
  * an MV key (dim-side grouping columns pass through), and every aggregate
  * reads fact columns only. Soundness: rows of one MV group share the key tuple, hence
  * the join-key values, hence ONE join multiplicity m_g — joining the MV row
  * in their place scales the additive summaries (n_rows/sum_c/nn_c) by
  * exactly m_g, as the real join scales the raw rows; AVG's Σm·sum/Σm·nn
  * cancels it per group; MIN/MAX never see multiplicity (MV groups are
  * non-empty — refresh kills n_rows=0 groups). Dim-side aggregates refuse
  * (their values repeat per fact row; the summary cannot reproduce that),
  * as do outer joins (null-padded multiplicities) and non-equi conditions.
  *
  * COMPUTED KEYS (r20): grouping expressions and predicates that
  * structurally match a key declared as `<expr> AS <name>` at create_mv
  * (`month(o_orderdate) AS m` — the time-bucketed rollup) serve like plain
  * key columns, in BOTH the single-table and star shapes ("monthly revenue
  * by region"): the persisted expr is parsed + analyzed against the FACT
  * relation and compared semantically, which automatically refuses dim-side
  * look-alikes (different attributes never semanticEqual). The analyzer's
  * PullOutGroupingExpressions aliases are peeled and inlined for matching.
  *
  * At 100 TB this is the difference between a dashboard GROUP BY costing a
  * full fact-table scan and costing a scan of |groups| rows: create the MV
  * once, `refresh_mv` per ingest batch (O(changed rows)), and every matching
  * query — issued by users who do not know the MV exists — pays O(groups).
  *
  * Registration: `create_mv` records its MVs on the SOURCE table
  * (`graft.mvs`); the rule reads candidates from the scanned table's own
  * props, then back-checks each candidate's `graft.mv.source` resolves to
  * the same table directory (a CLONE copies props — the back-check keeps a
  * clone's queries off the original's MVs). `DROP TABLE mv` deregisters.
  * Off switch: `SET spark.graft.mv.rewrite=false` (the MV specs use it to
  * keep their MV-vs-direct-aggregate probes non-circular).
  *
  * Plan-time gate, snapshot-isolated execution: the rewritten plan scans the
  * MV's own pinned relation, so a source commit racing query execution
  * flips neither half — same read semantics as any graft scan. */
private[graft] final class GraftMvRewrite(session: SparkSession)
  extends Rule[LogicalPlan] {

  /** Local bail-out: any unservable shape aborts the candidate cleanly. */
  private final class Unservable extends RuntimeException(null, null, false, false)

  private def enabled: Boolean =
    session.conf.get("spark.graft.mv.rewrite", "true").toBoolean

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUpWithSubqueries {
      case agg: Aggregate => rewrite(agg).getOrElse(agg)
    }
  }

  /** Peel [Filter] / attribute-only [Project] layers down to a servable v2
    * relation, collecting predicates. */
  private def peel(plan: LogicalPlan, conds: Seq[Expression])
    : Option[(DataSourceV2Relation, GraftTable, Seq[Expression])] = plan match {
    case Filter(cond, child) => peel(child, conds :+ cond)
    case Project(list, child) if list.forall(_.isInstanceOf[AttributeReference]) =>
      peel(child, conds)
    case rel @ DataSourceV2Relation(t: GraftTable, _, Some(_: GraftCatalog), Some(_), opts, tt)
        if opts.isEmpty && tt.isEmpty && !t.pinned =>
      Some((rel, t, conds))
    case _ => None
  }

  /** The single-table peel (r20): additionally accepts Projects carrying
    * deterministic ALIASED expressions — the analyzer's
    * PullOutGroupingExpressions rewrites `GROUP BY month(d)` into an
    * Aggregate over `Project[..., month(d) AS _groupingexpression#n]`, so
    * computed-key matching must see through the pull-out. Returns the alias
    * substitution (alias exprId → its expression) for inlining; the rebuilt
    * plan drops these Projects entirely, which is safe HERE because every
    * surviving reference is rebound onto the MV or bails (the star path
    * keeps the strict attribute-only peel — its rebuilder must be able to
    * drop the peeled layers without orphaning join-condition references). */
  private def peelSub(plan: LogicalPlan, conds: Seq[Expression],
                      sub: Map[ExprId, Expression])
    : Option[(DataSourceV2Relation, GraftTable, Seq[Expression], Map[ExprId, Expression])] =
    plan match {
      case Filter(cond, child) => peelSub(child, conds :+ cond, sub)
      case Project(list, child) if list.forall {
          case _: AttributeReference => true
          case al: Alias             => al.child.deterministic
          case _                     => false
        } =>
        peelSub(child, conds,
          sub ++ list.collect { case al: Alias => al.exprId -> al.child })
      case rel @ DataSourceV2Relation(t: GraftTable, _, Some(_: GraftCatalog), Some(_), opts, tt)
          if opts.isEmpty && tt.isEmpty && !t.pinned =>
        Some((rel, t, conds, sub))
      case _ => None
    }

  /** Attribute-only Projects above a Join are transparent to the rewrite. */
  private def peelProjects(plan: LogicalPlan): LogicalPlan = plan match {
    case Project(list, child) if list.forall(_.isInstanceOf[AttributeReference]) =>
      peelProjects(child)
    case other => other
  }

  /** Projects directly under the Aggregate (the analyzer's pull-out layer
    * plus pruning) are peeled with their ALIAS substitutions collected, so
    * grouping attrs can be matched as the expressions they name. Safe to
    * drop at rebuild for the same reason as peelSub: every surviving
    * reference is rebound onto the MV / dim attrs or bails. */
  private def peelTopProjects(plan: LogicalPlan, sub: Map[ExprId, Expression])
    : (LogicalPlan, Map[ExprId, Expression]) = plan match {
    case Project(list, child) if list.forall {
        case _: AttributeReference => true
        case al: Alias             => al.child.deterministic
        case _                     => false
      } =>
      peelTopProjects(child, sub ++ list.collect { case al: Alias => al.exprId -> al.child })
    case other => (other, sub)
  }

  private def rewrite(agg: Aggregate): Option[Aggregate] = {
    // grouping expressions may be attributes OR deterministic scalar exprs
    // structurally matching a registered computed key (r20)
    if (agg.groupingExpressions.exists(!_.deterministic)) return None
    peelTopProjects(agg.child, Map.empty) match {
      // star shape (r19; r20 adds computed fact keys — "monthly revenue by
      // region"): Aggregate over a join tree around the fact
      case (j: Join, sub) =>
        rewriteStar(agg, j, agg.groupingExpressions, sub)
      case _ =>
        val (rel, table, conds, sub) =
          peelSub(agg.child, Nil, Map.empty).getOrElse(return None)
        if (conds.exists(!_.deterministic)) return None
        candidates(rel, table).iterator
          .flatMap(n => serveFrom(agg, table, rel, n, agg.groupingExpressions, conds,
            None, sub))
          .nextOption()
    }
  }

  /** MV names registered on the scanned table (empty = nothing to try). */
  private def candidates(rel: DataSourceV2Relation, table: GraftTable): Seq[String] =
    table.metaAtLoad.props.get(GraftMvRewrite.MvsProp).toSeq
      .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)

  /** The join-serving context: the fact-side join-key attributes (each must
    * be an MV key) and the assembler that rebuilds the whole join tree with
    * the fact subplan replaced by the (filtered) MV relation and every
    * fact-attr occurrence in join conditions rebound to its MV column. */
  private final case class StarShape(
      factJoinAttrs: Seq[AttributeReference],
      assemble: (LogicalPlan, String => Attribute) => LogicalPlan)

  /** `SELECT d.attr, fact_aggs... FROM fact JOIN dim1 ON fact.k1 = dim1.x
    * [JOIN dim2 ...] [WHERE p(fact keys)] GROUP BY keys` serves from a fact
    * MV whose keys cover the fact-side GROUPING columns AND every fact-side
    * JOIN column, across ANY tree of INNER joins around the fact: every row
    * of an MV group carries the same key tuple, hence the same join-key
    * values, hence the SAME dim-side multiplicity m_g (however many dims
    * there are, and whether they join the fact or each other) — so joining
    * the MV row instead of the group's rows scales each additive summary
    * (n_rows, sum_c, nn_c) by exactly m_g, which is what the original join
    * does to the raw rows. COUNT/SUM re-roll as usual; AVG = Σm·sum/Σm·nn
    * cancels the multiplicity per group; MIN/MAX ignore multiplicity (an MV
    * group is never empty — refresh kills n_rows=0 groups). Aggregates over
    * DIM columns refuse (their values repeat n_rows times in the original
    * join — the summary cannot reproduce that); dim columns may only group.
    * The joins on the PATH to the fact must be INNER with a condition
    * (outer joins produce null-padded rows whose multiplicity the MV cannot
    * see); join conditions touching a fact attribute must be plain
    * fact = dim equalities; dim-internal joins and dim-only conjuncts ride
    * through untouched. Two MV-bearing relations in one tree refuse
    * (ambiguous fact). */
  private def rewriteStar(agg: Aggregate, join: Join,
                          groupExprs: Seq[Expression],
                          sub: Map[ExprId, Expression]): Option[Aggregate] = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other     => Seq(other)
    }
    // locate the unique MV-bearing fact leaf along a chain of INNER joins
    // (attribute-only pruning Projects between joins are transparent);
    // returns it plus its peeled fact-side filters and the tree rebuilder
    def find(plan: LogicalPlan): Option[(DataSourceV2Relation, GraftTable,
        Seq[Expression], LogicalPlan => LogicalPlan)] = peelProjects(plan) match {
      case jn @ Join(l, r, Inner, Some(_), _) =>
        (find(l), find(r)) match {
          case (Some((rel, t, cs, rb)), None) =>
            Some((rel, t, cs, nf => jn.copy(left = rb(nf))))
          case (None, Some((rel, t, cs, rb))) =>
            Some((rel, t, cs, nf => jn.copy(right = rb(nf))))
          case _ => None // no fact here, or two MV-bearing relations
        }
      case other =>
        peel(other, Nil).filter { case (rel, t, _) => candidates(rel, t).nonEmpty }
          .map { case (rel, t, cs) => (rel, t, cs, (nf: LogicalPlan) => nf) }
    }
    val (rel, table, conds, rebuild) = find(join).getOrElse(return None)
    if (conds.exists(!_.deterministic)) return None
    val factSet = rel.outputSet
    // every join-condition conjunct touching a FACT attribute must be a
    // plain fact-attr = dim-attr equality; anything fact-free (dim-dim
    // equalities, dim-only residual predicates) rides through untouched
    var factJoinAttrs = List.empty[AttributeReference]
    val condsOk = join.collect { case jn: Join => jn }.forall { jn =>
      jn.condition.forall(c => conjuncts(c).forall {
        case EqualTo(a: AttributeReference, b: AttributeReference)
            if factSet.contains(a) && !factSet.contains(b) =>
          factJoinAttrs ::= a; true
        case EqualTo(a: AttributeReference, b: AttributeReference)
            if factSet.contains(b) && !factSet.contains(a) =>
          factJoinAttrs ::= b; true
        case other => other.references.forall(ref => !factSet.contains(ref))
      })
    }
    if (!condsOk || factJoinAttrs.isEmpty) return None
    // grouping expressions resolve from the join output once pulled-out
    // aliases are inlined: fact attrs / computed fact key exprs are checked
    // against MV keys inside serveFrom, dim attrs ride through
    def inl(e: Expression): Expression = e.transformUp {
      case a: AttributeReference if sub.contains(a.exprId) => inl(sub(a.exprId))
    }
    if (!groupExprs.forall(g => inl(g).references.subsetOf(join.outputSet))) return None
    val shape = StarShape(factJoinAttrs,
      (factChild, mvAttr) => rebuild(factChild).transformUp {
        case jn: Join => jn.copy(condition = jn.condition.map(_.transformUp {
          case a: AttributeReference if factSet.contains(a) => mvAttr(a.name)
        }))
      })
    candidates(rel, table).iterator
      .flatMap(n => serveFrom(agg, table, rel, n, groupExprs, conds, Some(shape), sub))
      .nextOption()
  }

  private def identOf(name: String): Option[Identifier] = {
    val parts = name.split('.').toSeq.filter(_.nonEmpty)
    if (parts.isEmpty) None
    else Some(Identifier.of(parts.init.toArray, parts.last))
  }

  private def serveFrom(agg: Aggregate, table: GraftTable, rel: DataSourceV2Relation,
                        mvName: String, groupExprs: Seq[Expression],
                        conds: Seq[Expression], star: Option[StarShape],
                        sub: Map[ExprId, Expression] = Map.empty)
    : Option[Aggregate] = try {
    def bail(): Nothing = throw new Unservable
    // inline pulled-out aliases (PullOutGroupingExpressions et al.) so the
    // grouping attribute `_groupingexpression#n` matches as `month(d#x)`
    def inline(e: Expression): Expression = e.transformUp {
      case a: AttributeReference if sub.contains(a.exprId) => inline(sub(a.exprId))
    }
    val catalog = rel.catalog.get.asInstanceOf[GraftCatalog]
    // join mode: which attributes belong to the FACT side (the MV's side)
    val factSet = star.map(_ => rel.outputSet)
    def isFact(a: AttributeReference): Boolean = factSet.forall(_.contains(a))
    val ident = identOf(mvName).getOrElse(bail())
    val mvTable = (try catalog.loadTable(ident)
      catch { case NonFatal(_) => bail() }) match {
      case g: GraftTable => g
      case _ => bail()
    }
    val mvMeta = mvTable.metaAtLoad

    // back-check: this MV was built over THIS table (clones copy props)
    val srcOk = mvMeta.props.get(GraftMv.SourceProp).flatMap(identOf).exists(si =>
      try catalog.tableDirFor(si) == table.dir catch { case NonFatal(_) => false })
    if (!srcOk) bail()

    // FRESHNESS: the MV holds aggregate(source @ watermark); the query's
    // relation reads the snapshot pinned at load — serve only on equality
    val fresh = mvMeta.props.get(GraftMv.VersionProp)
      .flatMap(v => scala.util.Try(v.toLong).toOption)
      .contains(table.currentSnapshot)
    if (!fresh) bail()

    val keys = GraftMv.keyCols(mvMeta).map(_.toLowerCase).toSet
    val sums = GraftMv.sumCols(mvMeta).map(_.toLowerCase).toSet
    val mins = GraftMv.minCols(mvMeta).map(_.toLowerCase).toSet
    val maxs = GraftMv.maxCols(mvMeta).map(_.toLowerCase).toSet

    // COMPUTED keys (r20): resolve each persisted key expr against THIS
    // query's FACT relation (parse → analyze a one-expression probe
    // Project), so it can be matched semantically against the query's own
    // grouping/predicate subtrees — in star mode too ("monthly revenue by
    // region": `fact ⋈ dim GROUP BY dim.name, month(fact.d)`), where the
    // fact-attr exprIds in the resolved form automatically refuse dim-side
    // expressions (different attributes never semanticEqual). TZ-dependent
    // exprs are pinned to the creation session timezone.
    val resolvedKeyExprs: Seq[(String, Expression)] =
      GraftMv.keyExprs(mvMeta) match {
        case Nil => Nil
        case specs =>
          if (!GraftMv.tzOk(mvMeta, session)) bail()
          specs.map { case (n, sqlText) =>
            val resolved = try {
              val parsed = session.sessionState.sqlParser.parseExpression(sqlText)
              session.sessionState.analyzer.execute(
                Project(Seq(Alias(parsed, n)()), rel)) match {
                case Project(Seq(al: Alias), _) => al.child
                case _ => bail()
              }
            } catch { case NonFatal(_) => bail() }
            n -> resolved
          }
      }
    def keyExprFor(e: Expression): Option[String] = {
      if (resolvedKeyExprs.isEmpty) return None
      val inlined = inline(e)
      resolvedKeyExprs.collectFirst { case (n, ke) if ke.semanticEquals(inlined) => n }
    }

    val mvRel = DataSourceV2Relation.create(mvTable, Some(catalog), Some(ident))
    def mvAttr(name: String): Attribute =
      mvRel.output.find(_.name.equalsIgnoreCase(name)).getOrElse(bail())
    def aggOf(fn: AggregateFunction): AggregateExpression =
      AggregateExpression(fn, Complete, isDistinct = false)

    // each grouping expression binds to its MV column: a fact-side key
    // attribute, a dim-side attribute (join mode, rides through), or a
    // structural match of a computed key expr; anything else refuses. An
    // attr carrying a pulled-out alias (sub) is the EXPRESSION it names —
    // its defining Project gets dropped at rebuild, so it must match a
    // computed key (never pass through as a dim attr).
    val groupBind: Seq[(Expression, Expression)] = groupExprs.map {
      case a: AttributeReference if !sub.contains(a.exprId) &&
          star.isDefined && !isFact(a) => (a: Expression, a: Expression)
      case a: AttributeReference if !sub.contains(a.exprId) &&
          isFact(a) && keys.contains(a.name.toLowerCase) =>
        (a: Expression, mvAttr(a.name): Expression)
      case e => keyExprFor(e) match {
        case Some(n) => (e, mvAttr(n): Expression)
        case None    => bail()
      }
    }
    // predicates rebind the same way: a subtree matching a computed key
    // becomes its MV column (`WHERE month(d) = 5` filters the key column);
    // plain attributes must be keys; any other reference is unservable
    def rebindCond(e: Expression): Expression = keyExprFor(e) match {
      case Some(n) => mvAttr(n)
      case None => e match {
        case a: AttributeReference =>
          // an attribute carrying a Project alias is the EXPRESSION it
          // names (its defining Project is dropped at rebuild) — a
          // name-based rebind is never valid for it: `month(d) AS region`
          // must not filter a real MV key column `region`. Resolve the
          // rename; serve only a plain key attribute.
          val s = if (!sub.contains(a.exprId)) a else inline(a) match {
            case sa: AttributeReference => sa
            case _                      => bail()
          }
          if (keys.contains(s.name.toLowerCase)) mvAttr(s.name) else bail()
        case other => other.withNewChildren(other.children.map(rebindCond))
      }
    }
    // join mode: every fact-side JOIN column must be an MV key — that is
    // what makes the per-group join multiplicity uniform
    star.foreach { s =>
      if (!s.factJoinAttrs.forall(f => keys.contains(f.name.toLowerCase))) bail()
    }

    // every grouping ATTRIBUTE (plain key, dim passthrough, or a pulled-out
    // `_groupingexpression` that matched a computed key) maps by exprId to
    // its bound form, so aggregate-list references rebind in one lookup
    val groupMap: Map[ExprId, Attribute] = groupBind.collect {
      case (a: AttributeReference, bound: Attribute) => a.exprId -> bound
    }.toMap

    // an aggregate argument may be a Project ALIAS (peelSub admits them for
    // computed-key matching) whose NAME shadows a real source column — e.g.
    // `other_col AS cents` under SUM(cents). Matching by name alone would
    // serve sum_cents for SUM(other_col): wrong results. Resolve through the
    // substitution first; serve only when the inlined form is itself a plain
    // source attribute (an identity rename), otherwise refuse the candidate.
    def srcAttr(c: AttributeReference): AttributeReference =
      if (!sub.contains(c.exprId)) c
      else inline(c) match {
        case a: AttributeReference => a
        case _                     => bail()
      }
    def rewriteFn(fn: AggregateFunction): Expression = fn match {
      case Count(Seq(Literal(v, _))) if v != null =>
        // COUNT(*)/COUNT(1): sum the per-group row counts; an EMPTY
        // global aggregate must still answer 0, not NULL
        Coalesce(Seq(aggOf(Sum(mvAttr("n_rows"))), Literal(0L)))
      case Count(Seq(c0: AttributeReference)) =>
        // COUNT(col) = non-null count: served from nn_<col> (r18 MVs;
        // a pre-r18 MV lacks the column and bails to the source)
        val c = srcAttr(c0)
        if (!(isFact(c) && sums.contains(c.name.toLowerCase))) bail()
        Coalesce(Seq(aggOf(Sum(mvAttr(s"nn_${c.name}"))), Literal(0L)))
      case Average(c0: AttributeReference, _) =>
        // AVG(col) = SUM(sum_c)/SUM(nn_c) — exactly SQL's null-skipping
        // average (n_rows cannot serve it); double-typed averages only
        // (integral/float sources — decimal AVG precision rules differ)
        val c = srcAttr(c0)
        if (!(isFact(c) && sums.contains(c.name.toLowerCase) &&
            fn.dataType == DoubleType)) bail()
        Divide(
          Cast(aggOf(Sum(mvAttr(s"sum_${c.name}"))), DoubleType,
            Some(conf.sessionLocalTimeZone)),
          Cast(aggOf(Sum(mvAttr(s"nn_${c.name}"))), DoubleType,
            Some(conf.sessionLocalTimeZone)))
      case Sum(c0: AttributeReference, mode) =>
        // keep the query's eval mode (ANSI/TRY overflow semantics);
        // re-summing widened MV sums may need a cast back down
        val c = srcAttr(c0)
        if (!(isFact(c) && sums.contains(c.name.toLowerCase))) bail()
        val re = aggOf(Sum(mvAttr(s"sum_${c.name}"), mode))
        if (re.dataType == fn.dataType) re
        else Cast(re, fn.dataType, Some(conf.sessionLocalTimeZone))
      case Min(c0: AttributeReference) =>
        val c = srcAttr(c0)
        if (!(isFact(c) && mins.contains(c.name.toLowerCase))) bail()
        aggOf(Min(mvAttr(s"min_${c.name}")))
      case Max(c0: AttributeReference) =>
        val c = srcAttr(c0)
        if (!(isFact(c) && maxs.contains(c.name.toLowerCase))) bail()
        aggOf(Max(mvAttr(s"max_${c.name}")))
      case _ => bail()
    }

    /** Projection expressions may wrap aggregates in scalar work —
      * `ROUND(AVG(x), 2)`, `CAST(SUM(x) AS BIGINT)`, `SUM(a)/COUNT(*)` —
      * rewrite every embedded servable aggregate and rebind grouping
      * attributes; anything else (a non-grouping raw column, a
      * non-deterministic call, an unservable aggregate) bails. */
    def rw(e: Expression): Expression = e match {
      case AggregateExpression(fn, Complete, false, None, _) => rewriteFn(fn)
      // any OTHER aggregate shape — FILTER clause, DISTINCT, partial modes,
      // or a bare AggregateFunction child — must refuse HERE: the generic
      // deterministic branch below would recurse into it and rebind its
      // children onto MV rows, silently answering a per-source-row
      // aggregate (e.g. COUNT(*) FILTER (WHERE k = 1)) with a per-GROUP
      // count. Unservable shapes bail the whole candidate.
      case _: AggregateExpression => bail()
      case _: AggregateFunction => bail()
      // a GROUPED computed-key expression projects as its MV column (must
      // match BEFORE the deterministic recursion tears it into raw source
      // attributes, which are not servable)
      case e2 if keyExprFor(e2).exists(n =>
        groupBind.exists(_._1.semanticEquals(e2))) => mvAttr(keyExprFor(e2).get)
      case a: AttributeReference => groupMap.getOrElse(a.exprId, bail())
      case l: Literal => l
      case other if other.deterministic =>
        other.withNewChildren(other.children.map(rw))
      case _ => bail()
    }

    val newAggExprs: Seq[NamedExpression] = agg.aggregateExpressions.map {
      case a: AttributeReference =>
        Alias(groupMap.getOrElse(a.exprId, bail()), a.name)(exprId = a.exprId)
      case al @ Alias(expr, name) => Alias(rw(expr), name)(exprId = al.exprId)
      case _ => bail()
    }

    // key predicates apply verbatim to the MV's key columns (same names);
    // rebind attribute references — and computed-key subtrees (r20) — onto
    // the MV relation's output (rebindCond bails on any non-key reference)
    val newConds = conds.map(rebindCond)
    val factChild =
      if (newConds.isEmpty) mvRel
      else Filter(newConds.reduce(And), mvRel)
    // join mode: the dim sides and every join node (types/hints/dim-only
    // conjuncts) are kept verbatim — only the fact subplan swaps for the
    // (filtered) MV, with fact attrs in join conditions rebound to MV cols
    val newChild: LogicalPlan = star match {
      case None    => factChild
      case Some(s) => s.assemble(factChild, mvAttr)
    }
    logInfo(s"graft: serving aggregate over ${table.name()} from materialized " +
      s"view $mvName (watermark = snapshot ${table.currentSnapshot}" +
      star.map(_ => ", re-rolled through the join").getOrElse("") + ")")
    Some(Aggregate(groupBind.map(_._2), newAggExprs, newChild))
  } catch { case _: Unservable => None }
}

private[catalog] object GraftMvRewrite {
  /** csv of MV table names registered on their SOURCE table's props. */
  val MvsProp = "graft.mvs"
}
