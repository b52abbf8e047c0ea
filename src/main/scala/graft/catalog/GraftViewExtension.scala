package graft.catalog

import scala.collection.JavaConverters._
import scala.util.control.NonFatal

import org.apache.spark.sql.{AnalysisException, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{NoSuchViewException, UnresolvedAttribute, UnresolvedIdentifier, UnresolvedRelation, UnresolvedTableOrView, UnresolvedView}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.parser.{ParseException, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, ViewCatalog, ViewInfo}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.Row

/** Wires persisted SQL views (GraftViews / the catalog's ViewCatalog SPI) into
  * Spark SQL. Spark 4.1's analyzer only routes view DDL and view reads through
  * the SESSION catalog — `ResolveSessionCatalog` throws
  * `UNSUPPORTED_FEATURE.CATALOG_OPERATION` for `CREATE VIEW cat.ns.v` on a v2
  * catalog, and relation resolution never consults `ViewCatalog.loadView` — so
  * the SPI alone is unreachable from SQL. This extension closes the gap for
  * graft catalogs, in two parts:
  *
  *  1. a parser interceptor ([[GraftViewParser]]) that rewrites the view-DDL
  *     plan shapes (`CreateView`/`DropView`/`SetViewProperties`/
  *     `UnsetViewProperties`/`AlterViewAs`/`RenameTable(isView)`/`ShowViews`)
  *     into [[LeafRunnableCommand]]s calling the catalog's ViewCatalog API —
  *     but ONLY when the target identifier addresses a [[GraftCatalog]];
  *     everything else (incl. session-catalog views and temp views) passes
  *     through to the delegate parser's plan untouched.
  *  2. a resolution rule ([[GraftViewSubstitution]]) that substitutes a stored
  *     view's re-parsed SQL text for `UnresolvedRelation`s naming a graft
  *     view. The text re-analyzes on every read (standard SQL view contract:
  *     underlying data AND definition changes flow through; broken
  *     dependencies fail the READ). Unqualified table names inside the body
  *     are qualified with the creation-time catalog/namespace context the
  *     catalog persisted; nested graft-view references expand recursively
  *     with cycle detection.
  *
  * Registered by [[graft.plans.GraftSparkExtensions]] (parser injection only
  * works at session build — there is no runtime hook for parsers).
  */
object GraftViewExtension {

  def install(ext: SparkSessionExtensions): Unit = {
    ext.injectParser((session, delegate) => new GraftViewParser(session, delegate))
    ext.injectResolutionRule(session => new GraftViewSubstitution(session))
  }

  /** The catalog named `name` iff it is registered and a GraftCatalog.
    * Registration is checked via the catalog manager (instantiates on first
    * touch); unregistered names and non-graft catalogs return None. */
  private[catalog] def graftCatalog(session: SparkSession, name: String): Option[GraftCatalog] =
    try {
      classic(session).sessionState.catalogManager.catalog(name) match {
        case g: GraftCatalog => Some(g)
        case _ => None
      }
    } catch { case NonFatal(_) => None }

  /** Resolve a (possibly partial) multipart name against the current
    * catalog/namespace to a graft catalog + identifier, or None if the name
    * does not address a graft catalog. */
  private[catalog] def resolveGraft(
      session: SparkSession, parts: Seq[String]): Option[(String, GraftCatalog, Identifier)] = {
    val cm = classic(session).sessionState.catalogManager
    parts match {
      case head +: rest if rest.nonEmpty =>
        graftCatalog(session, head) match {
          case Some(g) => Some((head, g, Identifier.of(rest.init.toArray, rest.last)))
          case None => currentIfGraft(session, parts)
        }
      case _ => currentIfGraft(session, parts)
    }
  }

  /** Short (catalog-less) names resolve against the CURRENT catalog iff it is
    * a graft catalog; 1-part names pick up the current namespace. */
  private def currentIfGraft(
      session: SparkSession, parts: Seq[String]): Option[(String, GraftCatalog, Identifier)] = {
    val cm = classic(session).sessionState.catalogManager
    cm.currentCatalog match {
      case g: GraftCatalog =>
        val ident =
          if (parts.length == 1) Identifier.of(cm.currentNamespace, parts.head)
          else Identifier.of(parts.init.toArray, parts.last)
        Some((g.name(), g, ident))
      case _ => None
    }
  }

  private[catalog] def classic(session: SparkSession): org.apache.spark.sql.classic.SparkSession =
    session.asInstanceOf[org.apache.spark.sql.classic.SparkSession]

  private[catalog] def fqName(catalogName: String, ident: Identifier): String =
    (catalogName +: ident.namespace().toSeq :+ ident.name()).mkString(".")

  /** SHOW ... LIKE pattern semantics (Spark's `StringUtils.filterPattern`):
    * '|'-separated alternatives, '*' matches any sequence, and everything
    * else is a LITERAL — regex metacharacters in the pattern ('fn_+', 'a(b')
    * are quoted, not compiled, so they match themselves instead of throwing
    * PatternSyntaxException. Case-insensitive throughout. */
  private[catalog] def likeMatcher(pattern: String): String => Boolean = {
    val alternatives = pattern.trim.split("\\|").toSeq.map { alt =>
      val quoted = alt.split("\\*", -1).map(seg =>
        if (seg.isEmpty) "" else java.util.regex.Pattern.quote(seg)).mkString(".*")
      java.util.regex.Pattern.compile(quoted, java.util.regex.Pattern.CASE_INSENSITIVE)
    }
    name => alternatives.exists(_.matcher(name).matches())
  }
}

// ---------------------------------------------------------------------------
// Read path: substitute stored view text for graft-view relations.
// ---------------------------------------------------------------------------

/** Resolution rule: `UnresolvedRelation` naming a graft view → the stored SQL
  * text, re-parsed, context-qualified, and recursively expanded (cycle-safe).
  * Runs in the analyzer's fixed-point Resolution batch; built-in rules ignore
  * the relation (the table load fails), so it survives to this rule. INSERT
  * targets are exempt — writing into a view fails analysis loudly instead of
  * silently writing the underlying table. */
class GraftViewSubstitution(session: SparkSession) extends Rule[LogicalPlan] {
  import GraftViewExtension._

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // Never substitute a DML target: INSERT INTO <view> must fail, not reroute.
    val writeTargets = plan.collect {
      case i: InsertIntoStatement => i.table
    }.collect { case u: UnresolvedRelation => u }.toSet

    plan.resolveOperatorsUp {
      case u: UnresolvedRelation if !u.isStreaming && !writeTargets.contains(u) =>
        resolveGraft(session, u.multipartIdentifier) match {
          case Some((cat, g, ident)) if viewExists(g, ident) =>
            expand(cat, g, ident, Set.empty)
          case _ => u
        }
    }
  }

  private def viewExists(g: GraftCatalog, ident: Identifier): Boolean =
    try { g.loadView(ident); true } catch { case _: NoSuchViewException => false }

  /** Parse the stored text, qualify its free table names with the stored
    * creation context, expand nested graft views (depth-first, `seen` guards
    * cycles), and re-shape to the stored column names/aliases. */
  private def expand(
      catalogName: String, g: GraftCatalog, ident: Identifier,
      seen: Set[String]): LogicalPlan = {
    val fq = fqName(catalogName, ident)
    if (seen.contains(fq)) {
      throw new AnalysisException("RECURSIVE_VIEW",
        Map("viewIdent" -> fq, "newPath" -> (seen + fq).mkString(" -> ")),
        Option.empty[Throwable])
    }
    val d = GraftViews.read(g.tableDirFor(ident))
    val parsed = classic(session).sessionState.sqlParser.parsePlan(d.sql)

    // CTE names bound inside the view body must not be qualified as tables.
    val cteNames = parsed.collect {
      case w: UnresolvedWith => w.cteRelations.map(_._1.toLowerCase(java.util.Locale.ROOT))
    }.flatten.toSet

    val qualified = parsed.transformUp {
      case u: UnresolvedRelation if !u.isStreaming =>
        val parts = u.multipartIdentifier
        val full: Seq[String] =
          if (parts.length == 1 && cteNames.contains(parts.head.toLowerCase(java.util.Locale.ROOT))) parts
          else if (parts.length == 1) d.currentCatalog +: d.currentNamespace :+ parts.head
          else if (graftCatalog(session, parts.head).isDefined ||
                   parts.head.equalsIgnoreCase(d.currentCatalog) ||
                   isRegisteredCatalog(parts.head)) parts
          else d.currentCatalog +: parts
        if (full == parts) u else u.copy(multipartIdentifier = full)
    }

    // Expand nested graft views NOW (the fixed point would also get there,
    // but eager expansion gives the cycle check a complete ancestor chain).
    val expanded = qualified.transformUp {
      case u: UnresolvedRelation if !u.isStreaming =>
        resolveGraft(session, u.multipartIdentifier) match {
          case Some((c2, g2, i2)) if viewExists(g2, i2) => expand(c2, g2, i2, seen + fq)
          case _ => u
        }
    }

    // Re-shape to the captured output: project the query's column names, then
    // apply user aliases if the view declared them.
    val projected: LogicalPlan =
      if (d.queryColumnNames.isEmpty) expanded
      else {
        val cols: Seq[NamedExpression] =
          if (d.columnAliases.nonEmpty) {
            require(d.columnAliases.length == d.queryColumnNames.length,
              s"view $fq: ${d.columnAliases.length} aliases for ${d.queryColumnNames.length} columns")
            d.queryColumnNames.zip(d.columnAliases).map { case (q, a) =>
              Alias(UnresolvedAttribute.quoted(q), a)()
            }
          } else d.queryColumnNames.map(UnresolvedAttribute.quoted)
        Project(cols, expanded)
      }
    SubqueryAlias(ident.name(), projected)
  }

  private def isRegisteredCatalog(name: String): Boolean =
    try { classic(session).sessionState.catalogManager.catalog(name); true }
    catch { case NonFatal(_) => false }
}

// ---------------------------------------------------------------------------
// DDL path: parser interceptor + commands.
// ---------------------------------------------------------------------------

/** Delegating parser that reroutes view DDL addressed at a graft catalog into
  * the commands below. Pure plan-shape rewriting on the delegate's output — a
  * top-level match per statement, no tokenizing of our own. */
class GraftViewParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {
  import GraftViewExtension._

  override def parsePlan(sqlText: String): LogicalPlan = rewrite(delegate.parsePlan(sqlText))

  /** Inline persisted graft FUNCTION calls at PARSE time (GraftFunctions):
    * the analyzer's LookupFunctions sanity check runs before any injected
    * resolution rule could substitute, so substitution must happen here.
    * Subquery plans are visited too (scalar/IN subqueries carry their own
    * trees). Builtins and session functions win one-part names inside
    * maybeInline, so non-graft calls pass through untouched.
    *
    * FAST PATH: the walk runs on EVERY parsed statement, so when no graft
    * function exists anywhere (GraftFunctions.anyPersisted — a map lookup)
    * the statement passes through untouched. Multi-part call names get a
    * read-only pre-scan instead of trusting the gate: a qualified call can
    * name a catalog this session has not instantiated yet (so its root was
    * never registered), and the full walk's resolveGraft is what
    * instantiates it — correctness over the gate for exactly those names. */
  private def inlineCalls(plan: LogicalPlan): LogicalPlan =
    if (!GraftFunctions.anyPersisted && !hasMultipartCall(plan)) plan
    else plan.transformUpWithSubqueries {
      // RETURNS TABLE calls (`FROM fn(args)`, r17): the args may themselves
      // call scalar graft functions — inline those first, then the table
      // function itself expands to its stored body as a lateral subquery
      case tvf: org.apache.spark.sql.catalyst.analysis.UnresolvedTableValuedFunction =>
        val argsInlined = tvf.transformExpressionsUp {
          case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction =>
            GraftFunctions.maybeInline(session, f).getOrElse(f)
        }.asInstanceOf[org.apache.spark.sql.catalyst.analysis.UnresolvedTableValuedFunction]
        GraftFunctions.maybeInlineTable(session, argsInlined).getOrElse(argsInlined)
      case p => p.transformExpressionsUp {
        case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction =>
          GraftFunctions.maybeInline(session, f).getOrElse(f)
      }
    }

  /** Read-only scan (no tree rebuilding): does any expression — including
    * inside subquery plans — call a MULTI-PART function name (scalar or
    * table-valued)? One-part names can only be graft functions via the
    * current catalog, whose root is registered by the time it is current,
    * so the gate covers them. */
  private def hasMultipartCall(plan: LogicalPlan): Boolean =
    plan.exists {
      case t: org.apache.spark.sql.catalyst.analysis.UnresolvedTableValuedFunction =>
        t.name.length > 1
      case node => node.expressions.exists(_.exists {
        case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction =>
          f.nameParts.length > 1
        case s: org.apache.spark.sql.catalyst.expressions.SubqueryExpression =>
          hasMultipartCall(s.plan)
        case _ => false
      })
    }

  // MUST delegate (not inherit the interface default): `spark.sql(text, args)`
  // routes through here, and the default implementation loses the delegate's
  // parameter-binding override — leaving posparameter()s unbound at analysis
  override def parsePlanWithParameters(
      sqlText: String,
      parameterContext: org.apache.spark.sql.catalyst.parser.ParameterContext): LogicalPlan =
    rewrite(delegate.parsePlanWithParameters(sqlText, parameterContext))

  private def rewrite(plan: LogicalPlan): LogicalPlan = plan match {
    case c: CreateView =>
      c.child match {
        case UnresolvedIdentifier(parts, _) =>
          resolveGraft(session, parts) match {
            case Some((cat, _, ident)) =>
              CreateGraftViewCommand(cat, ident,
                c.userSpecifiedColumns, c.comment, c.properties,
                c.originalText.getOrElse(""), inlineCalls(c.query),
                c.allowExisting, c.replace)
            case None => c
          }
        case _ => c
      }
    case dv: DropView =>
      dv.child match {
        case UnresolvedIdentifier(parts, _) =>
          resolveGraft(session, parts) match {
            case Some((cat, _, ident)) => DropGraftViewCommand(cat, ident, dv.ifExists)
            case None => dv
          }
        case _ => dv
      }
    case s: SetViewProperties =>
      graftViewChild(s.child).map { case (cat, ident) =>
        AlterGraftViewPropsCommand(cat, ident, set = s.properties, unset = Nil, unsetIfExists = true)
      }.getOrElse(s)
    case s: UnsetViewProperties =>
      graftViewChild(s.child).map { case (cat, ident) =>
        AlterGraftViewPropsCommand(cat, ident, set = Map.empty, unset = s.propertyKeys,
          unsetIfExists = s.ifExists)
      }.getOrElse(s)
    case a: AlterViewAs =>
      graftViewChild(a.child).map { case (cat, ident) =>
        AlterGraftViewAsCommand(cat, ident, a.originalText, inlineCalls(a.query))
      }.getOrElse(a)
    case r: RenameTable if r.isView =>
      graftViewChild(r.child).map { case (cat, ident) =>
        RenameGraftViewCommand(cat, ident, r.newName)
      }.getOrElse(r)
    case sv: ShowViews =>
      sv.namespace match {
        case ns: org.apache.spark.sql.catalyst.analysis.UnresolvedNamespace
            if ns.multipartIdentifier.nonEmpty &&
               graftCatalog(session, ns.multipartIdentifier.head).isDefined =>
          ShowGraftViewsCommand(ns.multipartIdentifier.head,
            ns.multipartIdentifier.tail, sv.pattern, sv.output)
        case _ => sv
      }
    // persisted SQL FUNCTIONS (GraftFunctions): CREATE FUNCTION ... RETURN
    // on a graft identifier — the analyzer's ResolveSessionCatalog would
    // refuse the v2 catalog exactly like view DDL
    case c: CreateUserDefinedFunction =>
      c.child match {
        case UnresolvedIdentifier(parts, _) =>
          resolveGraft(session, parts) match {
            case Some((cat, _, ident)) if c.isTableFunc =>
              // RETURNS TABLE (r17): the body is a QUERY, persisted and
              // inlined at call sites as a lateral subquery (GraftFunctions)
              require(c.queryText.isDefined && c.exprText.isEmpty,
                "graft catalog: CREATE FUNCTION ... RETURNS TABLE requires " +
                  "a query body (RETURN SELECT ...)")
              CreateGraftTableFunctionCommand(cat, ident,
                c.inputParamText, c.returnTypeText, c.queryText.get,
                c.isDeterministic.getOrElse(true), c.comment,
                c.ignoreIfExists, c.replace)
            case Some((cat, _, ident)) =>
              require(c.exprText.isDefined && c.queryText.isEmpty,
                "graft catalog: CREATE FUNCTION requires a scalar RETURN expression")
              CreateGraftFunctionCommand(cat, ident,
                c.inputParamText, c.returnTypeText, c.exprText.get,
                c.isDeterministic.getOrElse(true), c.comment,
                c.ignoreIfExists, c.replace)
            case None => c
          }
        case _ => c
      }
    case d: DropFunction =>
      d.child match {
        case fn: org.apache.spark.sql.catalyst.analysis.UnresolvedFunctionName =>
          resolveGraft(session, fn.multipartIdentifier) match {
            case Some((cat, g, ident)) if GraftFunctions.exists(g.tableDirFor(ident)) ||
                fn.multipartIdentifier.length > 1 =>
              DropGraftFunctionCommand(cat, ident, d.ifExists)
            case _ => d
          }
        case _ => d
      }
    // SHOW/DESCRIBE FUNCTION on graft identifiers: Spark 4.1's v1-era
    // resolution refuses v2 function catalogs outright, so both ride here
    case sf: ShowFunctions =>
      sf.namespace match {
        case ns: org.apache.spark.sql.catalyst.analysis.UnresolvedNamespace
            if ns.multipartIdentifier.nonEmpty &&
               graftCatalog(session, ns.multipartIdentifier.head).isDefined =>
          ShowGraftFunctionsCommand(ns.multipartIdentifier.head,
            ns.multipartIdentifier.tail, sf.pattern, sf.output)
        case _ => sf
      }
    case df: DescribeFunction =>
      df.child match {
        case fn: org.apache.spark.sql.catalyst.analysis.UnresolvedFunctionName =>
          resolveGraft(session, fn.multipartIdentifier) match {
            case Some((cat, g, ident)) if GraftFunctions.exists(g.tableDirFor(ident)) =>
              DescribeGraftFunctionCommand(cat, ident)
            case _ => df
          }
        case _ => df
      }
    case other => inlineCalls(other)
  }

  /** ALTER/RENAME child shapes (`UnresolvedView` / `UnresolvedTableOrView`)
    * carry the raw multipart name; route iff it addresses a graft catalog. */
  private def graftViewChild(child: LogicalPlan): Option[(String, Identifier)] = {
    val parts = child match {
      case v: UnresolvedView => Some(v.multipartIdentifier)
      case tv: UnresolvedTableOrView => Some(tv.multipartIdentifier)
      case _ => None
    }
    parts.flatMap(p => resolveGraft(session, p).map { case (cat, _, ident) => (cat, ident) })
  }

  /** The delegate's raw parse, for callers that must keep the interceptor
    * out of a re-entrant parse (table-function body expansion threads its
    * OWN cycle-tracking seen set through the inline walk). */
  private[catalog] def delegateParsePlan(sqlText: String): LogicalPlan =
    delegate.parsePlan(sqlText)

  // -- pure delegation below --
  override def parseExpression(sqlText: String): Expression = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan = delegate.parseQuery(sqlText)
  override def parseTableSchema(sqlText: String): StructType = delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType = delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType = delegate.parseRoutineParam(sqlText)
}

/** CREATE [OR REPLACE] VIEW cat.ns.v [(col [COMMENT c], ...)] AS <query>.
  * Analyzes the query at CREATE time to capture the output schema and column
  * names (the ViewCatalog contract), then persists via the catalog. */
case class CreateGraftViewCommand(
    catalogName: String, ident: Identifier,
    userSpecifiedColumns: Seq[(String, Option[String])],
    comment: Option[String], properties: Map[String, String],
    originalText: String, query: LogicalPlan,
    allowExisting: Boolean, replace: Boolean) extends LeafRunnableCommand {
  import GraftViewExtension._

  override def innerChildren: Seq[LogicalPlan] = Seq(query)

  override def run(sparkSession: SparkSession): Seq[Row] = {
    val cs = classic(sparkSession)
    val g = graftCatalog(sparkSession, catalogName).getOrElse(
      throw new IllegalStateException(s"catalog '$catalogName' is no longer a graft catalog"))
    require(originalText.nonEmpty, "CREATE VIEW requires the original query text")

    val analyzed = cs.sessionState.executePlan(query).analyzed
    val queryNames = analyzed.output.map(_.name)
    if (userSpecifiedColumns.nonEmpty && userSpecifiedColumns.length != queryNames.length) {
      val sub = if (userSpecifiedColumns.length > queryNames.length)
        "NOT_ENOUGH_DATA_COLUMNS" else "TOO_MANY_DATA_COLUMNS"
      throw new AnalysisException(s"CREATE_VIEW_COLUMN_ARITY_MISMATCH.$sub",
        Map("viewName" -> fqName(catalogName, ident),
          "viewColumns" -> userSpecifiedColumns.map(_._1).mkString(", "),
          "dataColumns" -> queryNames.mkString(", ")),
        Option.empty[Throwable])
    }
    val aliases = userSpecifiedColumns.map(_._1)
    val colComments = userSpecifiedColumns.map(_._2.getOrElse(""))
    val schema: StructType =
      if (aliases.isEmpty) analyzed.schema
      else StructType(analyzed.schema.zip(aliases).map { case (f, a) => f.copy(name = a) })

    val cm = cs.sessionState.catalogManager
    val props = properties ++ comment.map(ViewCatalog.PROP_COMMENT -> _)
    val info = new ViewInfo(ident, originalText,
      cm.currentCatalog.name(), cm.currentNamespace,
      schema, queryNames.toArray, aliases.toArray, colComments.toArray, props.asJava)

    val exists = try { g.loadView(ident); true } catch { case _: NoSuchViewException => false }
    if (exists && allowExisting) return Nil
    if (exists && replace) { g.dropView(ident); g.createView(info) }
    else g.createView(info) // throws ViewAlreadyExists / TableAlreadyExists on collision
    Nil
  }
}

/** DROP VIEW [IF EXISTS] — errors on a missing view unless IF EXISTS, and on
  * a name owned by a TABLE (wrong command for the object type). */
case class DropGraftViewCommand(
    catalogName: String, ident: Identifier, ifExists: Boolean) extends LeafRunnableCommand {
  import GraftViewExtension._
  override def run(sparkSession: SparkSession): Seq[Row] = {
    val g = graftCatalog(sparkSession, catalogName).get
    if (!g.dropView(ident) && !ifExists) {
      if (g.tableExists(ident)) {
        throw new AnalysisException("WRONG_COMMAND_FOR_OBJECT_TYPE",
          Map("operation" -> "DROP VIEW", "requiredType" -> "VIEW", "foundType" -> "TABLE",
            "objectName" -> fqName(catalogName, ident), "alternative" -> "DROP TABLE"),
          Option.empty[Throwable])
      }
      throw new NoSuchViewException(ident)
    }
    Nil
  }
}

/** ALTER VIEW ... SET/UNSET TBLPROPERTIES via ViewCatalog.alterView. UNSET of
  * an absent key is tolerated (the v2 RemoveProperty contract — a no-op). */
case class AlterGraftViewPropsCommand(
    catalogName: String, ident: Identifier,
    set: Map[String, String], unset: Seq[String],
    unsetIfExists: Boolean) extends LeafRunnableCommand {
  import GraftViewExtension._
  import org.apache.spark.sql.connector.catalog.ViewChange
  override def run(sparkSession: SparkSession): Seq[Row] = {
    val g = graftCatalog(sparkSession, catalogName).get
    g.loadView(ident) // throws NoSuchViewException
    val changes: Seq[ViewChange] =
      set.toSeq.map { case (k, v) => ViewChange.setProperty(k, v) } ++
        unset.map(ViewChange.removeProperty)
    g.alterView(ident, changes: _*)
    Nil
  }
}

/** ALTER VIEW ... AS <query>: swap the definition text, recapturing the
  * analyzed schema/column names (aliases do not survive redefinition — the
  * session-catalog behavior). */
case class AlterGraftViewAsCommand(
    catalogName: String, ident: Identifier,
    originalText: String, query: LogicalPlan) extends LeafRunnableCommand {
  import GraftViewExtension._
  override def innerChildren: Seq[LogicalPlan] = Seq(query)
  override def run(sparkSession: SparkSession): Seq[Row] = {
    val cs = classic(sparkSession)
    val g = graftCatalog(sparkSession, catalogName).get
    g.loadView(ident) // throws NoSuchViewException
    val analyzed = cs.sessionState.executePlan(query).analyzed
    val cm = cs.sessionState.catalogManager
    val dir = g.tableDirFor(ident)
    dir.toString.intern().synchronized {
      val d0 = GraftViews.read(dir)
      GraftViews.overwrite(dir, d0.copy(
        sql = originalText,
        currentCatalog = cm.currentCatalog.name(),
        currentNamespace = cm.currentNamespace.toSeq,
        schema = analyzed.schema,
        queryColumnNames = analyzed.output.map(_.name),
        columnAliases = Nil, columnComments = Nil))
    }
    Nil
  }
}

/** ALTER VIEW ... RENAME TO — within the same graft catalog only. */
case class RenameGraftViewCommand(
    catalogName: String, from: Identifier, newName: Seq[String]) extends LeafRunnableCommand {
  import GraftViewExtension._
  override def run(sparkSession: SparkSession): Seq[Row] = {
    val g = graftCatalog(sparkSession, catalogName).get
    val to: Identifier = newName match {
      case Seq(one) => Identifier.of(from.namespace(), one)
      case parts if parts.head.equalsIgnoreCase(catalogName) =>
        Identifier.of(parts.tail.init.toArray, parts.last)
      case parts => Identifier.of(parts.init.toArray, parts.last)
    }
    g.renameView(from, to)
    Nil
  }
}

/** SHOW VIEWS IN cat.ns — lists the catalog's persisted views; reuses the
  * parsed node's output attributes (namespace, viewName, isTemporary). */
case class ShowGraftViewsCommand(
    catalogName: String, namespace: Seq[String], pattern: Option[String],
    override val output: Seq[Attribute]) extends LeafRunnableCommand {
  import GraftViewExtension._
  override def run(sparkSession: SparkSession): Seq[Row] = {
    val g = graftCatalog(sparkSession, catalogName).get
    val ids = g.listViews(namespace: _*)
    val keep = pattern.map(GraftViewExtension.likeMatcher)
      .getOrElse((_: String) => true)
    ids.toSeq
      .filter(id => keep(id.name()))
      .sortBy(_.name())
      .map(id => Row(id.namespace().mkString("."), id.name(), false))
  }
}
