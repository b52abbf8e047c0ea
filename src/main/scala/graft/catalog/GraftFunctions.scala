package graft.catalog

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import java.util.{Base64, UUID}

import scala.collection.JavaConverters._
import scala.util.control.NonFatal

import org.apache.spark.sql.{AnalysisException, Row, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction, UnresolvedRelation, UnresolvedTableValuedFunction}
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Cast, CommonExpressionDef, CommonExpressionRef, Expression, LateralSubquery, Literal, SubqueryExpression, With}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{LateralJoin, LocalRelation, LogicalPlan, OneRowRelation, Project, SubqueryAlias, UnresolvedWith}
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, StructType}

/** Persisted SQL FUNCTIONS for the graft catalog — the scalar sibling of
  * [[GraftViews]]: `CREATE FUNCTION graft.ns.f(x BIGINT) RETURNS BIGINT
  * RETURN <expr>` persists the expression TEXT plus its declared signature
  * and creation context, and every CALL SITE inlines the stored expression
  * with the call's arguments substituted for the parameters (each argument
  * cast to its declared parameter type, the result cast to the declared
  * return type — the SQL-standard UDF contract, and exactly what Spark's
  * session-catalog SQL UDFs do). Inlining — not interpretation — keeps the
  * call inside whole-stage codegen: a persisted function costs the same as
  * writing its body by hand, at 100 TB like at 100 rows.
  *
  * Spark 4.1's analyzer routes `CREATE FUNCTION ... RETURN` only to the
  * SESSION catalog (the same v2 hole persisted views have), so the DDL rides
  * the [[GraftViewParser]] interceptor and calls resolve in
  * [[GraftViewSubstitution]]'s expression pass.
  *
  * Contract edges, all loud:
  *   - the body may reference ONLY its parameters (checked at CREATE by
  *     analyzing the substituted body over a parameter-only relation — a
  *     stray column name can never capture from the call site);
  *   - composition is expansion with cycle detection (`CREATE OR REPLACE`
  *     of a self-calling body fails at the call site with the chain named);
  *   - recursion is therefore refused (use WITH RECURSIVE for fixpoints);
  *   - one-part call names resolve builtins/temp functions FIRST (a graft
  *     function named `abs` never hijacks `abs(x)` — qualify to reach it);
  *   - DISTINCT / FILTER / WITHIN GROUP decorations are aggregate syntax and
  *     refuse on a scalar function;
  *   - table functions (`RETURNS TABLE`) are refused honestly;
  *   - names share the tables/views namespace (collisions refuse both ways).
  */
/** Typed shim for a call-by-value With-binding (r18): `With`'s
  * withNewChildrenInternal re-reads each binding's dataType/nullable on EVERY
  * tree transform, which explodes while the bound argument is still
  * unresolved mid-analysis. The shim pins both to the declared parameter
  * type (nullable, like every SQL UDF parameter) and rewrites itself to the
  * real Cast at optimization (ReplaceExpressions runs in the first optimizer
  * batch, before RewriteWithExpression materializes the binding). */
case class GraftParamBinding(child: Expression, override val dataType: DataType)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.RuntimeReplaceable {
  override def nullable: Boolean = true
  override lazy val replacement: Expression = Cast(child, dataType)
  override protected def withNewChildInternal(newChild: Expression): GraftParamBinding =
    copy(child = newChild)
}

private[catalog] object GraftFunctions {
  val FileName = "_graft_function"

  /** `isTable` (r17): a `RETURNS TABLE` function — `exprSql` holds the body
    * QUERY text, `returnType` the declared output StructType, and `bodyCols`
    * the body's analyzed output column names (captured at CREATE exactly
    * like a view's queryColumnNames, so the call-site projection can re-cast
    * each body column to its declared name/type).
    *
    * `substParams`: the params proven SAFE for DIRECT substitution at CREATE
    * — no name anywhere inside the analyzed body (node outputs, lambda
    * variables) shadows them. When EVERY param is safe, call sites
    * substitute the literal arguments straight into the body instead of the
    * lateral shape, so `WHERE col >= param` becomes `WHERE col >= 40` and
    * PUSHES into the scan — the difference between pruning a 100 TB table
    * and scanning it under a join. Any shadowed param falls back to the
    * lateral (innermost-scope semantics preserved). */
  final case class Def(
      params: StructType, returnType: DataType, exprSql: String,
      currentCatalog: String, currentNamespace: Seq[String],
      deterministic: Boolean, comment: Option[String],
      isTable: Boolean = false, bodyCols: Seq[String] = Nil,
      substParams: Seq[String] = Nil)

  private def b64(s: String): String =
    Base64.getEncoder.withoutPadding().encodeToString(s.getBytes(StandardCharsets.UTF_8))
  private def unb64(s: String): String =
    new String(Base64.getDecoder.decode(s), StandardCharsets.UTF_8)
  private def list(xs: Seq[String]): String = xs.map(b64).mkString(",")
  private def unlist(s: String): Seq[String] =
    if (s.isEmpty) Nil else s.split(',').toSeq.map(unb64)

  def render(d: Def): String = {
    val b = new StringBuilder
    b ++= s"expr=${b64(d.exprSql)}\n"
    b ++= s"params=${d.params.json}\n"
    b ++= s"return=${b64(d.returnType.json)}\n"
    b ++= s"catalog=${b64(d.currentCatalog)}\n"
    b ++= s"namespace=${list(d.currentNamespace)}\n"
    b ++= s"deterministic=${d.deterministic}\n"
    d.comment.foreach(c => b ++= s"comment=${b64(c)}\n")
    if (d.isTable) {
      b ++= "table=true\n"
      b ++= s"bodycols=${list(d.bodyCols)}\n"
      b ++= s"subst=${list(d.substParams)}\n"
    }
    b.toString
  }

  def parse(lines: Seq[String]): Def = {
    var expr = ""; var params = new StructType(); var ret: DataType = new StructType()
    var cat = ""; var ns: Seq[String] = Nil; var det = true
    var comment: Option[String] = None
    var isTable = false; var bodyCols: Seq[String] = Nil
    var substParams: Seq[String] = Nil
    lines.foreach {
      case l if l.startsWith("expr=")    => expr = unb64(l.stripPrefix("expr="))
      case l if l.startsWith("params=")  =>
        params = DataType.fromJson(l.stripPrefix("params=")).asInstanceOf[StructType]
      case l if l.startsWith("return=")  =>
        ret = DataType.fromJson(unb64(l.stripPrefix("return=")))
      case l if l.startsWith("catalog=") => cat = unb64(l.stripPrefix("catalog="))
      case l if l.startsWith("namespace=") => ns = unlist(l.stripPrefix("namespace="))
      case l if l.startsWith("deterministic=") =>
        det = l.stripPrefix("deterministic=").toBoolean
      case l if l.startsWith("comment=") => comment = Some(unb64(l.stripPrefix("comment=")))
      case l if l.startsWith("table=")   => isTable = l.stripPrefix("table=").toBoolean
      case l if l.startsWith("bodycols=") => bodyCols = unlist(l.stripPrefix("bodycols="))
      case l if l.startsWith("subst=")   => substParams = unlist(l.stripPrefix("subst="))
      case _ => ()
    }
    Def(params, ret, expr, cat, ns, det, comment, isTable, bodyCols, substParams)
  }

  def read(dir: Path): Def =
    parse(Files.readAllLines(dir.resolve(FileName), StandardCharsets.UTF_8).asScala.toSeq)

  def exists(dir: Path): Boolean = Files.exists(dir.resolve(FileName))

  def createExclusive(dir: Path, d: Def): Boolean = {
    Files.createDirectories(dir)
    val tmp = dir.resolve(s".tmp.${UUID.randomUUID()}")
    Files.write(tmp, render(d).getBytes(StandardCharsets.UTF_8))
    val target = dir.resolve(FileName)
    val won =
      try { Files.createLink(target, tmp); true }
      catch {
        case _: java.nio.file.FileAlreadyExistsException => false
        case _: UnsupportedOperationException =>
          try { Files.move(tmp, target); true }
          catch { case _: java.nio.file.FileAlreadyExistsException => false }
      }
    Files.deleteIfExists(tmp)
    won
  }

  def overwrite(dir: Path, d: Def): Unit = {
    val tmp = dir.resolve(s".tmp.${UUID.randomUUID()}")
    Files.write(tmp, render(d).getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, dir.resolve(FileName),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  def drop(dir: Path): Boolean = Files.deleteIfExists(dir.resolve(FileName))

  // ---------------------------------------------------------------------------
  // Parse-time fast path: "does ANY persisted function exist?"
  //
  // The inline walk (GraftViewParser.inlineCalls) runs on EVERY parsed
  // statement, so an engine session pays its cost whether or not it ever
  // created a function (measured ~240 us/statement of pure interceptor tax
  // on a moderately complex SELECT — 2.3x the delegate's parse time). The
  // gate below makes the no-function case (the overwhelmingly common one) a
  // map lookup: catalog roots register at initialize, the first gate hit per
  // root pays one directory walk that stops at the first _graft_function
  // found, CREATE FUNCTION flips the bit durably, and DROP FUNCTION clears
  // it so the next statement re-probes. A cached "none" expires after 10 s
  // as a cross-process backstop (a function created by ANOTHER process shows
  // up within the TTL; multi-part call names bypass the cache entirely via
  // the parser's pre-scan, so qualified calls are never stale).
  // ---------------------------------------------------------------------------
  private val FalseProbeTtlMs = 10000L
  private val roots = java.util.concurrent.ConcurrentHashMap.newKeySet[Path]()
  // value: Long.MaxValue = "has functions" (durable until drop); anything
  // else = the wall-clock ms of a none-found probe (expires after the TTL)
  private val anyByRoot = new java.util.concurrent.ConcurrentHashMap[Path, java.lang.Long]()

  def registerRoot(root: Path): Unit = roots.add(root)

  /** True iff any initialized graft catalog root holds >= 1 persisted
    * function. The parse-time gate for the per-statement inline walk. */
  def anyPersisted: Boolean = {
    val it = roots.iterator()
    while (it.hasNext) if (anyUnder(it.next())) return true
    false
  }

  private def anyUnder(root: Path): Boolean = {
    val cached = anyByRoot.get(root)
    val now = System.currentTimeMillis()
    if (cached != null) {
      if (cached.longValue() == java.lang.Long.MAX_VALUE) return true
      if (now - cached.longValue() < FalseProbeTtlMs) return false
    }
    // bounded walk (r18, ADVICE): function files live directly in table
    // dirs; segment dirs (seg-*, incl. seg-staging@) hold the DATA — on a
    // large catalog the unbounded walk paid a full data-tree scan every TTL
    // expiry precisely in the no-function case it exists to make cheap.
    val found =
      Files.isDirectory(root) && {
        var hit = false
        Files.walkFileTree(root, new java.nio.file.SimpleFileVisitor[Path] {
          import java.nio.file.FileVisitResult
          override def preVisitDirectory(dir: Path,
              attrs: java.nio.file.attribute.BasicFileAttributes): FileVisitResult = {
            val n = dir.getFileName
            if (n != null && n.toString.startsWith("seg-")) FileVisitResult.SKIP_SUBTREE
            else FileVisitResult.CONTINUE
          }
          override def visitFile(file: Path,
              attrs: java.nio.file.attribute.BasicFileAttributes): FileVisitResult =
            if (file.getFileName.toString == FileName) { hit = true; FileVisitResult.TERMINATE }
            else FileVisitResult.CONTINUE
          override def visitFileFailed(file: Path,
              exc: java.io.IOException): FileVisitResult = FileVisitResult.CONTINUE
        })
        hit
      }
    anyByRoot.put(root, if (found) java.lang.Long.MAX_VALUE else java.lang.Long.valueOf(now))
    found
  }

  def noteCreated(root: Path): Unit =
    anyByRoot.put(root, java.lang.Long.valueOf(java.lang.Long.MAX_VALUE))
  /** A drop invalidates rather than asserting "none": other functions may
    * remain under the root — the next gate hit re-probes. */
  def noteDropped(root: Path): Unit = anyByRoot.remove(root)

  /** The connector-facing UnboundFunction loadFunction serves: it makes the
    * function VISIBLE to SHOW FUNCTIONS / DESCRIBE FUNCTION and the
    * analyzer's existence checks, with the stored signature and body in its
    * description. SQL call sites never reach bind() (they inline at parse —
    * the whole point); a non-SQL path that does binds loudly with the
    * remediation named. */
  final class Described(fq: String, d: Def)
    extends org.apache.spark.sql.connector.catalog.functions.UnboundFunction {
    override def name(): String = fq
    override def description(): String = {
      val sig = d.params.fields.map(p => s"${p.name} ${p.dataType.sql}").mkString(", ")
      val returns =
        if (d.isTable) {
          val cols = d.returnType.asInstanceOf[StructType].fields
            .map(f => s"${f.name} ${f.dataType.sql}").mkString(", ")
          s"TABLE ($cols)"
        } else d.returnType.sql
      s"$fq($sig) RETURNS $returns RETURN ${d.exprSql}" +
        d.comment.map(c => s"\n    comment: $c").getOrElse("")
    }
    override def bind(inputType: StructType)
      : org.apache.spark.sql.connector.catalog.functions.BoundFunction =
      throw new UnsupportedOperationException(
        s"graft function $fq is a SQL function: calls inline during SQL " +
          "parsing — invoke it from a spark.sql(...) statement")
  }

  // -------------------------------------------------------------------------
  // Call-site inlining (GraftViewSubstitution's expression pass).
  // -------------------------------------------------------------------------

  /** Class-level probe of a one-part builtin function name: instantiate with
    * null-literal placeholders of the call's arity so node-LOCAL properties
    * (the Nondeterministic trait, class foldability) can be read at parse
    * time without touching unresolved children. Builders that validate
    * argument values/arity throw → None (conservative). */
  private def builtinClassProbe(name: String, arity: Int): Option[Expression] =
    try Some(org.apache.spark.sql.catalyst.analysis.FunctionRegistry.builtin
      .lookupFunction(FunctionIdentifier(name.toLowerCase(java.util.Locale.ROOT)),
        Seq.fill(arity)(Literal(null))))
    catch { case NonFatal(_) => None }

  /** Parse-time determinism proof for a call ARGUMENT (the call-by-value
    * gate, r18). Substituting an argument expression at every parameter
    * occurrence is call-by-name; SQL UDF semantics are call-by-value — so
    * substitution is only legal when duplication provably cannot change the
    * result. Two strictness levels share the walk:
    *
    *   - `allowAttrs = true` (scalar calls): column references and
    *     deterministic builtin trees over them are safe to DUPLICATE within
    *     one row's projection — same slots, same values. Subqueries and
    *     anything not provably deterministic (session UDFs, unknown names,
    *     nondeterministic builtins like rand/uuid) fail the proof.
    *   - `allowAttrs = false` (table-function direct substitution): the
    *     argument must additionally be CLASS-FOLDABLE constant material —
    *     literals and foldable deterministic builtins of them — because the
    *     body is a whole plan: a context-dependent-but-"deterministic" leaf
    *     (input_file_name) would change meaning when moved from the call
    *     scope into the body's scan scope.
    *
    * Unresolvable nodes prove nothing and fail closed: the caller falls back
    * to the evaluate-once shape (With-binding / the lateral), never to a
    * semantics change. */
  private[catalog] def provenDeterministic(e: Expression, allowAttrs: Boolean): Boolean =
    e match {
      case _: Literal => true
      case _: UnresolvedAttribute => allowAttrs
      case _: SubqueryExpression => false
      case u: UnresolvedFunction =>
        !u.isDistinct && u.filter.isEmpty && u.orderingWithinGroup.isEmpty &&
          u.nameParts.length == 1 &&
          builtinClassProbe(u.nameParts.head, u.arguments.length).exists { probe =>
            probe.deterministic && (allowAttrs || probe.foldable)
          } && u.arguments.forall(provenDeterministic(_, allowAttrs))
      case other =>
        other.children.nonEmpty && other.children.forall(provenDeterministic(_, allowAttrs))
    }

  /** Inline `f` iff it names a persisted graft function; None passes the call
    * through to Spark's own resolution. One-part names defer to builtins and
    * registered temp/session functions first. */
  def maybeInline(session: SparkSession, f: UnresolvedFunction): Option[Expression] = {
    if (f.nameParts.isEmpty) return None
    if (f.nameParts.length == 1 && sessionResolvable(session, f.nameParts.head)) return None
    GraftViewExtension.resolveGraft(session, f.nameParts).flatMap { case (cat, g, ident) =>
      val dir = g.tableDirFor(ident)
      if (!exists(dir)) None
      else Some(inline(session, cat, g, ident, f, Set.empty))
    }
  }

  private def sessionResolvable(session: SparkSession, name: String): Boolean = {
    val id = FunctionIdentifier(name.toLowerCase(java.util.Locale.ROOT))
    // the STATIC builtin registries first: no session state touched, so a
    // builtin-named call (the overwhelming majority) costs two set lookups
    if (org.apache.spark.sql.catalyst.analysis.FunctionRegistry.functionSet.contains(id) ||
        org.apache.spark.sql.catalyst.analysis.TableFunctionRegistry.functionSet.contains(id))
      return true
    val ss = GraftViewExtension.classic(session).sessionState
    val rawId = FunctionIdentifier(name)
    ss.functionRegistry.functionExists(rawId) ||
      ss.tableFunctionRegistry.functionExists(rawId) || {
        // the session-catalog probe throws NoSuchDatabaseException when the
        // v1 current database was dropped out from under the session — that
        // just means "not resolvable here". Anything else is infrastructure
        // failure and MUST propagate: a swallowed probe error would silently
        // route a session-owned name into graft inlining.
        try ss.catalog.functionExists(rawId)
        catch {
          case _: org.apache.spark.sql.catalyst.analysis.NoSuchDatabaseException => false
        }
      }
  }

  private def inline(session: SparkSession, catalogName: String, g: GraftCatalog,
                     ident: Identifier, f: UnresolvedFunction,
                     seen: Set[String]): Expression = {
    val fq = GraftViewExtension.fqName(catalogName, ident)
    if (seen.contains(fq)) {
      throw new AnalysisException("RECURSIVE_VIEW",
        Map("viewIdent" -> s"function $fq",
          "newPath" -> (seen + fq).mkString(" -> ")),
        Option.empty[Throwable])
    }
    require(!f.isDistinct && f.filter.isEmpty && f.orderingWithinGroup.isEmpty,
      s"graft function $fq is scalar: DISTINCT/FILTER/WITHIN GROUP do not apply")
    val d = read(g.tableDirFor(ident))
    require(!d.isTable,
      s"graft function $fq RETURNS TABLE — call it in the FROM clause " +
        s"(SELECT ... FROM $fq(...)), not as a scalar expression")
    require(f.arguments.length == d.params.length,
      s"graft function $fq takes ${d.params.length} argument(s) " +
        s"(${d.params.fieldNames.mkString(", ")}), got ${f.arguments.length}")
    val byName = d.params.fields.zipWithIndex.map {
      case (p, i) => p.name.toLowerCase(java.util.Locale.ROOT) -> i
    }.toMap
    val parser = GraftViewExtension.classic(session).sessionState.sqlParser
    val body = parser.parseExpression(d.exprSql)
    // Call-by-value gate (r18): per-occurrence substitution is call-by-name.
    // An argument that is provably deterministic may be duplicated freely
    // (same value every evaluation); otherwise a parameter used >= 2 times
    // binds ONCE through a Catalyst With/common-expression — the optimizer
    // (RewriteWithExpression) materializes it in a Project below, still
    // inside whole-stage codegen — so `f(rand())` with body `x * x` squares
    // ONE sample instead of multiplying two. A parameter used <= 1 time
    // substitutes directly either way (<= one evaluation preserves CBV; an
    // UNUSED argument is simply dropped — its side effects were never
    // observable in the result).
    val occurrences = new Array[Int](d.params.length)
    body.foreach {
      case a: UnresolvedAttribute if a.nameParts.length == 1 &&
          byName.contains(a.nameParts.head.toLowerCase(java.util.Locale.ROOT)) =>
        occurrences(byName(a.nameParts.head.toLowerCase(java.util.Locale.ROOT))) += 1
      case _ => ()
    }
    val bindings: Map[Int, CommonExpressionDef] =
      d.params.fields.indices.collect {
        case i if occurrences(i) >= 2 &&
            !provenDeterministic(f.arguments(i), allowAttrs = true) =>
          i -> CommonExpressionDef(
            GraftParamBinding(f.arguments(i), d.params.fields(i).dataType))
      }.toMap
    val substituted = body.transformUp {
      case a: UnresolvedAttribute if a.nameParts.length == 1 &&
          byName.contains(a.nameParts.head.toLowerCase(java.util.Locale.ROOT)) =>
        val i = byName(a.nameParts.head.toLowerCase(java.util.Locale.ROOT))
        bindings.get(i) match {
          case Some(dd) =>
            CommonExpressionRef(dd.id, d.params.fields(i).dataType, nullable = true)
          case None =>
            // the declared-parameter-type cast is the SQL UDF calling convention
            Cast(f.arguments(i), d.params.fields(i).dataType)
        }
      // composition: nested calls expand depth-first with the host
      // function's OWN namespace as the default qualifier (SQL-standard
      // schema-object resolution), cycle-guarded by `seen`
      case nested: UnresolvedFunction =>
        expandNested(session, d.currentCatalog, d.currentNamespace, nested, seen + fq)
    }
    val casted = Cast(substituted, d.returnType)
    if (bindings.isEmpty) casted else With(casted, bindings.values.toSeq)
  }

  // -------------------------------------------------------------------------
  // RETURNS TABLE call-site inlining (r17): `FROM fn(args)` parses to
  // UnresolvedTableValuedFunction; built-in TVF resolution throws on unknown
  // names during the resolution fixed point (before an injected rule could
  // substitute), so — exactly like scalar calls — substitution happens at
  // PARSE time in GraftViewParser.inlineCalls. The inlined shape is
  //
  //   SubqueryAlias(fn,
  //     Project(cast(bodyCol_i AS declType_i) AS declName_i, ...
  //       LateralJoin(params-as-one-row, LateralSubquery(body), Inner)))
  //
  // i.e. the arguments become a ONE-ROW relation on the lateral's left and
  // the stored body query runs correlated against it: parameter references
  // inside the body resolve through the lateral OUTER scope, so a body table
  // column with the same name SHADOWS the parameter (the SQL-standard
  // innermost-scope rule, and what Spark's session-catalog SQL UDFs do). The
  // final projection re-casts the body's captured output columns to the
  // declared RETURNS TABLE schema and drops the parameter columns.
  // -------------------------------------------------------------------------

  /** Inline `tvf` iff it names a persisted graft TABLE function; one-part
    * names defer to builtin/session table functions (range, explode, ...). */
  def maybeInlineTable(session: SparkSession,
      tvf: UnresolvedTableValuedFunction): Option[LogicalPlan] = {
    if (tvf.name.isEmpty) return None
    if (tvf.name.length == 1 && tableResolvable(session, tvf.name.head)) return None
    GraftViewExtension.resolveGraft(session, tvf.name).flatMap { case (cat, g, ident) =>
      val dir = g.tableDirFor(ident)
      if (!exists(dir)) None
      else Some(inlineTable(session, cat, g, ident, tvf.functionArgs, Set.empty))
    }
  }

  private def tableResolvable(session: SparkSession, name: String): Boolean = {
    val id = FunctionIdentifier(name.toLowerCase(java.util.Locale.ROOT))
    if (org.apache.spark.sql.catalyst.analysis.TableFunctionRegistry.functionSet.contains(id))
      return true
    val ss = GraftViewExtension.classic(session).sessionState
    ss.tableFunctionRegistry.functionExists(FunctionIdentifier(name))
  }

  private def inlineTable(session: SparkSession, catalogName: String, g: GraftCatalog,
                          ident: Identifier, args: Seq[Expression],
                          seen: Set[String]): LogicalPlan = {
    val fq = GraftViewExtension.fqName(catalogName, ident)
    if (seen.contains(fq)) {
      throw new AnalysisException("RECURSIVE_VIEW",
        Map("viewIdent" -> s"table function $fq",
          "newPath" -> (seen + fq).mkString(" -> ")),
        Option.empty[Throwable])
    }
    val d = read(g.tableDirFor(ident))
    require(d.isTable,
      s"graft function $fq is scalar — call it in an expression, not FROM")
    require(args.length == d.params.length,
      s"graft table function $fq takes ${d.params.length} argument(s) " +
        s"(${d.params.fieldNames.mkString(", ")}), got ${args.length}")
    val declared = d.returnType.asInstanceOf[StructType]

    // the DELEGATE parser on purpose: the interceptor's own inlineCalls would
    // restart cycle tracking from an empty seen set — nested graft calls are
    // expanded HERE instead, threading `seen`
    val parsed = GraftViewExtension.classic(session).sessionState.sqlParser match {
      case p: GraftViewParser => p.delegateParsePlan(d.exprSql)
      case p => p.parsePlan(d.exprSql)
    }
    val qualified = qualifyTables(parsed, d.currentCatalog, d.currentNamespace)
    // nested graft calls expand depth-first with the host's own namespace as
    // the default qualifier, cycle-guarded by `seen`
    val expanded = transformBody(qualified) {
      case tvf: UnresolvedTableValuedFunction =>
        expandNestedTable(session, d.currentCatalog, d.currentNamespace, tvf, seen + fq)
      case p => p.transformExpressionsUp {
        case nested: UnresolvedFunction =>
          expandNested(session, d.currentCatalog, d.currentNamespace, nested, seen + fq)
      }
    }

    // Calling convention (declared-parameter-type casts either way):
    //  - every param proven shadow-free at CREATE, STILL shadow-free against
    //    the referenced tables' CURRENT schemas (r18, ADVICE: an ADD COLUMN
    //    named like a param after CREATE must shadow it — innermost scope —
    //    which only the lateral expresses), AND every argument proven
    //    deterministic constant material (r18 — the call-by-value gate:
    //    substitution re-evaluates the argument per occurrence and moves it
    //    into the body's scope, so `fn(rand())` or `fn((SELECT ...))` must
    //    never take this branch) → DIRECT substitution of the arguments
    //    into the body, so param predicates constant-fold and PUSH into the
    //    scans;
    //  - otherwise the lateral shape: args as a one-row outer relation
    //    (each argument evaluated exactly ONCE — SQL's call-by-value
    //    contract), body names shadow params (innermost-scope semantics).
    val allSubstitutable = d.params.fields.forall(p =>
      d.substParams.exists(_.equalsIgnoreCase(p.name))) &&
      args.forall(provenDeterministic(_, allowAttrs = false)) &&
      shadowFreeNow(session, expanded,
        d.params.fieldNames.map(_.toLowerCase(java.util.Locale.ROOT)).toSet)
    val inlined: LogicalPlan =
      if (allSubstitutable) {
        val byName = d.params.fields.zipWithIndex.map {
          case (p, i) => p.name.toLowerCase(java.util.Locale.ROOT) -> i
        }.toMap
        transformBody(expanded) {
          case p => p.transformExpressionsUp {
            case a: UnresolvedAttribute if a.nameParts.length == 1 &&
                byName.contains(a.nameParts.head.toLowerCase(java.util.Locale.ROOT)) =>
              val i = byName(a.nameParts.head.toLowerCase(java.util.Locale.ROOT))
              Cast(args(i), d.params.fields(i).dataType)
          }
        }
      } else {
        val paramRow = Project(
          d.params.fields.toSeq.zip(args).map { case (p, a) =>
            Alias(Cast(a, p.dataType), p.name)()
          },
          OneRowRelation())
        LateralJoin(
          SubqueryAlias("__graft_fn_params_" + ident.name(), paramRow),
          LateralSubquery(expanded), Inner, None)
      }
    val projected = Project(
      d.bodyCols.zip(declared.fields).map { case (bc, f) =>
        Alias(Cast(UnresolvedAttribute.quoted(bc), f.dataType), f.name)()
      },
      inlined)
    SubqueryAlias(ident.name(), projected)
  }

  /** Bottom-up plan transform that ALSO descends into
    * `UnresolvedWith.cteRelations` (CTE definitions are innerChildren on a
    * PARSED plan — invisible to every TreeNode transform, so a plain
    * `transformUp`/`transformUpWithSubqueries` body rewrite would silently
    * skip them) and into subquery-expression plans. Every body rewrite here
    * (qualification, nested-call expansion, direct substitution) must use
    * this traversal or CTE-bearing function bodies go half-rewritten. */
  private[catalog] def transformBody(plan: LogicalPlan)(
      f: LogicalPlan => LogicalPlan): LogicalPlan = {
    def go(p: LogicalPlan): LogicalPlan = {
      val kids = p match {
        case w: UnresolvedWith =>
          w.copy(child = go(w.child),
            cteRelations = w.cteRelations.map { case (n, r, m) =>
              (n, go(r).asInstanceOf[SubqueryAlias], m)
            })
        case other => other.mapChildren(go)
      }
      val withSubqueries = kids.transformExpressionsUp {
        case se: SubqueryExpression => se.withNewPlan(go(se.plan))
      }
      f(withSubqueries)
    }
    go(plan)
  }

  /** Re-verify shadow-freedom at CALL time (r18, ADVICE): substParams was
    * derived from the analyzed body AT CREATE; a table referenced by the
    * body can later gain a column carrying a parameter's name (ADD COLUMN,
    * `SELECT *` widening), and SQL's innermost-scope rule says the new
    * COLUMN must shadow the parameter — which only the lateral shape
    * expresses. Check every referenced base table's CURRENT schema for a
    * param-named column; explicit-projection CTEs/subqueries cannot gain
    * columns post-CREATE, and `SELECT *` ones surface exactly the base
    * columns checked here. ANY failure (dropped table, unreachable catalog)
    * answers false — the caller falls back to the always-correct lateral,
    * and the real error surfaces from the plan's own analysis. */
  private def shadowFreeNow(session: SparkSession, plan: LogicalPlan,
                            paramsLower: Set[String]): Boolean =
    try {
      val rels = scala.collection.mutable.ListBuffer.empty[Seq[String]]
      transformBody(plan) {
        case u: UnresolvedRelation => rels += u.multipartIdentifier; u
        case other => other
      }
      rels.distinct.forall { parts =>
        val name = parts.map(p => "`" + p.replace("`", "``") + "`").mkString(".")
        session.table(name).schema.fieldNames
          .forall(n => !paramsLower.contains(n.toLowerCase(java.util.Locale.ROOT)))
      }
    } catch { case NonFatal(_) => false }

  /** Qualify a body's free one-part table names with the function's own
    * catalog/namespace (schema-object resolution — the same rule nested
    * scalar calls follow), leaving CTE names alone only WHERE THEY ARE IN
    * SCOPE (r18, ADVICE: a CTE defined in a sibling subquery must not
    * suppress qualification elsewhere — SQL names bind innermost-scope, not
    * whole-statement). Each CTE definition sees the CTEs defined before it
    * in the same WITH (plus its own name under WITH RECURSIVE); the main
    * query sees them all; outer scopes flow into subqueries. */
  private[catalog] def qualifyTables(plan: LogicalPlan, cat: String,
                                     ns: Seq[String]): LogicalPlan = {
    def lower(s: String) = s.toLowerCase(java.util.Locale.ROOT)
    def go(p: LogicalPlan, scope: Set[String]): LogicalPlan = p match {
      case w: UnresolvedWith =>
        var s = scope
        val newCtes = w.cteRelations.map { case (name, rel, mrd) =>
          val defScope = if (w.allowRecursion) s + lower(name) else s
          val rel2 = go(rel, defScope).asInstanceOf[SubqueryAlias]
          s = s + lower(name)
          (name, rel2, mrd)
        }
        w.copy(child = go(w.child, s), cteRelations = newCtes)
      case u: UnresolvedRelation
          if !u.isStreaming && u.multipartIdentifier.length == 1 &&
            !scope.contains(lower(u.multipartIdentifier.head)) =>
        u.copy(multipartIdentifier = cat +: ns :+ u.multipartIdentifier.head)
      case other =>
        other.transformExpressionsUp {
          case se: SubqueryExpression => se.withNewPlan(go(se.plan, scope))
        }.mapChildren(go(_, scope))
    }
    go(plan, Set.empty)
  }

  private[catalog] def expandNestedTable(session: SparkSession, hostCatalog: String,
      hostNamespace: Seq[String], tvf: UnresolvedTableValuedFunction,
      seen: Set[String]): LogicalPlan = {
    if (tvf.name.length == 1 && tableResolvable(session, tvf.name.head)) return tvf
    val candidates: Seq[Seq[String]] =
      if (tvf.name.length == 1)
        Seq(hostCatalog +: hostNamespace :+ tvf.name.head, tvf.name)
      else Seq(tvf.name)
    candidates.view.flatMap { parts =>
      GraftViewExtension.resolveGraft(session, parts).filter { case (_, g2, i2) =>
        exists(g2.tableDirFor(i2))
      }.map { case (c2, g2, i2) =>
        inlineTable(session, c2, g2, i2, tvf.functionArgs, seen)
      }
    }.headOption.getOrElse(tvf)
  }

  private[catalog] def expandNested(session: SparkSession, hostCatalog: String,
                           hostNamespace: Seq[String],
                           nested: UnresolvedFunction, seen: Set[String]): Expression = {
    if (nested.nameParts.length == 1 && sessionResolvable(session, nested.nameParts.head))
      return nested
    // one-part names resolve in the HOST function's own namespace first
    val candidates: Seq[Seq[String]] =
      if (nested.nameParts.length == 1)
        Seq(hostCatalog +: hostNamespace :+ nested.nameParts.head,
          nested.nameParts)
      else Seq(nested.nameParts)
    candidates.view.flatMap { parts =>
      GraftViewExtension.resolveGraft(session, parts).filter { case (_, g2, i2) =>
        exists(g2.tableDirFor(i2))
      }.map { case (c2, g2, i2) => inline(session, c2, g2, i2, nested, seen) }
    }.headOption.getOrElse(nested)
  }
}

/** CREATE [OR REPLACE] FUNCTION cat.ns.f(params) RETURNS type RETURN expr —
  * validates the signature and the body at CREATE (the body analyzes over a
  * parameter-only relation, so it can reference nothing else and its result
  * must cast to the declared return type), then persists. */
case class CreateGraftFunctionCommand(
    catalogName: String, ident: Identifier,
    inputParamText: Option[String], returnTypeText: String, exprText: String,
    isDeterministicFn: Boolean, comment: Option[String],
    ignoreIfExists: Boolean, replace: Boolean) extends LeafRunnableCommand {
  import GraftViewExtension._

  override def run(sparkSession: SparkSession): Seq[Row] = {
    val cs = classic(sparkSession)
    val g = graftCatalog(sparkSession, catalogName).getOrElse(
      throw new IllegalStateException(s"catalog '$catalogName' is no longer a graft catalog"))
    val fq = fqName(catalogName, ident)
    val parser = cs.sessionState.sqlParser
    val params: StructType =
      inputParamText.map(parser.parseRoutineParam).getOrElse(new StructType())
    val dup = params.fieldNames.map(_.toLowerCase(java.util.Locale.ROOT))
      .groupBy(identity).collectFirst { case (n, vs) if vs.length > 1 => n }
    require(dup.isEmpty, s"graft function $fq: duplicate parameter '${dup.get}'")
    val retDt = parser.parseDataType(returnTypeText)

    // analyze the body over a parameter-only relation: stray names fail HERE,
    // never capture at a call site; the result must cast to the return type
    val attrs = params.fields.toSeq.map(p =>
      AttributeReference(p.name, p.dataType, nullable = true)())
    val body = parser.parseExpression(exprText).transformUp {
      case a: UnresolvedAttribute if a.nameParts.length == 1 =>
        attrs.find(_.name.equalsIgnoreCase(a.nameParts.head)).getOrElse(a)
    }.transformUp {
      // composition analyzes at CREATE too: nested persisted calls expand
      // here (one-part names in the function's OWN namespace) so the probe
      // below sees a resolvable expression (a SELF-reference cannot exist
      // yet and fails the probe loudly)
      case nested: UnresolvedFunction =>
        GraftFunctions.expandNested(sparkSession, catalogName,
          ident.namespace().toSeq, nested, Set.empty)
    }
    body.collectFirst { case a: UnresolvedAttribute => a }.foreach { a =>
      throw new AnalysisException("UNRESOLVED_COLUMN.WITH_SUGGESTION",
        Map("objectName" -> a.name,
          "proposal" -> (s"function $fq bodies may reference only their " +
            s"parameters (${params.fieldNames.mkString(", ")})")),
        Option.empty[Throwable])
    }
    val probe: LogicalPlan =
      Project(Seq(Alias(Cast(body, retDt), "r")()), LocalRelation(attrs))
    cs.sessionState.executePlan(probe).assertAnalyzed()

    val dir = g.tableDirFor(ident)
    if (g.tableExists(ident) || GraftViews.exists(dir)) {
      throw new AnalysisException("ROUTINE_ALREADY_EXISTS",
        Map("routineName" -> fq, "newRoutineType" -> "routine",
          "existingRoutineType" -> "routine"),
        Option.empty[Throwable])
    }
    val cm = cs.sessionState.catalogManager
    // the stored context is the function's OWN catalog/namespace: one-part
    // names inside the body resolve against it (schema-object resolution)
    val d = GraftFunctions.Def(params, retDt, exprText,
      catalogName, ident.namespace().toSeq, isDeterministicFn, comment)
    val already = GraftFunctions.exists(dir)
    if (already && ignoreIfExists) return Nil
    if (already && replace) GraftFunctions.overwrite(dir, d)
    else if (!GraftFunctions.createExclusive(dir, d)) {
      // lost a concurrent-create race after the exists() read (TOCTOU):
      // OR REPLACE still wins by overwriting — replace=true must never
      // throw ROUTINE_ALREADY_EXISTS; plain CREATE refuses
      if (replace) GraftFunctions.overwrite(dir, d)
      else if (!ignoreIfExists) throw new AnalysisException("ROUTINE_ALREADY_EXISTS",
        Map("routineName" -> fq, "newRoutineType" -> "routine",
          "existingRoutineType" -> "routine"),
        Option.empty[Throwable])
    }
    GraftFunctions.noteCreated(g.rootDir)
    Nil
  }
}

/** CREATE [OR REPLACE] FUNCTION cat.ns.f(params) RETURNS TABLE (cols) RETURN
  * <query> — the table-valued sibling (r17). Validation mirrors the scalar
  * command where it can and the VIEW command where it must:
  *   - the body QUERY analyzes at CREATE inside the same lateral shape call
  *     sites inline (params as a one-row outer scope), so stray names fail
  *     here and the body's output column names are captured for the
  *     call-site re-cast projection;
  *   - every body output column must CAST to its declared column (arity
  *     checked positionally, the CREATE VIEW column-list contract);
  *   - parameter names must not collide with declared output names or body
  *     output names (the final projection would be ambiguous between the
  *     param scope and the body scope);
  *   - one-part table names inside the body resolve in the function's OWN
  *     catalog/namespace, frozen at CREATE (schema-object resolution). */
case class CreateGraftTableFunctionCommand(
    catalogName: String, ident: Identifier,
    inputParamText: Option[String], returnTypeText: String, queryText: String,
    isDeterministicFn: Boolean, comment: Option[String],
    ignoreIfExists: Boolean, replace: Boolean) extends LeafRunnableCommand {
  import GraftViewExtension._

  override def run(sparkSession: SparkSession): Seq[Row] = {
    val cs = classic(sparkSession)
    val g = graftCatalog(sparkSession, catalogName).getOrElse(
      throw new IllegalStateException(s"catalog '$catalogName' is no longer a graft catalog"))
    val fq = fqName(catalogName, ident)
    val parser = cs.sessionState.sqlParser
    val params: StructType =
      inputParamText.map(parser.parseRoutineParam).getOrElse(new StructType())
    val dup = params.fieldNames.map(_.toLowerCase(java.util.Locale.ROOT))
      .groupBy(identity).collectFirst { case (n, vs) if vs.length > 1 => n }
    require(dup.isEmpty, s"graft table function $fq: duplicate parameter '${dup.get}'")
    val declared: StructType =
      try parser.parseTableSchema(returnTypeText)
      catch { case scala.util.control.NonFatal(e) =>
        throw new IllegalArgumentException(
          s"graft table function $fq: cannot parse RETURNS TABLE columns " +
            s"from '$returnTypeText' — declare them explicitly " +
            "(RETURNS TABLE (name type, ...))", e)
      }
    require(declared.nonEmpty,
      s"graft table function $fq: RETURNS TABLE needs an explicit column list")
    val dupOut = declared.fieldNames.map(_.toLowerCase(java.util.Locale.ROOT))
      .groupBy(identity).collectFirst { case (n, vs) if vs.length > 1 => n }
    require(dupOut.isEmpty,
      s"graft table function $fq: duplicate output column '${dupOut.get}'")
    params.fieldNames.find(p => declared.fieldNames.exists(_.equalsIgnoreCase(p)))
      .foreach(p => throw new IllegalArgumentException(
        s"graft table function $fq: parameter '$p' collides with a declared " +
          "output column — the call-site projection would be ambiguous"))

    // analyze the body in the exact lateral shape call sites inline: params
    // as a one-row OUTER scope (body table columns shadow them), one-part
    // table names qualified with the function's own namespace
    val attrs = params.fields.toSeq.map(p =>
      AttributeReference(p.name, p.dataType, nullable = true)())
    // nested graft calls (scalar and table) expand HERE with the function's
    // OWN namespace as the default qualifier — the ambient current catalog
    // must not influence what the persisted body means (a self-reference
    // cannot exist yet, so CREATE-time cycles are impossible; an OR REPLACE
    // into self-reference expands the OLD body and fails at the call site,
    // the scalar convention)
    val hostNs = ident.namespace().toSeq
    val body = GraftFunctions.transformBody(
      GraftFunctions.qualifyTables(parser.parsePlan(queryText), catalogName, hostNs)) {
        case tvf: org.apache.spark.sql.catalyst.analysis.UnresolvedTableValuedFunction =>
          GraftFunctions.expandNestedTable(sparkSession, catalogName, hostNs, tvf, Set.empty)
        case p => p.transformExpressionsUp {
          case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction =>
            GraftFunctions.expandNested(sparkSession, catalogName, hostNs, f, Set.empty)
        }
      }
    val lateral = LateralJoin(
      SubqueryAlias("__graft_fn_params_" + ident.name(),
        Project(attrs.map(a => Alias(a, a.name)()), LocalRelation(attrs))),
      LateralSubquery(body), Inner, None)
    val analyzed = cs.sessionState.executePlan(lateral).analyzed
    val bodyOut = analyzed.output.drop(attrs.length)
    require(bodyOut.length == declared.length,
      s"graft table function $fq: the body yields ${bodyOut.length} column(s) " +
        s"(${bodyOut.map(_.name).mkString(", ")}) but RETURNS TABLE declares " +
        s"${declared.length}")
    val dupBody = bodyOut.map(_.name.toLowerCase(java.util.Locale.ROOT))
      .groupBy(identity).collectFirst { case (n, vs) if vs.length > 1 => n }
    require(dupBody.isEmpty,
      s"graft table function $fq: the body yields duplicate column name " +
        s"'${dupBody.get}' — alias the outputs distinctly")
    bodyOut.map(_.name).find(bc => params.fieldNames.exists(_.equalsIgnoreCase(bc)))
      .foreach(bc => throw new IllegalArgumentException(
        s"graft table function $fq: body output column '$bc' collides with a " +
          "parameter name — alias it so the call-site projection stays unambiguous"))
    // castability probe, positional (the CREATE VIEW column-list contract)
    val probe = Project(bodyOut.zip(declared.fields).map { case (a, f) =>
      Alias(Cast(a, f.dataType), f.name)()
    }, analyzed)
    cs.sessionState.executePlan(probe).assertAnalyzed()

    // direct-substitution safety: a param is SAFE iff nothing inside the
    // analyzed body binds its name — no node output attribute (tables,
    // projections, CTEs) and no lambda variable. Safe params let call sites
    // inline the literal arguments straight into the body (predicates push
    // into scans); any shadowed param keeps the lateral at every call site.
    val bodyPlan: LogicalPlan = analyzed match {
      case lj: LateralJoin => lj.right.plan
      case other => other
    }
    val innerNames: Set[String] = {
      val outs = bodyPlan.collect { case p => p.output.map(_.name) }.flatten
      val lambdas = bodyPlan.collect { case p =>
        p.expressions.flatMap(_.collect {
          case l: org.apache.spark.sql.catalyst.expressions.NamedLambdaVariable => l.name
          case u: org.apache.spark.sql.catalyst.expressions.UnresolvedNamedLambdaVariable =>
            u.nameParts.mkString(".")
        })
      }.flatten
      (outs ++ lambdas).map(_.toLowerCase(java.util.Locale.ROOT)).toSet
    }
    val substSafe = params.fields.toSeq.map(_.name)
      .filterNot(p => innerNames.contains(p.toLowerCase(java.util.Locale.ROOT)))

    val dir = g.tableDirFor(ident)
    if (g.tableExists(ident) || GraftViews.exists(dir)) {
      throw new AnalysisException("ROUTINE_ALREADY_EXISTS",
        Map("routineName" -> fq, "newRoutineType" -> "routine",
          "existingRoutineType" -> "routine"),
        Option.empty[Throwable])
    }
    val d = GraftFunctions.Def(params, declared, queryText,
      catalogName, ident.namespace().toSeq, isDeterministicFn, comment,
      isTable = true, bodyCols = bodyOut.map(_.name), substParams = substSafe)
    val already = GraftFunctions.exists(dir)
    if (already && ignoreIfExists) return Nil
    if (already && replace) GraftFunctions.overwrite(dir, d)
    else if (!GraftFunctions.createExclusive(dir, d)) {
      // same TOCTOU fallback as the scalar command: OR REPLACE never throws
      if (replace) GraftFunctions.overwrite(dir, d)
      else if (!ignoreIfExists) throw new AnalysisException("ROUTINE_ALREADY_EXISTS",
        Map("routineName" -> fq, "newRoutineType" -> "routine",
          "existingRoutineType" -> "routine"),
        Option.empty[Throwable])
    }
    GraftFunctions.noteCreated(g.rootDir)
    Nil
  }
}

/** SHOW FUNCTIONS IN cat.ns [LIKE pattern] — the catalog's persisted SQL
  * functions plus the bound `bucket` builtin, via FunctionCatalog. */
case class ShowGraftFunctionsCommand(
    catalogName: String, namespace: Seq[String], pattern: Option[String],
    override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute])
  extends LeafRunnableCommand {
  import GraftViewExtension._
  override def run(sparkSession: SparkSession): Seq[Row] = {
    val g = graftCatalog(sparkSession, catalogName).get
    val keep = pattern.map(GraftViewExtension.likeMatcher)
      .getOrElse((_: String) => true)
    g.listFunctions(namespace.toArray).toSeq
      .filter(id => keep(id.name()))
      .map(id => fqName(catalogName, id)).sorted
      .map(Row(_))
  }
}

/** DESCRIBE FUNCTION cat.ns.f — the stored signature and body. (The parsed
  * node's output is attached only at RESOLUTION, so this command declares
  * its own `function_desc` column — the session-catalog shape.) */
case class DescribeGraftFunctionCommand(
    catalogName: String, ident: Identifier) extends LeafRunnableCommand {
  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "function_desc", org.apache.spark.sql.types.StringType, nullable = false)())
  import GraftViewExtension._
  override def run(sparkSession: SparkSession): Seq[Row] = {
    val g = graftCatalog(sparkSession, catalogName).get
    val d = GraftFunctions.read(g.tableDirFor(ident))
    val sig = d.params.fields.map(p => s"${p.name} ${p.dataType.sql}").mkString(", ")
    val returns =
      if (d.isTable) {
        val cols = d.returnType.asInstanceOf[StructType].fields
          .map(f => s"${f.name} ${f.dataType.sql}").mkString(", ")
        s"TABLE ($cols)"
      } else d.returnType.sql
    Seq(
      Row(s"Function: ${fqName(catalogName, ident)}"),
      Row(s"Signature: ($sig) RETURNS $returns"),
      Row(s"Body: ${d.exprSql}"),
      Row(s"Deterministic: ${d.deterministic}")) ++
      d.comment.map(c => Row(s"Comment: $c"))
  }
}

/** DROP FUNCTION [IF EXISTS] cat.ns.f */
case class DropGraftFunctionCommand(
    catalogName: String, ident: Identifier, ifExists: Boolean) extends LeafRunnableCommand {
  import GraftViewExtension._
  override def run(sparkSession: SparkSession): Seq[Row] = {
    val g = graftCatalog(sparkSession, catalogName).get
    val dropped = GraftFunctions.drop(g.tableDirFor(ident))
    if (dropped) GraftFunctions.noteDropped(g.rootDir)
    else if (!ifExists) {
      throw new AnalysisException("ROUTINE_NOT_FOUND",
        Map("routineName" -> fqName(catalogName, ident)),
        Option.empty[Throwable])
    }
    Nil
  }
}
