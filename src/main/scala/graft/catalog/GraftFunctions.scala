package graft.catalog

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import java.util.{Base64, UUID}

import scala.collection.JavaConverters._
import scala.util.control.NonFatal

import org.apache.spark.sql.{AnalysisException, Row, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Cast, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, LogicalPlan, Project}
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
private[catalog] object GraftFunctions {
  val FileName = "_graft_function"

  final case class Def(
      params: StructType, returnType: DataType, exprSql: String,
      currentCatalog: String, currentNamespace: Seq[String],
      deterministic: Boolean, comment: Option[String])

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
    b.toString
  }

  def parse(lines: Seq[String]): Def = {
    var expr = ""; var params = new StructType(); var ret: DataType = new StructType()
    var cat = ""; var ns: Seq[String] = Nil; var det = true
    var comment: Option[String] = None
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
      case _ => ()
    }
    Def(params, ret, expr, cat, ns, det, comment)
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
      s"$fq($sig) RETURNS ${d.returnType.sql} RETURN ${d.exprSql}" +
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

  private def sessionResolvable(session: SparkSession, name: String): Boolean =
    try {
      val ss = GraftViewExtension.classic(session).sessionState
      ss.functionRegistry.functionExists(FunctionIdentifier(name)) ||
        ss.tableFunctionRegistry.functionExists(FunctionIdentifier(name)) ||
        ss.catalog.functionExists(FunctionIdentifier(name))
    } catch { case NonFatal(_) => false }

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
    require(f.arguments.length == d.params.length,
      s"graft function $fq takes ${d.params.length} argument(s) " +
        s"(${d.params.fieldNames.mkString(", ")}), got ${f.arguments.length}")
    val byName = d.params.fields.zipWithIndex.map {
      case (p, i) => p.name.toLowerCase(java.util.Locale.ROOT) -> i
    }.toMap
    val parser = GraftViewExtension.classic(session).sessionState.sqlParser
    val body = parser.parseExpression(d.exprSql)
    val substituted = body.transformUp {
      case a: UnresolvedAttribute if a.nameParts.length == 1 &&
          byName.contains(a.nameParts.head.toLowerCase(java.util.Locale.ROOT)) =>
        val i = byName(a.nameParts.head.toLowerCase(java.util.Locale.ROOT))
        // the declared-parameter-type cast is the SQL UDF calling convention
        Cast(f.arguments(i), d.params.fields(i).dataType)
      // composition: nested calls expand depth-first with the host
      // function's OWN namespace as the default qualifier (SQL-standard
      // schema-object resolution), cycle-guarded by `seen`
      case nested: UnresolvedFunction =>
        expandNested(session, d.currentCatalog, d.currentNamespace, nested, seen + fq)
    }
    Cast(substituted, d.returnType)
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
      if (!ignoreIfExists) throw new AnalysisException("ROUTINE_ALREADY_EXISTS",
        Map("routineName" -> fq, "newRoutineType" -> "routine",
          "existingRoutineType" -> "routine"),
        Option.empty[Throwable])
    }
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
    val re = pattern.map(p => java.util.regex.Pattern.compile(
      p.replace("*", ".*"), java.util.regex.Pattern.CASE_INSENSITIVE))
    g.listFunctions(namespace.toArray).toSeq
      .filter(id => re.forall(_.matcher(id.name()).matches()))
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
    Seq(
      Row(s"Function: ${fqName(catalogName, ident)}"),
      Row(s"Signature: ($sig) RETURNS ${d.returnType.sql}"),
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
    if (!GraftFunctions.drop(g.tableDirFor(ident)) && !ifExists) {
      throw new AnalysisException("ROUTINE_NOT_FOUND",
        Map("routineName" -> fqName(catalogName, ident)),
        Option.empty[Throwable])
    }
    Nil
  }
}
