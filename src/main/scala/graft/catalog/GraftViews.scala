package graft.catalog

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import java.util.{Base64, UUID}

import scala.collection.JavaConverters._

import org.apache.spark.sql.connector.catalog.{Identifier, View}
import org.apache.spark.sql.types.{DataType, StructType}

/** Persisted SQL VIEW storage for the graft catalog (ViewCatalog) — the
  * catalog-owned sibling of session temp views: a view is its SQL TEXT plus
  * the resolution CONTEXT captured at creation (current catalog/namespace,
  * the analyzed output schema, column names/aliases), persisted as a tiny
  * line-oriented `_graft_view` file in the same directory convention tables
  * use. Spark re-analyzes the stored text on every read (the standard SQL
  * view contract: underlying table changes flow through; a broken
  * dependency fails the READ, loudly, not the definition).
  *
  * File format: `k=<base64>` lines (base64 keeps multi-line SQL and
  * arbitrary identifiers clear of the line format), lists as comma-joined
  * base64 items, schema as StructType.json. Creation is create-exclusive
  * (temp file + atomic link), so a concurrent duplicate CREATE loses
  * cleanly. */
private[catalog] object GraftViews {
  val FileName = "_graft_view"

  final case class Def(
      sql: String, currentCatalog: String, currentNamespace: Seq[String],
      schema: StructType, queryColumnNames: Seq[String],
      columnAliases: Seq[String], columnComments: Seq[String],
      props: Map[String, String])

  // Unpadded on purpose: property lines are `p.<b64(key)>=<b64(value)>` and
  // parse splits on the FIRST '='; a padded key (byte length % 3 != 0, e.g.
  // "note") would end in '=' and the split would land inside the padding,
  // corrupting the value. The decoder accepts both padded and unpadded input,
  // so files written before this change still read.
  private def b64(s: String): String =
    Base64.getEncoder.withoutPadding().encodeToString(s.getBytes(StandardCharsets.UTF_8))
  private def unb64(s: String): String =
    new String(Base64.getDecoder.decode(s), StandardCharsets.UTF_8)
  private def list(xs: Seq[String]): String = xs.map(b64).mkString(",")
  private def unlist(s: String): Seq[String] =
    if (s.isEmpty) Nil else s.split(',').toSeq.map(unb64)

  def render(d: Def): String = {
    val b = new StringBuilder
    b ++= s"sql=${b64(d.sql)}\n"
    b ++= s"catalog=${b64(d.currentCatalog)}\n"
    b ++= s"namespace=${list(d.currentNamespace)}\n"
    b ++= s"schema=${d.schema.json}\n"
    b ++= s"queryColumnNames=${list(d.queryColumnNames)}\n"
    b ++= s"columnAliases=${list(d.columnAliases)}\n"
    b ++= s"columnComments=${list(d.columnComments)}\n"
    d.props.toSeq.sorted.foreach { case (k, v) => b ++= s"p.${b64(k)}=${b64(v)}\n" }
    b.toString
  }

  def parse(lines: Seq[String]): Def = {
    var sql = ""; var cat = ""; var ns: Seq[String] = Nil
    var schema: StructType = new StructType()
    var qcn: Seq[String] = Nil; var ca: Seq[String] = Nil; var cc: Seq[String] = Nil
    val props = Map.newBuilder[String, String]
    lines.foreach {
      case l if l.startsWith("sql=")       => sql = unb64(l.stripPrefix("sql="))
      case l if l.startsWith("catalog=")   => cat = unb64(l.stripPrefix("catalog="))
      case l if l.startsWith("namespace=") => ns = unlist(l.stripPrefix("namespace="))
      case l if l.startsWith("schema=") =>
        schema = DataType.fromJson(l.stripPrefix("schema=")).asInstanceOf[StructType]
      case l if l.startsWith("queryColumnNames=") =>
        qcn = unlist(l.stripPrefix("queryColumnNames="))
      case l if l.startsWith("columnAliases=") =>
        ca = unlist(l.stripPrefix("columnAliases="))
      case l if l.startsWith("columnComments=") =>
        cc = unlist(l.stripPrefix("columnComments="))
      case l if l.startsWith("p.") && l.contains("=") =>
        val Array(k, v) = l.drop(2).split("=", 2)
        props += unb64(k) -> unb64(v)
      case _ => ()
    }
    Def(sql, cat, ns, schema, qcn, ca, cc, props.result())
  }

  def read(dir: Path): Def =
    parse(Files.readAllLines(dir.resolve(FileName), StandardCharsets.UTF_8).asScala.toSeq)

  def exists(dir: Path): Boolean = Files.exists(dir.resolve(FileName))

  /** Create-exclusive write: loses cleanly (returns false) to a concurrent
    * CREATE of the same view. */
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
}

/** The connector-facing View served by loadView. */
private[catalog] final class GraftView(
    ident: Identifier, d: GraftViews.Def) extends View {
  override def name(): String = (ident.namespace() :+ ident.name()).mkString(".")
  override def query(): String = d.sql
  override def currentCatalog(): String = d.currentCatalog
  override def currentNamespace(): Array[String] = d.currentNamespace.toArray
  override def schema(): StructType = d.schema
  override def queryColumnNames(): Array[String] = d.queryColumnNames.toArray
  override def columnAliases(): Array[String] = d.columnAliases.toArray
  override def columnComments(): Array[String] = d.columnComments.toArray
  override def properties(): java.util.Map[String, String] = d.props.asJava
}
