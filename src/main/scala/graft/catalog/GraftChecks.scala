package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BindReferences, BoundReference, EqualNullSafe, Expression, Literal, Predicate}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LocalRelation}
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.connector.write.{DataWriter, DataWriterFactory, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.types.StructType

/** Table-level CHECK constraints, enforced at write time.
  *
  * Declared as table properties — `'graft.check.<name>' = '<boolean sql>'` —
  * validated (parse + analyze against the table schema) at CREATE TABLE, and
  * evaluated per row inside every SQL-surfaced writer: INSERT (partitioned and
  * not), streaming foreachBatch appends, branch (WAP) writes, and the
  * replacement rows of group-based MERGE/UPDATE. A violating row fails the
  * JOB, and because every graft commit is atomic-by-CAS, a failed job
  * publishes nothing — the table never holds a row that fails its checks.
  *
  * Semantics follow the SQL standard: a check passes when its predicate is
  * TRUE **or NULL** (unknown admits, like every SQL CHECK); only a definite
  * FALSE rejects. `col IS NOT NULL` therefore expresses NOT NULL exactly.
  *
  * Cost: the bound predicate is code-generated once per writer task
  * (`Predicate.create`) and evaluated on the already-materialized InternalRow
  * — no extra scan, no shuffle, no plan change; the check rides the write the
  * way a parquet encoder does. Maintenance rewrites (compaction,
  * rewrite_deletes, COW/MOR DML rewrite segments) only MOVE rows that
  * already passed and are not re-checked — the documented seam is
  * `update_where`/MOR-merge UPDATE SET expressions, which bypass the V2
  * writer (use SQL MERGE/INSERT paths when checks must gate derived values).
  */
private[catalog] object GraftChecks {
  val Prefix = "graft.check."

  /** (name, sql) pairs, name-sorted for deterministic error order. */
  def of(props: Map[String, String]): Seq[(String, String)] =
    props.collect { case (k, v) if k.startsWith(Prefix) =>
      k.stripPrefix(Prefix) -> v
    }.toSeq.sortBy(_._1)

  /** Parse + ANALYZE (so implicit casts/coercions resolve exactly as a WHERE
    * clause would) against `schema`, then bind to row ordinals. Fails loudly
    * on unknown columns or non-boolean expressions — called at CREATE TABLE
    * so a bad check never becomes a property. */
  def resolve(schema: StructType, name: String, sql: String): Expression = {
    val spark = SparkSession.active
    val parsed =
      try spark.sessionState.sqlParser.parseExpression(sql)
      catch { case e: Exception => throw new IllegalArgumentException(
        s"graft check '$name': cannot parse '$sql': ${e.getMessage}") }
    val rel = LocalRelation(DataTypeUtils.toAttributes(schema))
    val analyzed =
      try {
        val plan = spark.sessionState.analyzer.execute(Filter(parsed, rel))
        spark.sessionState.analyzer.checkAnalysis(plan)
        plan.asInstanceOf[Filter].condition
      } catch { case e: Exception => throw new IllegalArgumentException(
        s"graft check '$name': '$sql' does not analyze as a boolean predicate " +
          s"over ${schema.fieldNames.mkString(",")}: ${e.getMessage}") }
    BindReferences.bindReference(analyzed, rel.output)
  }

  /** All checks of `props`, resolved and bound; `ordinalOffset` shifts the
    * bound row positions for writers whose rows carry leading metadata
    * columns (the row-level-op `__row_operation` prefix). */
  def boundChecks(schema: StructType, props: Map[String, String],
                  ordinalOffset: Int = 0): Seq[(String, String, Expression)] =
    of(props).map { case (n, sql) =>
      val b = resolve(schema, n, sql)
      val shifted =
        if (ordinalOffset == 0) b
        else b.transform { case r: BoundReference => r.copy(ordinal = r.ordinal + ordinalOffset) }
      (n, sql, shifted)
    }

  /** Wrap a writer factory so every row is checked before it reaches the
    * delegate. No-op (returns `inner`) when the table declares no checks. */
  def wrap(inner: DataWriterFactory, schema: StructType, props: Map[String, String],
           table: String, ordinalOffset: Int = 0): DataWriterFactory = {
    val checks = boundChecks(schema, props, ordinalOffset)
    if (checks.isEmpty) inner else new CheckingWriterFactory(inner, checks, table)
  }
}

private[catalog] final class CheckingWriterFactory(
    inner: DataWriterFactory, checks: Seq[(String, String, Expression)], table: String)
  extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] = {
    val d = inner.createWriter(partitionId, taskId)
    // violation ⇔ the predicate is DEFINITELY false (SQL CHECK: NULL admits)
    val violated = checks.map { case (n, sql, e) =>
      (n, sql, Predicate.create(EqualNullSafe(e, Literal(false, e.dataType))))
    }
    violated.foreach(_._3.initialize(partitionId))
    new DataWriter[InternalRow] {
      override def write(row: InternalRow): Unit = {
        violated.foreach { case (n, sql, p) =>
          if (p.eval(row)) throw new IllegalArgumentException(
            s"graft: CHECK constraint '$n' ($sql) violated on a row written to $table")
        }
        d.write(row)
      }
      override def commit(): WriterCommitMessage = d.commit()
      override def abort(): Unit = d.abort()
      override def close(): Unit = d.close()
      override def currentMetricsValues() = d.currentMetricsValues()
    }
  }
}
