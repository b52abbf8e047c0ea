package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, And, BindReferences, BoundReference, Cast, Coalesce, EqualNullSafe, Expression, IsNotNull, Not, Predicate, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, Project}
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.connector.write.{DataWriter, DataWriterFactory, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory
import org.apache.spark.sql.types.StructType

/** GENERATED COLUMNS, enforced at write time — the published Delta
  * generated-columns contract, re-derived (contract only, no code):
  * `'graft.generate.<col>' = '<sql expr>'` declares that column `<col>` is
  * derived from the row's OTHER columns. On every gated write:
  *
  *   - a row arriving with the column NULL gets it FILLED with the
  *     expression's value (the common "writer doesn't know the derivation"
  *     case — codegen'd Coalesce projection, no plan change, no shuffle);
  *   - a row arriving with an EXPLICIT value must match the expression
  *     (null-safe equality) or the job fails — an explicit wrong value
  *     would silently corrupt every downstream consumer of the invariant
  *     (most importantly partition routing, below).
  *
  * The payoff is DERIVED PARTITIONING: `PARTITIONED BY (day)` with
  * `'graft.generate.day' = 'CAST(ts AS DATE)'` gives the lakehouse recipe
  * this codebase's partitioning docs point at ("timestamp identity
  * partitioning is an anti-pattern — derive a day/hour column") without
  * every writer having to compute the derivation: generation runs OUTSIDE
  * the partition router, so routed suffixes always see filled values.
  *
  * SCALE NOTE (honest seam): the partitioned writer's clustered
  * DISTRIBUTION is computed on the INPUT rows — before generation fills —
  * so a bulk load that sends NULL for a generated partition column hashes
  * every row to the same (null) cluster and funnels through few tasks. The
  * output is still correct and partition-pure (the task writer fans out per
  * filled value); for large loads, supply the derived value explicitly —
  * the conflict gate validates it, and distribution then parallelizes.
  *
  * Validated at CREATE TABLE (parse + analyze against the schema, result
  * type cast-checked to the column's type); a generation expression may not
  * reference a generated column (no chains — evaluation order would be
  * ambiguous). Enforcement rides the V2 writer paths (INSERT partitioned +
  * not, INSERT OVERWRITE, dynamic overwrite, branch writes, streaming
  * appends, unpartitioned group-rewrites). Documented seams, same class as
  * CHECK constraints': procedure-path rewrites move already-filled rows
  * unchanged, and the PARTITIONED group-rewrite path (MERGE on a partitioned
  * table) carries rows as written — MERGE INSERT clauses there must supply
  * generated columns explicitly (the conflict gate still applies on the
  * unpartitioned path). `add_files` refuses generated-column tables outright.
  */
private[catalog] object GraftGenerate {
  val Prefix = "graft.generate."

  /** (column, sql) pairs, column-sorted for deterministic error order. */
  def of(props: Map[String, String]): Seq[(String, String)] =
    props.collect { case (k, v) if k.startsWith(Prefix) =>
      k.stripPrefix(Prefix) -> v
    }.toSeq.sortBy(_._1)

  /** Parse + analyze `sql` against `schema`, require the target column
    * exists, forbid references to generated columns, and cast the result to
    * the column's declared type. Returns (column ordinal, bound expr). */
  def resolve(schema: StructType, col: String, sql: String,
              allGenerated: Set[String]): (Int, Expression) = {
    val ordinal = schema.fields.indexWhere(_.name.equalsIgnoreCase(col))
    require(ordinal >= 0, s"graft generate '$col': no such column in the table schema")
    val field = schema.fields(ordinal)
    val spark = SparkSession.active
    val parsed =
      try spark.sessionState.sqlParser.parseExpression(sql)
      catch { case e: Exception => throw new IllegalArgumentException(
        s"graft generate '$col': cannot parse '$sql': ${e.getMessage}") }
    val rel = LocalRelation(DataTypeUtils.toAttributes(schema))
    val analyzed =
      try {
        val plan = spark.sessionState.analyzer.execute(
          Project(Seq(Alias(parsed, "g")()), rel))
        spark.sessionState.analyzer.checkAnalysis(plan)
        plan.asInstanceOf[Project].projectList.head.asInstanceOf[Alias].child
      } catch { case e: Exception => throw new IllegalArgumentException(
        s"graft generate '$col': '$sql' does not analyze over " +
          s"${schema.fieldNames.mkString(",")}: ${e.getMessage}") }
    val refs = analyzed.references.map(_.name.toLowerCase).toSet
    val badRefs = refs.intersect(allGenerated.map(_.toLowerCase))
    require(badRefs.isEmpty,
      s"graft generate '$col': expression references generated column(s) " +
        s"${badRefs.mkString(", ")} — generation chains are not supported")
    val typed =
      if (analyzed.dataType == field.dataType) analyzed
      // The implicit coercion needs the session timezone: a tz-dependent cast
      // (e.g. TIMESTAMP expr filling a DATE column) built without one never
      // resolves, and the failure would surface at WRITE time inside
      // UnsafeProjection creation — breaking the validated-at-CREATE contract.
      else if (Cast.canCast(analyzed.dataType, field.dataType))
        Cast(analyzed, field.dataType,
          Some(spark.sessionState.conf.sessionLocalTimeZone))
      else throw new IllegalArgumentException(
        s"graft generate '$col': expression type ${analyzed.dataType.simpleString} " +
          s"cannot cast to the column's ${field.dataType.simpleString}")
    (ordinal, BindReferences.bindReference(typed, rel.output))
  }

  def boundGens(schema: StructType, props: Map[String, String])
    : Seq[(Int, String, String, Expression)] = {
    val all = of(props)
    val names = all.map(_._1).toSet
    all.map { case (col, sql) =>
      val (ord, e) = resolve(schema, col, sql, names)
      (ord, col, sql, e)
    }
  }

  /** Wrap a batch writer factory; no-op when the table declares no
    * generated columns. Rows are filled/validated BEFORE the delegate, so
    * checks and partition routing downstream see final values. */
  def wrap(inner: DataWriterFactory, schema: StructType,
           props: Map[String, String], table: String): DataWriterFactory = {
    val gens = boundGens(schema, props)
    if (gens.isEmpty) inner else new GeneratingWriterFactory(inner, schema, gens, table)
  }

  /** Streaming twin of [[wrap]]. */
  def wrapStreaming(inner: StreamingDataWriterFactory, schema: StructType,
                    props: Map[String, String], table: String): StreamingDataWriterFactory = {
    val gens = boundGens(schema, props)
    if (gens.isEmpty) inner
    else (partitionId: Int, taskId: Long, epochId: Long) =>
      GeneratingWriterFactory.generatingWriter(
        inner.createWriter(partitionId, taskId, epochId), schema, gens, table, partitionId)
  }
}

private[catalog] object GeneratingWriterFactory {
  private[catalog] def generatingWriter(
      d: DataWriter[InternalRow], schema: StructType,
      gens: Seq[(Int, String, String, Expression)], table: String,
      partitionId: Int): DataWriter[InternalRow] = {
    val byOrd = gens.map(g => g._1 -> g).toMap
    val exprs = schema.indices.map { j =>
      val f = schema(j)
      byOrd.get(j) match {
        case Some((_, _, _, g)) =>
          Coalesce(Seq(BoundReference(j, f.dataType, nullable = true), g))
        case None => BoundReference(j, f.dataType, f.nullable)
      }
    }
    val proj = UnsafeProjection.create(exprs)
    // conflict ⇔ an explicit (non-null) value differs from the generation
    val conflicts = gens.map { case (j, name, sql, g) =>
      val b = BoundReference(j, schema(j).dataType, nullable = true)
      (name, sql, Predicate.create(And(IsNotNull(b), Not(EqualNullSafe(b, g)))))
    }
    conflicts.foreach(_._3.initialize(partitionId))
    new DataWriter[InternalRow] {
      override def write(row: InternalRow): Unit = {
        conflicts.foreach { case (n, sql, p) =>
          if (p.eval(row)) throw new IllegalArgumentException(
            s"graft: generated column '$n' ($sql) received an explicit value " +
              s"that does not match its generation expression on a row written to $table")
        }
        d.write(proj(row))
      }
      override def commit(): WriterCommitMessage = d.commit()
      override def abort(): Unit = d.abort()
      override def close(): Unit = d.close()
      override def currentMetricsValues() = d.currentMetricsValues()
    }
  }
}

private[catalog] final class GeneratingWriterFactory(
    inner: DataWriterFactory, schema: StructType,
    gens: Seq[(Int, String, String, Expression)], table: String)
  extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    GeneratingWriterFactory.generatingWriter(
      inner.createWriter(partitionId, taskId), schema, gens, table, partitionId)
}
