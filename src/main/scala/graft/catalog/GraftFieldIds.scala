package graft.catalog

import java.nio.file.Path

import scala.collection.JavaConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{Metadata, MetadataBuilder, StructField, StructType}

/** Stable COLUMN IDs for the graft catalog — the Iceberg v2 schema-evolution
  * mechanism (field-id resolution), carried by Spark's own native parquet
  * field-id machinery instead of a bespoke reader:
  *
  *   - every table created by the catalog annotates its schema with
  *     `parquet.field.id` metadata, RECURSIVELY through plain structs
  *     (depth-first 1..n at create, high-water+1 on ADD COLUMN — top-level
  *     or nested member); ids persist through `StructType.json` in the meta
  *     file and survive every schema change — a field's id NEVER changes or
  *     is reused. Struct members inside arrays/maps stay id-less (Spark's
  *     per-field fallback resolves them by name; the ALTER surface refuses
  *     paths through collection types);
  *   - writes stamp the ids into parquet footers
  *     (`spark.sql.parquet.fieldId.write.enabled`) on every path — appends,
  *     partitioned/streaming writes, and the DML/compaction rewrite job;
  *   - reads stay NAME-based (ids stripped from the read schema) until the
  *     first RENAME COLUMN sets [[ResolveProp]]; from then on read schemas
  *     keep their ids and `spark.sql.parquet.fieldId.read.enabled` makes
  *     Spark resolve each footer column BY ID — a renamed column reads the
  *     old physical column in pre-rename segments with zero data rewritten,
  *     and a file lacking ids fails loudly (never silent nulls), which is
  *     why the rename DDL first proves every live segment carries footer ids
  *     ([[segmentsWithoutIds]]).
  *
  * Why not always-on id resolution: `add_files` imports foreign parquet with
  * no footer ids — under id resolution those files would refuse to read. So
  * name resolution remains the default, rename flips the table to id
  * resolution after proving it safe, and add_files refuses on flipped tables
  * (the Iceberg name-mapping seam, documented at the add_files gate). */
private[catalog] object GraftFieldIds {
  /** Spark's native field-id metadata key (ParquetUtils.FIELD_ID_METADATA_KEY). */
  val IdKey = "parquet.field.id"

  /** Table property set by the first RENAME COLUMN: reads resolve by field id
    * from then on (value records the first renamed column, for operators). */
  val ResolveProp = "graft.field-id-resolution"

  def hasId(f: StructField): Boolean = f.metadata.contains(IdKey)

  def idOf(f: StructField): Option[Long] =
    if (hasId(f)) Some(f.metadata.getLong(IdKey)) else None

  def withId(f: StructField, id: Long): StructField =
    f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
      .putLong(IdKey, id).build())

  /** Fresh-table annotation: ids assigned RECURSIVELY in depth-first
    * declaration order (Iceberg v2 contract — struct members get their own
    * stable ids, so nested rename/widen/add/drop are metadata-only too),
    * REPLACING any caller-supplied `parquet.field.id` (user metadata must not
    * collide with the catalog's id space). Recursion covers plain structs at
    * any depth; struct members INSIDE arrays/maps stay id-less — Spark's
    * per-field fallback resolves them by name, and the catalog's ALTER
    * surface refuses paths through collection types. */
  def annotate(schema: StructType): StructType = {
    var next = 0L
    def field(f: StructField): StructField = {
      next += 1L
      val mine = next
      withId(f.dataType match {
        case st: StructType => f.copy(dataType = StructType(st.fields.map(field)))
        case _ => f
      }, mine)
    }
    StructType(schema.fields.map(field))
  }

  /** Annotate one NEW field (and, if a struct, its plain-struct subtree)
    * with consecutive ids starting at `start`; returns the field and the
    * next unused id — the ADD COLUMN allocation path. Preserves the field's
    * existing metadata (e.g. DEFAULT keys). */
  def annotateField(f: StructField, start: Long): (StructField, Long) = {
    var next = start
    def go(f: StructField): StructField = {
      next += 1L
      val mine = next - 1L
      withId(f.dataType match {
        case st: StructType => f.copy(dataType = StructType(st.fields.map(go)))
        case _ => f
      }, mine)
    }
    val out = go(f)
    (out, next)
  }

  /** True iff every plain-struct-reachable field carries an id — the
    * nested-rename gate (a legacy schema with id-less members would
    * null-fill them under id resolution). */
  def fullyAnnotated(schema: StructType): Boolean = {
    def ok(st: StructType): Boolean = st.fields.forall { f =>
      hasId(f) && (f.dataType match {
        case inner: StructType => ok(inner)
        case _ => true
      })
    }
    ok(schema)
  }

  /** Largest id anywhere in the schema (recursive over plain structs). */
  def maxId(schema: StructType): Long = {
    def walk(st: StructType): Iterator[Long] = st.fields.iterator.flatMap { f =>
      idOf(f).iterator ++ (f.dataType match {
        case inner: StructType => walk(inner)
        case _ => Iterator.empty
      })
    }
    walk(schema).maxOption.getOrElse(0L)
  }

  /** Next id for ADD COLUMN (top-level or nested member): one past the
    * largest id ever assigned. Dropped columns keep their ids out of
    * circulation because ids are assigned monotonically and [[nextId]] also
    * consults the high-water prop. */
  def nextId(schema: StructType, props: Map[String, String]): Long = {
    val fromProp = props.get(HighWaterProp).map(_.toLong).getOrElse(0L)
    math.max(maxId(schema), fromProp) + 1L
  }

  /** High-water mark of assigned ids — keeps a DROPPED column's id retired
    * even though the field (and its id) left the schema. */
  val HighWaterProp = "graft.last-column-id"

  /** Drop the id metadata — recursively, for read paths that must stay
    * NAME-resolved (pre-rename tables; the `_cdc` delta cache, which is
    * always written and read by current names). Recursion matters: the
    * fieldId.read session conf is session-wide, so a name-resolved table
    * whose struct members still carried ids would id-resolve them against
    * name-written files. */
  def stripIds(schema: StructType): StructType = {
    def strip(f: StructField): StructField = {
      val f2 = f.dataType match {
        case st: StructType => f.copy(dataType = StructType(st.fields.map(strip)))
        case _ => f
      }
      if (!hasId(f2)) f2
      else {
        val b = new MetadataBuilder().withMetadata(f2.metadata)
        b.remove(IdKey)
        f2.copy(metadata = b.build())
      }
    }
    StructType(schema.fields.map(strip))
  }

  /** The schema every FILE READ of table data must use: name-based (ids
    * stripped) until the table flipped to id resolution, id-based after. */
  def readSchema(meta: GraftMeta): StructType =
    if (meta.props.contains(ResolveProp)) meta.schema else stripIds(meta.schema)

  def resolveById(props: Map[String, String]): Boolean = props.contains(ResolveProp)

  /** Re-apply the table's field-id metadata to a DataFrame about to be
    * written as segment data by an internal rewrite job (compaction, DML) —
    * plan transforms do not reliably carry source metadata, and a rewrite
    * that dropped the ids would strand the segment outside id resolution. */
  def applyIds(df: DataFrame, tableSchema: StructType): DataFrame = {
    import org.apache.spark.sql.functions.col
    val byName = tableSchema.fields.map(f => f.name.toLowerCase -> f).toMap
    df.select(df.schema.fields.map { f =>
      val c = col(s"`${f.name}`")
      byName.get(f.name.toLowerCase).flatMap(idOf) match {
        case Some(id) => c.as(f.name, withId(f, id).metadata)
        case None     => c
      }
    }.toSeq: _*)
  }

  /** Overlay the table's ids onto a WRITE schema by (case-insensitive) name,
    * RECURSIVELY through plain structs: the v2 write schema is the query's
    * resolved output, which matches the table columns by name but does not
    * carry their metadata (and plan transforms reliably lose nested field
    * metadata). This seam is what makes every written footer carry the
    * table's nested ids. Fields the table doesn't know pass through
    * unchanged. */
  def overlayIds(writeSchema: StructType, tableSchema: StructType): StructType = {
    val byName = tableSchema.fields.map(f => f.name.toLowerCase -> f).toMap
    StructType(writeSchema.fields.map { f =>
      byName.get(f.name.toLowerCase) match {
        case Some(tf) =>
          val f2 = (f.dataType, tf.dataType) match {
            case (ws: StructType, ts: StructType) =>
              f.copy(dataType = overlayIds(ws, ts))
            case _ => f
          }
          idOf(tf) match {
            case Some(id) => withId(f2, id)
            case None     => f2
          }
        case None => f
      }
    })
  }

  /** Wrap a v2 write's LogicalWriteInfo so its schema carries the table's
    * ids ([[overlayIds]]) — the one seam through which every GraftWriteBuilder
    * path (plain, partitioned, streaming, row-level replacement) stamps
    * footers. */
  def overlayInfo(info: org.apache.spark.sql.connector.write.LogicalWriteInfo,
                  tableSchema: StructType)
    : org.apache.spark.sql.connector.write.LogicalWriteInfo =
    new org.apache.spark.sql.connector.write.LogicalWriteInfo {
      override def queryId(): String = info.queryId()
      override def schema(): StructType = overlayIds(info.schema(), tableSchema)
      override def options(): org.apache.spark.sql.util.CaseInsensitiveStringMap =
        info.options()
      override def rowIdSchema(): java.util.Optional[StructType] = info.rowIdSchema()
      override def metadataSchema(): java.util.Optional[StructType] = info.metadataSchema()
    }

  /** Enable Spark's parquet field-id machinery on the active session — id
    * stamping on writes always; id RESOLUTION on reads is still gated
    * per-table by whether the read schema carries ids ([[readSchema]]), so
    * flipping the session conf on changes nothing for name-resolved tables.
    *
    * SCOPE: these are session confs, and on stock Spark 4.1 parquet paths
    * they are the ONLY lever — a per-relation data source option is
    * silently ignored (measured: `spark.createDataFrame(rows, idSchema)
    * .write.option("spark.sql.parquet.fieldId.write.enabled","true")` with
    * the session conf off produces a footer with NO field ids; both v1 and
    * v2 parquet paths copy the flag from SQLConf into the hadoop conf with
    * an unconditional set AFTER the options merge, clobbering any option).
    * So the engine scopes the next-best way: the confs engage LAZILY, only
    * when the session first touches a table actually flipped to id
    * resolution ([[enableIfResolved]], called at GraftTable load and by
    * RENAME COLUMN DDL). A session that never touches a renamed table —
    * including any session merely having the catalog configured — keeps
    * virgin parquet semantics for its non-graft reads/writes (pinned by
    * FieldIdScopeSpec). Once a renamed table IS in play the flags stay on
    * for the session (reads, DML rewrites, and maintenance jobs on that
    * table all run through stock Spark scans that consult SQLConf), and the
    * residual side effect is the previously documented one: non-graft
    * parquet whose USER schema itself carries `parquet.field.id` metadata
    * then stamps/resolves by id. Plain (id-less) parquet usage is
    * unaffected in both directions, always. */
  def enableSessionConfs(): Unit =
    scala.util.Try(SparkSession.active).foreach { s =>
      s.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
      s.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    }

  /** WRITE-side stamping alone (catalog init): graft segments must carry
    * footer ids from their first write so RENAME COLUMN stays available
    * later; stamping changes no read semantics anywhere. */
  def enableWriteConf(): Unit =
    scala.util.Try(SparkSession.active).foreach { s =>
      s.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    }

  /** Lazy engagement gate: flip the session confs only for tables that were
    * actually renamed into id resolution. */
  def enableIfResolved(props: Map[String, String]): Unit =
    if (props.contains(ResolveProp)) enableSessionConfs()

  /** Segments among `segs` holding any parquet file WITHOUT footer field ids
    * — the rename pre-flight: id resolution over such a file fails loudly at
    * read time, so the DDL refuses up front and names the culprits. One
    * driver-side footer open per file, metadata IO only (the same class of
    * cost as the commit-time zone harvest; rename is a rare DDL). */
  def segmentsWithoutIds(tableDir: Path, segs: Seq[String]): Seq[String] = {
    val conf = new org.apache.hadoop.conf.Configuration()
    // id resolution reads nested members by id too, so the pre-flight must
    // prove ids at EVERY named level (a group whose members are id-less
    // would silently null-fill under id resolution, not error). Lists/maps
    // interpose unnamed repetition groups — recurse through groups but only
    // REQUIRE ids where the catalog assigns them: struct members, i.e.
    // groups not named by the parquet list/map encodings.
    def idless(t: org.apache.parquet.schema.Type, top: Boolean): Boolean = {
      val collectionInternals = Set("list", "key_value", "array", "map")
      val needsId = top || !collectionInternals.contains(t.getName)
      if (needsId && t.getId == null) true
      else t match {
        case g: org.apache.parquet.schema.GroupType
            if g.getLogicalTypeAnnotation == null =>
          // plain struct group: members must carry ids
          g.getFields.asScala.exists(c => idless(c, top = false))
        case _ => false // primitives ok; list/map subtrees stay name-resolved
      }
    }
    segs.filter { seg =>
      val hdir = new org.apache.hadoop.fs.Path(tableDir.resolve(seg).toString)
      scala.util.Try {
        val fs = hdir.getFileSystem(conf)
        if (!fs.isDirectory(hdir)) false
        else fs.listStatus(hdir)
          .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
          .exists { st =>
            val r = org.apache.parquet.hadoop.ParquetFileReader.open(
              org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(st, conf))
            try r.getFooter.getFileMetaData.getSchema.getFields.asScala
              .exists(f => idless(f, top = true))
            finally r.close()
          }
      }.getOrElse(true) // unreadable ⇒ treat as id-less ⇒ refuse honestly
    }
  }

  // ---------------------------------------------------------------------------
  // Nested-path helpers for the ALTER surface (paths through plain structs
  // only — a path segment landing in an array/map refuses loudly).
  // ---------------------------------------------------------------------------

  /** The StructField at `path` (case-insensitive), or None. */
  def fieldAt(schema: StructType, path: Seq[String]): Option[StructField] =
    path match {
      case Seq() => None
      case head +: rest =>
        schema.fields.find(_.name.equalsIgnoreCase(head)).flatMap { f =>
          if (rest.isEmpty) Some(f)
          else f.dataType match {
            case st: StructType => fieldAt(st, rest)
            case _ => None
          }
        }
    }

  /** Rewrite the struct at `path.init` by applying `fn` to its field list
    * (the leaf is `path.last`; `fn` receives the PARENT struct). Every
    * intermediate segment must name a plain struct member — anything else
    * (missing name, array/map element, primitive) throws with the path. */
  def updateParent(schema: StructType, path: Seq[String],
                   fn: StructType => StructType): StructType = {
    require(path.nonEmpty, "empty field path")
    def walk(st: StructType, prefix: Seq[String], rest: Seq[String]): StructType =
      rest match {
        case Seq(_) => fn(st)
        case head +: tail =>
          val idx = st.fields.indexWhere(_.name.equalsIgnoreCase(head))
          require(idx >= 0,
            s"graft catalog: no column '${(prefix :+ head).mkString(".")}'")
          val f = st.fields(idx)
          f.dataType match {
            case inner: StructType =>
              StructType(st.fields.updated(idx,
                f.copy(dataType = walk(inner, prefix :+ head, tail))))
            case other =>
              throw new IllegalArgumentException(
                s"graft catalog: '${(prefix :+ head).mkString(".")}' is " +
                  s"${other.simpleString}, not a struct — nested ALTER paths " +
                  "may only traverse plain struct members (collection " +
                  "elements stay name-resolved; restructure via CTAS)")
          }
      }
    walk(schema, Nil, path)
  }
}
