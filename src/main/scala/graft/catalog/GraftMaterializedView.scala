package graft.catalog

import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.ProcedureParameter
import org.apache.spark.sql.connector.read.Scan
import org.apache.spark.sql.functions.{broadcast, col, count, element_at, greatest, least, lit, max, min, split, sum, when}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Incrementally maintained MATERIALIZED VIEWS over graft tables — the
  * aggregate-serving layer a 100 TB store needs: the expensive GROUP BY runs
  * once at creation, and every refresh afterwards costs O(rows CHANGED since
  * the last refresh), not O(table).
  *
  * An MV is itself an ordinary graft table (snapshot-versioned, time-travels,
  * compacts) holding `keys..., n_rows, sum_<col>..., min_<col>..., max_<col>...`
  * plus bookkeeping props: `graft.mv.source` / `graft.mv.keys` /
  * `graft.mv.sums` / `graft.mv.mins` / `graft.mv.maxs` and the REFRESH
  * WATERMARK `graft.mv.version` (the source snapshot the contents equal).
  *
  * `refresh_mv` is pure delta arithmetic over the CDC feed:
  * `GraftCdc.rowDeltas(watermark → current)` nets the source's changes
  * (append, MOR/COW DELETE/UPDATE, MERGE, upsert — compaction nets to zero);
  * each delta row contributes ±1 to its group's count and ±value to its sums,
  * touched groups' new values land via the merge-on-read upsert shape (vector
  * old group rows, append new versions, groups reaching n_rows=0 die), and
  * ONE serializable commit publishes data + watermark together — a crash can
  * never leave the watermark claiming changes that didn't land (or vice
  * versa: double-application on replay is impossible because the commit is
  * also registered under `mvr-<to-version>` in the exactly-once registry).
  *
  * COUNT/SUM (and therefore AVG downstream) are delta-commutative and always
  * maintained arithmetically. MIN/MAX are maintained by the COUNTING
  * ALGORITHM's bounded fallback: inserts tighten an extremum in place
  * (`least`/`greatest` — still pure arithmetic), and a group is RE-AGGREGATED
  * from the source only when a delete could have killed its current extremum
  * (deleted min ≤ stored min / deleted max ≥ stored max) — one projected
  * source scan per refresh, aggregating ONLY the endangered groups' rows
  * (broadcast semi-join on their keys), never a full regroup.
  *
  * Shape derived from the published literature on incremental view
  * maintenance (counting algorithm / DBToaster-style delta processing) —
  * contract only, no code. */
private[catalog] object GraftMv {
  val SourceProp = "graft.mv.source"
  val KeysProp = "graft.mv.keys"
  val SumsProp = "graft.mv.sums"
  val MinsProp = "graft.mv.mins"
  val MaxsProp = "graft.mv.maxs"
  val VersionProp = "graft.mv.version"
  /** COMPUTED key columns (r20): `name:b64(sql)` csv — keys declared as
    * `<expr> AS <name>` in create_mv (`month(o_orderdate) AS m`, the
    * time-bucketed dashboard rollup). The expr is persisted as SQL text,
    * recomputed over every refresh delta, and matched STRUCTURALLY at
    * rewrite time (GraftMvRewrite resolves it against the scanned relation
    * and compares semantically). Plain keys stay bare names in KeysProp;
    * a computed key's NAME also appears there (ordering + schema). */
  val KeyExprsProp = "graft.mv.keyexprs"
  /** Session timezone pinned at create when any computed key exists:
    * expressions like date_trunc are TZ-dependent, so refresh and serve
    * under a DIFFERENT session TZ would silently group differently —
    * both refuse on mismatch instead. */
  val TzProp = "graft.mv.tz"

  def keyCols(meta: GraftMeta): Seq[String] =
    meta.props(KeysProp).split(',').map(_.trim).filter(_.nonEmpty).toSeq

  /** name → SQL text of each computed key (empty for plain-key MVs). */
  def keyExprs(meta: GraftMeta): Seq[(String, String)] =
    meta.props.get(KeyExprsProp).toSeq.flatMap(_.split(',')).filter(_.nonEmpty)
      .map { e =>
        val i = e.indexOf(':')
        e.substring(0, i) -> new String(
          java.util.Base64.getDecoder.decode(e.substring(i + 1)),
          java.nio.charset.StandardCharsets.UTF_8)
      }

  def encodeKeyExprs(specs: Seq[(String, String)]): String =
    specs.map { case (n, sql) =>
      s"$n:${java.util.Base64.getEncoder.encodeToString(
        sql.getBytes(java.nio.charset.StandardCharsets.UTF_8))}"
    }.mkString(",")

  /** Materialize the computed key columns onto `df` (no-op for plain MVs).
    * Every consumer of source/delta rows — create, refresh deltas, the
    * endangered-group rescan — goes through here so the grouping domain is
    * ONE definition. */
  def withKeyExprs(df: DataFrame, meta: GraftMeta): DataFrame =
    keyExprs(meta).foldLeft(df) { case (d, (n, sql)) =>
      d.withColumn(n, org.apache.spark.sql.functions.expr(sql))
    }

  /** Computed keys pin the creation session's timezone (TzProp): refuse
    * refresh/serve under a different one rather than group differently. */
  def tzOk(meta: GraftMeta, spark: SparkSession): Boolean =
    meta.props.get(TzProp).forall(_ == spark.sessionState.conf.sessionLocalTimeZone)
  def sumCols(meta: GraftMeta): Seq[String] =
    meta.props.get(SumsProp).toSeq.flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
  def minCols(meta: GraftMeta): Seq[String] =
    meta.props.get(MinsProp).toSeq.flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
  def maxCols(meta: GraftMeta): Seq[String] =
    meta.props.get(MaxsProp).toSeq.flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)

  /** The MV aggregate of `rows`: one row per key tuple, counting all rows,
    * summing each sum column, min/max-ing the extremum columns, and (r18)
    * counting each sum column's NON-NULL rows (`nn_<c>`, appended last so
    * pre-r18 column ordinals are stable) — `nn` is what makes COUNT(col) and
    * AVG(col) servable from the summary (AVG = sum/nn, exactly SQL's
    * null-skipping semantics; n_rows counts all rows and cannot serve it). */
  def aggregate(rows: DataFrame, keys: Seq[String], sums: Seq[String],
                mins: Seq[String] = Nil, maxs: Seq[String] = Nil): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +:
      (sums.map(c => sum(col(c)).as(s"sum_$c")) ++
        mins.map(c => min(col(c)).as(s"min_$c")) ++
        maxs.map(c => max(col(c)).as(s"max_$c")) ++
        sums.map(c => count(col(c)).as(s"nn_$c")))
    rows.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Types an extremum column may have: anything with a total order the
    * engine's MIN/MAX agree on across Spark and the zone layer. */
  def orderable(t: DataType): Boolean = t match {
    case _: NumericType | DateType | TimestampType | StringType | BooleanType => true
    case _ => false
  }
}

private[catalog] final class CreateMvProcedure(catalog: GraftCatalog)
  extends GraftProcedure(catalog) {

  override def name(): String = "create_mv"
  override def description(): String =
    "materialize a COUNT/SUM/MIN/MAX group-by over a graft table, incrementally refreshable"

  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("mv_table", StringType).build(),
    ProcedureParameter.in("source_table", StringType).build(),
    ProcedureParameter.in("keys", StringType).build(),
    ProcedureParameter.in("sums", StringType).defaultValue("''").build(),
    ProcedureParameter.in("mins", StringType).defaultValue("''").build(),
    ProcedureParameter.in("maxs", StringType).defaultValue("''").build())

  override val outputSchema: StructType = StructType(Seq(
    StructField("mv", StringType, nullable = false),
    StructField("source_version", LongType, nullable = false),
    StructField("n_groups", LongType, nullable = false)))

  /** Split the keys argument at TOP-LEVEL commas only: computed key exprs
    * (`date_trunc('day', ts) AS d`) carry commas of their own inside parens
    * and quoted literals. */
  private def splitTop(spec: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    var q = false
    spec.foreach {
      case '\'' => q = !q; cur += '\''
      case '(' if !q => depth += 1; cur += '('
      case ')' if !q => depth -= 1; cur += ')'
      case ',' if !q && depth == 0 => out += cur.toString; cur.clear()
      case c => cur += c
    }
    out += cur.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  private val AsKey = "(?is)^(.*\\S)\\s+AS\\s+([A-Za-z_][A-Za-z0-9_]*)$".r
  private val PlainKey = "^[A-Za-z_][A-Za-z0-9_]*$".r

  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val spark = SparkSession.active
    val mvArg = input.getUTF8String(0).toString
    val srcArg = input.getUTF8String(1).toString
    def list(i: Int): Seq[String] =
      input.getUTF8String(i).toString.split(',').map(_.trim).filter(_.nonEmpty).toSeq
    // keys: plain column names, or `<expr> AS <name>` COMPUTED keys (r20) —
    // the time-bucketed rollup (`month(o_orderdate) AS m`) is the single
    // most common dashboard GROUP BY shape
    val keyItems = splitTop(input.getUTF8String(2).toString)
    val keySpecs: Seq[(String, Option[String])] = keyItems.map {
      case item @ PlainKey() => item -> None
      case AsKey(e, n)       => n -> Some(e.trim)
      case other => throw new IllegalArgumentException(
        s"graft create_mv: key '$other' is neither a column name nor '<expr> AS <name>'")
    }
    val keys = keySpecs.map(_._1)
    val keyExprs = keySpecs.collect { case (n, Some(e)) => n -> e }
    require(keys.map(_.toLowerCase).distinct.size == keys.size,
      s"graft create_mv: duplicate key names in '${keys.mkString(",")}'")
    val sums = list(3)
    val mins = list(4)
    val maxs = list(5)
    require(keys.nonEmpty, "graft create_mv: keys must name at least one column")
    sums.foreach(c => require(!c.contains(":"),
      s"graft create_mv: '$c' — plain column names only " +
        "(COUNT is implicit as n_rows; MIN/MAX go in the mins/maxs parameters)"))
    val srcDir = resolveTableDir(srcArg)
    val srcMeta = GraftMeta.read(srcDir)
    (keySpecs.collect { case (n, None) => n } ++ sums ++ mins ++ maxs)
      .foreach(c => require(srcMeta.schema.fieldNames.contains(c),
        s"graft create_mv: source '$srcArg' has no column '$c'"))
    keyExprs.foreach { case (n, _) =>
      require(!srcMeta.schema.fieldNames.exists(_.equalsIgnoreCase(n)),
        s"graft create_mv: computed key '$n' shadows a source column — pick another name")
    }
    sums.foreach { c =>
      val t = srcMeta.schema(c).dataType
      require(t.isInstanceOf[NumericType], s"graft create_mv: SUM column '$c' is $t, not numeric")
    }
    (mins ++ maxs).foreach { c =>
      val t = srcMeta.schema(c).dataType
      require(GraftMv.orderable(t),
        s"graft create_mv: MIN/MAX column '$c' is $t — not an orderable scalar")
    }
    val v = srcMeta.current
    // aggregate the source PINNED at v — commits racing this build land
    // after the watermark and surface at the first refresh
    val src0 = spark.read.option("snapshot", v.toString)
      .table(s"${catalog.name()}.$srcArg")
    // computed keys materialize here; analysis errors (bad expr, unknown
    // column) surface now, at create, not at first refresh
    val src = keyExprs.foldLeft(src0) { case (d, (n, sql)) =>
      d.withColumn(n, org.apache.spark.sql.functions.expr(sql))
    }
    // a computed key must be DETERMINISTIC (refresh recomputes it over
    // delta rows — a nondeterministic key would tear groups apart) and
    // aggregate-free (a nested aggregate is not a row-level key)
    keyExprs.foreach { case (n, sql) =>
      // locate the alias the withColumn fold introduced and test ITS child
      // (a select(n) on top would only show the attribute reference)
      val aliased = src.queryExecution.analyzed.collect {
        case p: org.apache.spark.sql.catalyst.plans.logical.Project => p.projectList
      }.flatten.collectFirst {
        case al: org.apache.spark.sql.catalyst.expressions.Alias
            if al.name.equalsIgnoreCase(n) => al.child
      }
      val bad = aliased.forall(c => !c.deterministic ||
        c.exists(_.isInstanceOf[org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression]))
      require(!bad,
        s"graft create_mv: computed key '$n' ($sql) must be a deterministic, " +
          "aggregate-free scalar expression")
    }
    val df = GraftMv.aggregate(src, keys, sums, mins, maxs)

    val parts = mvArg.split('.')
    catalog.createTable(Identifier.of(parts.init, parts.last), df.schema,
      Array.empty, new java.util.HashMap[String, String]())
    val mvDir = resolveTableDir(mvArg)
    val mvMeta = GraftMeta.read(mvDir)
    val segments = GraftDml.writeSegments(mvDir, mvMeta, df)
    GraftMeta.commitMany(mvDir, segments, replaceAll = false,
      removeSuffixes = Set.empty, expectedCurrent = Some(mvMeta.current),
      namedKey = None,
      propsUpdate = Map(GraftMv.SourceProp -> srcArg,
        GraftMv.KeysProp -> keys.mkString(","),
        GraftMv.SumsProp -> sums.mkString(","),
        GraftMv.MinsProp -> mins.mkString(","),
        GraftMv.MaxsProp -> maxs.mkString(","),
        GraftMv.VersionProp -> v.toString) ++
        (if (keyExprs.isEmpty) Map.empty
         else Map(GraftMv.KeyExprsProp -> GraftMv.encodeKeyExprs(keyExprs),
           GraftMv.TzProp -> spark.sessionState.conf.sessionLocalTimeZone)))
    val nGroups = segments.flatMap(_._2)
      .flatMap(z => scala.util.Try(SegmentStats.decode(z).rows).toOption) match {
      case rs if rs.size == segments.size => rs.sum
      case _ => spark.read.parquet(segments.map(s => mvDir.resolve(s._1).toString): _*).count()
    }
    // register on the SOURCE so the transparent rewrite (GraftMvRewrite) can
    // discover this MV from the scanned table's own props
    GraftMeta.mutate(srcDir) { m =>
      val existing = m.props.get(GraftMvRewrite.MvsProp).toSeq
        .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
      if (existing.contains(mvArg)) m
      else m.copy(props = m.props +
        (GraftMvRewrite.MvsProp -> (existing :+ mvArg).mkString(",")))
    }
    result(UTF8String.fromString(mvArg), v, nGroups)
  }
}

private[catalog] final class RefreshMvProcedure(catalog: GraftCatalog)
  extends GraftProcedure(catalog) {

  override def name(): String = "refresh_mv"
  override def description(): String =
    "apply the source's CDC deltas since the last refresh — O(rows changed), not O(table)"

  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("mv_table", StringType).build())

  override val outputSchema: StructType = StructType(Seq(
    StructField("from_version", LongType, nullable = false),
    StructField("to_version", LongType, nullable = false),
    StructField("groups_changed", LongType, nullable = false),
    StructField("groups_deleted", LongType, nullable = false)))

  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val mvArg = input.getUTF8String(0).toString
    val mvDir = resolveTableDir(mvArg)
    val maxAttempts = 5
    var attempt = 1
    while (attempt < maxAttempts) {
      try return attemptRefresh(mvArg, mvDir)
      catch { case _: GraftConcurrentCommitException => attempt += 1 }
    }
    attemptRefresh(mvArg, mvDir) // final attempt propagates
  }

  private def attemptRefresh(mvArg: String,
                             mvDir: java.nio.file.Path): java.util.Iterator[Scan] = {
    val spark = SparkSession.active
    val meta = GraftMeta.read(mvDir)
    val srcArg = meta.props.getOrElse(GraftMv.SourceProp,
      throw new IllegalArgumentException(s"graft refresh_mv: '$mvArg' is not a materialized view"))
    val keys = GraftMv.keyCols(meta)
    val sums = GraftMv.sumCols(meta)
    val mins = GraftMv.minCols(meta)
    val maxs = GraftMv.maxCols(meta)
    // non-null counts ride refresh only where the MV's schema has them
    // (pre-r18 MVs keep refreshing without nn_ columns)
    val nns = sums.filter(c => meta.schema.fieldNames.contains(s"nn_$c"))
    val lastV = meta.props(GraftMv.VersionProp).toLong
    require(GraftMv.tzOk(meta, spark),
      s"graft refresh_mv: '$mvArg' has computed keys pinned to session timezone " +
        s"'${meta.props.getOrElse(GraftMv.TzProp, "")}' — refreshing under " +
        s"'${spark.sessionState.conf.sessionLocalTimeZone}' could group differently; " +
        "set spark.sql.session.timeZone to match")
    val srcDir = resolveTableDir(srcArg)
    val cur = GraftMeta.read(srcDir).current
    if (cur == lastV) return result(lastV, cur, 0L, 0L)

    // computed keys (r20) materialize onto the delta rows — the SAME
    // definition create used, so delta groups line up with MV groups
    val deltas = GraftMv.withKeyExprs(
      GraftCdc.rowDeltas(spark, catalog.name(), srcArg, lastV, Some(cur)), meta)
    val isIns = col("_change_type") === "insert"
    val sign = when(isIns, 1L).otherwise(-1L)
    val aggs = sum(sign).as("__dn") +: (
      sums.map(c => sum(sign * col(c)).as(s"__d_$c")) ++
        nns.map(c => sum(when(col(c).isNotNull, sign).otherwise(0L)).as(s"__dnn_$c")) ++
        // per-group extrema of the INSERTED and DELETED slices — inserts
        // tighten extrema arithmetically; deleted extrema decide whether a
        // stored extremum is ENDANGERED (deleted min ≤ stored min can only
        // happen at equality, since deletes remove rows the watermark state
        // already covered)
        mins.map(c => min(when(isIns, col(c))).as(s"__ins_min_$c")) ++
        mins.map(c => min(when(!isIns, col(c))).as(s"__del_min_$c")) ++
        maxs.map(c => max(when(isIns, col(c))).as(s"__ins_max_$c")) ++
        maxs.map(c => max(when(!isIns, col(c))).as(s"__del_max_$c")))
    // CACHED (r18): the delta aggregate is group-delta-sized (bounded by
    // touched groups), but its UPSTREAM is the CDC scan over the refresh
    // range — and three separate actions consume it (the emptiness probe,
    // the DV position write, and the new-state materialization). Uncached,
    // the refresh paid the CDC scan three times (measured: the bulk of
    // q276's 4.9 s steady-state refresh).
    val grouped = deltas.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*).cache()

    if (grouped.isEmpty) {
      // net-zero range (pure compaction/maintenance): advance the watermark
      grouped.unpersist()
      GraftMeta.mutate(mvDir)(m => m.copy(props = m.props + (GraftMv.VersionProp -> cur.toString)))
      return result(lastV, cur, 0L, 0L)
    }

    // merge-on-read apply, the upsert shape generalized with group deletion:
    // probe the live MV for every touched group's positions (broadcast
    // group-delta join — the MV is never shuffled), vector them, append the
    // surviving groups' new versions, and let n_rows=0 groups die with their
    // vectored positions
    val segs = meta.snapshots(meta.current)
    val live = GraftDv.readLive(spark, mvDir, meta.readSchema, segs,
      GraftDv.forSegments(meta, meta.current, segs), keepMeta = true)
    val g = grouped
    val joinCond = keys.map(k => live(k) <=> g(k)).reduce(_ && _)

    val dvName = s"${GraftDv.Prefix}${UUID.randomUUID().toString.take(12)}"
    // semi-join probe: build-right broadcast is legal here (unlike the outer
    // state join below, whose preserved delta side CANNOT be the broadcast
    // build — Spark drops such a hint with a warning and shuffles anyway)
    live.join(broadcast(g), joinCond, "left_semi")
      .select(
        element_at(split(col("__g_fp"), "/"), -2).as("seg"),
        element_at(split(col("__g_fp"), "/"), -1).as("file"),
        col("__g_pos").as("pos"))
      .write.parquet(mvDir.resolve(dvName).toString)
    val perSeg = spark.read.parquet(mvDir.resolve(dvName).toString)
      .groupBy("seg").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    // new group states: old (or zero for brand-new groups) + delta
    val stateCols = col("n_rows") +: (sums.map(c => col(s"sum_$c")) ++
      mins.map(c => col(s"min_$c")) ++ maxs.map(c => col(s"max_$c")) ++
      nns.map(c => col(s"nn_$c")))
    val liveSel = live.select((keys.map(live(_)) ++ stateCols): _*)
    // no broadcast hint: the DELTA side is the outer join's preserved side
    // (a broadcast build there is unsupported — the old hint was silently
    // dropped), and at scale a big MV joined to a small delta belongs on a
    // key shuffle; AQE still broadcasts the MV side when it is small enough
    val joined = g.join(liveSel, keys.map(k => liveSel(k) <=> g(k)).reduce(_ && _), "left")
    val coalesceF = org.apache.spark.sql.functions.coalesce _
    // ENDANGERED ⇔ a delete reached the stored extremum: the value might
    // survive as a duplicate, so the group re-aggregates from the source —
    // the counting algorithm's bounded fallback. Inserts alone never
    // endanger (they only tighten), so pure-append refreshes stay
    // arithmetic-only with NO source rescan.
    val endangered = (
      mins.map(c => col(s"__del_min_$c").isNotNull && col(s"min_$c").isNotNull &&
        col(s"__del_min_$c") <= col(s"min_$c")) ++
        maxs.map(c => col(s"__del_max_$c").isNotNull && col(s"max_$c").isNotNull &&
          col(s"__del_max_$c") >= col(s"max_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    val pre = joined.select(
      keys.map(g(_)) ++
        Seq((coalesceF(Seq(col("n_rows"), lit(0L))) + col("__dn")).as("n_rows"),
          col("n_rows").isNotNull.as("__existed"),
          (col("n_rows").isNotNull && endangered).as("__endangered")) ++
        sums.map { c =>
          val t = meta.schema(s"sum_$c").dataType
          val zero = lit(0).cast(t)
          // an all-NULL delta sums to NULL — that means "no numeric change",
          // never "zero the group" (caught by the r18 AVG/nn spec)
          val combined = (coalesceF(Seq(col(s"sum_$c"), zero)) +
            coalesceF(Seq(col(s"__d_$c"), zero))).cast(t)
          if (nns.contains(c))
            // exact NULL semantics (r18): a group's SUM is NULL iff no
            // non-null rows remain — the maintained nn count decides
            when(coalesceF(Seq(col(s"nn_$c"), lit(0L))) + col(s"__dnn_$c") > 0,
              combined).otherwise(lit(null).cast(t)).as(s"sum_$c")
          else coalesceF(Seq(combined, zero)).as(s"sum_$c") // pre-r18 MV shape
        } ++
        // the arithmetic (insert-only) extremum update; endangered groups
        // override from the rescan below
        mins.map(c => least(col(s"min_$c"), col(s"__ins_min_$c")).as(s"min_$c")) ++
        maxs.map(c => greatest(col(s"max_$c"), col(s"__ins_max_$c")).as(s"max_$c")) ++
        nns.map(c =>
          (coalesceF(Seq(col(s"nn_$c"), lit(0L))) + col(s"__dnn_$c")).as(s"nn_$c")): _*)
      .cache()

    val newState: org.apache.spark.sql.DataFrame =
      if (mins.isEmpty && maxs.isEmpty) pre
      else {
        val endKeys = pre.where(col("__endangered")).select(keys.map(col): _*).distinct()
        // bounded re-aggregation: ONE projected scan of the source at the
        // target version, semi-joined (broadcast — endangered groups are a
        // subset of this refresh's touched groups) so only the endangered
        // groups' rows aggregate
        val src = GraftMv.withKeyExprs(spark.read.option("snapshot", cur.toString)
          .table(s"${catalog.name()}.$srcArg"), meta)
        val rsAggs = mins.map(c => min(col(c)).as(s"__rs_min_$c")) ++
          maxs.map(c => max(col(c)).as(s"__rs_max_$c"))
        val rescan = src
          .join(broadcast(endKeys), keys.map(k => src(k) <=> endKeys(k)).reduce(_ && _),
            "left_semi")
          .groupBy(keys.map(src(_)): _*)
          .agg(rsAggs.head, rsAggs.tail: _*)
        val rj = pre.join(broadcast(rescan),
          keys.map(k => pre(k) <=> rescan(k)).reduce(_ && _), "left")
        // CACHED (r18): two actions read newState (the surviving-group write
        // and the deleted-group count) and its upstream holds the FULL
        // source rescan of endangered groups — uncached, that projected
        // table scan ran twice per refresh
        rj.select(
          keys.map(pre(_)) ++
            Seq(pre("n_rows"), pre("__existed")) ++
            sums.map(c => pre(s"sum_$c")) ++
            mins.map(c => when(pre("__endangered"), rescan(s"__rs_min_$c"))
              .otherwise(pre(s"min_$c")).as(s"min_$c")) ++
            maxs.map(c => when(pre("__endangered"), rescan(s"__rs_max_$c"))
              .otherwise(pre(s"max_$c")).as(s"max_$c")) ++
            nns.map(c => pre(s"nn_$c")): _*).cache()
      }

    val alive = newState.where(col("n_rows") > 0)
      .select(meta.schema.fieldNames.map(col).toSeq: _*)
    val deleted = newState.where(col("__existed") && col("n_rows") <= 0).count()

    val newSegments = GraftDml.writeSegments(mvDir, meta, alive)
    val changed = newSegments.flatMap(_._2)
      .flatMap(z => scala.util.Try(SegmentStats.decode(z).rows).toOption) match {
      case rs if rs.size == newSegments.size => rs.sum
      case _ => alive.count()
    }
    if (!(newState eq pre)) newState.unpersist()
    pre.unpersist()
    grouped.unpersist()

    val propsUpdate = Map(GraftMv.VersionProp -> cur.toString)
    val namedKey = Some(s"mvr-$cur") // replayed refresh to the same version: no-op
    val applied = GraftDml.cleanupOnFailedCommit(mvDir, dvName +: newSegments.map(_._1)) {
      if (perSeg.isEmpty)
        GraftMeta.commitMany(mvDir, newSegments, replaceAll = false,
          removeSuffixes = Set.empty, expectedCurrent = Some(meta.current),
          namedKey = namedKey, propsUpdate = propsUpdate)
      else
        GraftMeta.commitAddDeletesAndAppend(mvDir, dvName, perSeg.keySet,
          baseDvs = GraftDv.forSegments(meta, meta.current, segs),
          newSegments = newSegments, namedKey = namedKey,
          expectedCurrent = Some(meta.current), propsUpdate = propsUpdate,
          dvSegCounts = perSeg)
    }
    if (perSeg.isEmpty) GraftMeta.deleteRecursively(mvDir.resolve(dvName))
    if (!applied) {
      GraftMeta.deleteRecursively(mvDir.resolve(dvName))
      newSegments.foreach { case (s, _) => GraftMeta.deleteRecursively(mvDir.resolve(s)) }
      return result(lastV, cur, 0L, 0L)
    }
    result(lastV, cur, changed, deleted)
  }
}
