package graft.catalog

import java.nio.charset.StandardCharsets
import java.util.Base64

import scala.collection.JavaConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.functions.{col, count, datediff, lit, max, min, sum, unix_micros, when}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Segment-level zone maps for the graft catalog: per-segment min/max/null
  * statistics, computed once when a segment is committed and stored in the
  * `_graft_meta` file (`z.<segment>=` lines). Scans consult them at PLAN time
  * to drop whole segments whose ranges cannot satisfy the pushed predicates —
  * parquet footer min/max lifted one level up, so a selective query over a
  * `write.order-by`/cluster-by layout plans 1/N of the files without opening
  * any of them. This is the catalog half of the Iceberg/Delta data-skipping
  * recipe (manifest column bounds), re-derived on the graft meta layer.
  *
  * Supported columns: integral (byte/short/int/long), date, timestamp, and
  * ASCII-comparable strings. Everything else — and every predicate shape not
  * listed in [[mayMatch]] — conservatively keeps the segment. Pruning is
  * always an under-approximation: a kept segment only costs IO; a wrongly
  * dropped one would cost rows, so every conversion failure keeps.
  */
private[catalog] object SegmentStats {

  /** Shared read-only Hadoop configuration for footer IO (r21): constructing
    * a Configuration per harvest re-parses the default XML resources — pure
    * driver overhead, paid once per segment on multi-segment commits.
    * Reads only; never mutated. */
  private lazy val footerConf = new org.apache.hadoop.conf.Configuration()

  /** One column's zone entry. `min`/`max` are None when every row is null.
    * Domains by kind: 'i' integral → Long, 'd' date → epoch days Long,
    * 't' timestamp → micros Long, 's' string → String.
    *
    * `strExact` (string columns only, r17): TRUE iff the bounds are known to
    * be actual row values, not writer-truncated brackets — harvested from a
    * segment THIS engine wrote (Spark's parquet writer stores binary stats
    * untruncated or not at all) or re-derived by the aggregate fallback.
    * Exact bounds can ANSWER `MIN(col)`/`MAX(col)` zero-IO (GraftStatsAgg);
    * non-exact bounds stay safe for pruning and group-key constancy only (a
    * truncated bound is a wrong answer but a correct bracket: truncation
    * rounds min down, max up). add_files imports and pre-r17 entries decode
    * as non-exact, so foreign or legacy bounds can never leak into answers.
    *
    * `sum` is the column's exact per-segment SUM of non-null values ("0" for
    * an all-null segment — SUM's null-ness is derived from `nulls` == rows at
    * merge time). Present only for integral columns of tables that OPT IN via
    * `graft.stats.sums`: parquet footers carry min/max/null-count but no
    * sums, so harvesting one costs a projected aggregate read of the fresh
    * segment at commit — a deliberate trade (pay once at write, answer
    * `SUM(col)` audits with zero IO forever) that must not be imposed on
    * every table's zero-read commit path. */
  final case class Col(kind: Char, min: Option[String], max: Option[String],
                       nulls: Long, sum: Option[String] = None,
                       ndv: Option[String] = None, strExact: Boolean = false,
                       kll: Option[String] = None)

  final case class Stats(rows: Long, cols: Map[String, Col])

  /** 56-bit big-endian prefix of a string's UTF-8 bytes: prefix order embeds
    * byte-wise string order (7 bytes keep the value non-negative), giving a
    * numeric proxy for "where in a string range does this value sit" —
    * runtime-prune advertisement and the CBO's string-range selectivity both
    * measure interval coverage with it. */
  def prefix56(s: String): Long = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (if (i < b.length) b(i) & 0xffL else 0L); i += 1 }
    v
  }

  /** Table property naming the integral columns to harvest commit-time SUMs
    * for ('*' = every integral column). */
  val SumsProp = "graft.stats.sums"

  /** Table property naming the columns to harvest commit-time NDV SKETCHES
    * for ('*' = every zone-map-eligible column): a per-segment DataSketches
    * HLL (lgK=12, built by Spark's own `hll_sketch_agg`, b64'd into the zone
    * entry). Sketches are MERGEABLE — `t.column_stats` unions the current
    * snapshot's sketches into one distinct-count estimate with ZERO file IO
    * — which per-segment exact counts can never be (distinct does not sum).
    * Same pay-once-at-write trade as `graft.stats.sums`, hence opt-in. */
  val NdvProp = "graft.stats.ndv"

  def ndvCols(props: Map[String, String], schema: StructType): Seq[String] =
    props.get(NdvProp).toSeq.flatMap { spec =>
      val eligible = schema.fields.filter(f => kindOf(f.dataType).isDefined).map(_.name)
      if (spec.trim == "*") eligible.toSeq
      else spec.split(',').map(_.trim).flatMap(c => eligible.find(_.equalsIgnoreCase(c))).toSeq
    }

  /** Table property naming the columns to harvest commit-time QUANTILE
    * SKETCHES for ('*' = every integral/date/timestamp column): a
    * per-segment DataSketches KLL (k=200, ~1.65% one-sided rank error),
    * b64'd into the zone entry. Like the NDV sketches, KLLs are MERGEABLE —
    * `t.column_stats` unions the current snapshot's sketches into
    * p50/p90/p99 estimates with ZERO file IO, which per-segment exact
    * medians can never compose into (quantiles do not sum). Monetary values
    * follow the engine's integer-cents convention, so integral coverage is
    * the money case too. Same pay-once-at-write trade as sums/ndv. */
  val KllProp = "graft.stats.kll"

  def kllCols(props: Map[String, String], schema: StructType): Seq[String] =
    props.get(KllProp).toSeq.flatMap { spec =>
      val eligible = schema.fields
        .filter(f => kindOf(f.dataType).exists(k => k == 'i' || k == 'd' || k == 't'))
        .map(_.name)
      if (spec.trim == "*") eligible.toSeq
      else spec.split(',').map(_.trim).flatMap(c => eligible.find(_.equalsIgnoreCase(c))).toSeq
    }

  def sumCols(props: Map[String, String], schema: StructType): Seq[String] =
    props.get(SumsProp).toSeq.flatMap { spec =>
      val integral = schema.fields.filter(f => kindOf(f.dataType).contains('i')).map(_.name)
      if (spec.trim == "*") integral.toSeq
      else spec.split(',').map(_.trim).flatMap(c => integral.find(_.equalsIgnoreCase(c))).toSeq
    }

  private def kindOf(dt: DataType): Option[Char] = dt match {
    case ByteType | ShortType | IntegerType | LongType => Some('i')
    case DateType                                      => Some('d')
    case TimestampType                                 => Some('t')
    case StringType                                    => Some('s')
    case _                                             => None
  }

  /** Zone-eligible LEAVES: (dot-path, kind) — top-level primitives plus
    * primitive members of plain structs at any depth (r15, riding the
    * recursive-field-id work: `WHERE info.balance_c > x` prunes segments
    * like a top-level predicate). Collection subtrees are excluded — their
    * parquet paths interpose repetition groups and their values aren't
    * one-scalar-per-row, so min/max per segment isn't a row bound. */
  private[catalog] def eligibleLeaves(schema: StructType): Seq[(String, Char)] = {
    def walk(st: StructType, prefix: Seq[String]): Seq[(String, Char)] =
      st.fields.toSeq.flatMap { f =>
        val p = prefix :+ f.name
        f.dataType match {
          case inner: StructType => walk(inner, p)
          case dt => kindOf(dt).map(k => p.mkString(".") -> k).toSeq
        }
      }
    // the zone-entry encoding delimits on ':' ',' ';' — a leaf whose path
    // carries one simply goes unharvested (kept conservative) rather than
    // corrupting the payload
    walk(schema, Nil).filterNot(_._1.exists(c => c == ':' || c == ',' || c == ';'))
  }

  /** Column expression for a dot-path: each segment backtick-quoted so names
    * parse literally and the dots NAVIGATE (struct member access). */
  private def colAt(path: String): org.apache.spark.sql.Column =
    col(path.split('.').map(seg => s"`$seg`").mkString("."))

  /** Commit-time stats for a freshly written segment. The footers the write
    * just produced already hold per-chunk min/max/null-count, so the common
    * path is pure driver-side metadata IO — zero extra row reads, zero Spark
    * jobs (the Iceberg/Delta recipe: manifests harvest file stats at commit).
    * Columns whose footer stats are unusable (INT96 timestamps, missing
    * statistics) fall back to ONE aggregate scan over just those columns —
    * never the whole segment — so a partially-harvestable schema still skips
    * the bulk of the re-read. */
  /** Harvest + encode several freshly-written segment dirs CONCURRENTLY
    * (r21, guide §2.6 "overlap independent work"): a multi-segment commit —
    * z-order cells, partitioned fan-out, bucketed layouts — used to pay one
    * serial driver-side footer pass per segment (open + footer decode per
    * file, ~tens of ms each; a 45-cell rewrite spent over a second here).
    * Per-segment harvests touch disjoint just-written files, so a small
    * driver pool overlaps the IO; the opt-in sum/NDV/KLL harvests launch
    * their Spark jobs concurrently and back-fill the scheduler. Result order
    * matches the input; per-segment failures degrade to None (stats-less
    * segment) exactly as the serial path did. */
  def harvestAll(spark: SparkSession, segDirs: Seq[String], schema: StructType,
                 sums: Seq[String] = Nil, blooms: Seq[String] = Nil,
                 ndvs: Seq[String] = Nil,
                 klls: Seq[String] = Nil): Seq[Option[String]] = {
    def one(d: String): Option[String] = scala.util.Try(encode(
      harvest(spark, d, schema, sums, blooms, ndvs, klls = klls))).toOption
    if (segDirs.lengthCompare(2) < 0) segDirs.map(one)
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(8, segDirs.size))
      try {
        val fs = segDirs.map { d =>
          pool.submit(new java.util.concurrent.Callable[Option[String]] {
            override def call(): Option[String] = {
              SparkSession.setActiveSession(spark)
              one(d)
            }
          })
        }
        fs.map(f => scala.util.Try(f.get()).toOption.flatten)
      } finally pool.shutdown()
    }
  }

  def harvest(spark: SparkSession, segmentDir: String, schema: StructType,
              sums: Seq[String] = Nil, blooms: Seq[String] = Nil,
              ndvs: Seq[String] = Nil, selfWritten: Boolean = true,
              klls: Seq[String] = Nil): Stats = {
    // footer string bounds are EXACT only for segments this engine wrote AND
    // only while the writer's statistics truncation stays at its default
    // (off) — a user-configured truncate length demotes bounds to brackets
    val exactStrings = selfWritten && scala.util.Try {
      val v = spark.sessionState.newHadoopConf().get("parquet.statistics.truncate.length")
      v == null || v.toInt == Integer.MAX_VALUE
    }.getOrElse(false)
    val base = fromFooters(segmentDir, schema, exactStrings) match {
      case Some((rows, ok, failed)) if failed.isEmpty => Stats(rows, ok)
      case Some((rows, ok, failed)) =>
        val patched = computeCols(spark, segmentDir, schema, failed)
        Stats(rows, ok ++ patched)
      case None => compute(spark, segmentDir, schema)
    }
    // opt-in point-lookup index, persisted beside the segment's parquet
    // (GraftBloom) — rides the same commit pass as the sums harvest
    GraftBloom.harvest(spark, segmentDir, schema, blooms, base.rows)
    val summed =
      if (sums.isEmpty) base else withSums(spark, segmentDir, schema, base, sums)
    val sketched =
      if (ndvs.isEmpty) summed else withNdv(spark, segmentDir, schema, summed, ndvs)
    if (klls.isEmpty) sketched else withKll(spark, segmentDir, schema, sketched, klls)
  }

  /** Opt-in commit-time KLL quantile-sketch harvest: ONE projected pass over
    * the named columns via mapPartitions — a sketch per column per task,
    * merged driver-side, exactly the merge tree KLL's error bound is proven
    * for. Date/timestamp columns sketch their long domain (epoch days /
    * micros — the same domain their zone bounds use). An all-null segment
    * stores an EMPTY sketch ("this segment contributes zero values" is
    * information; absence would read as "not covered"). Failures degrade to
    * sketch-less stats, never lost zone maps. */
  private def withKll(spark: SparkSession, segmentDir: String, schema: StructType,
                      base: Stats, klls: Seq[String]): Stats = {
    val targets: Seq[(String, Char)] = klls.flatMap(c =>
      base.cols.get(c).map(_.kind).filter(k => k == 'i' || k == 'd' || k == 't')
        .map(c -> _))
    if (targets.isEmpty) return base
    scala.util.Try {
      import org.apache.datasketches.kll.KllDoublesSketch
      val df = spark.read.schema(schema).parquet(segmentDir)
      val proj = df.select(targets.map { case (c, kind) =>
        (kind match {
          case 'd' => datediff(colAt(c), lit("1970-01-01"))
          case 't' => unix_micros(colAt(c))
          case _   => colAt(c)
        }).cast("double")
      }: _*)
      val n = targets.length
      val parts = proj.rdd.mapPartitions { it =>
        val sks = Array.fill(n)(KllDoublesSketch.newHeapInstance(200))
        it.foreach { r =>
          var i = 0
          while (i < n) {
            if (!r.isNullAt(i)) sks(i).update(r.getDouble(i))
            i += 1
          }
        }
        Iterator.single(sks.map(_.toByteArray))
      }.collect()
      val merged = (0 until n).map { i =>
        val u = KllDoublesSketch.newHeapInstance(200)
        parts.foreach(p => u.merge(KllDoublesSketch.heapify(
          org.apache.datasketches.memory.Memory.wrap(p(i)))))
        Base64.getEncoder.encodeToString(u.toByteArray)
      }
      val patched = targets.map(_._1).zip(merged).flatMap { case (c, b) =>
        base.cols.get(c).map(col0 => c -> col0.copy(kll = Some(b)))
      }
      base.copy(cols = base.cols ++ patched)
    }.getOrElse(base)
  }

  /** Opt-in commit-time NDV-sketch harvest: one aggregate scan projected to
    * exactly the named columns, building a DataSketches HLL per column via
    * Spark's codegen'd `hll_sketch_agg` (lgK=12, ~1.6% RSE). An all-null
    * segment stores an EMPTY sketch — "this segment contributes zero
    * distincts" is information, absence would read as "not covered".
    * Failures degrade to sketch-less stats, never lost zone maps. */
  private def withNdv(spark: SparkSession, segmentDir: String, schema: StructType,
                      base: Stats, ndvs: Seq[String]): Stats = {
    val targets = ndvs.filter(base.cols.contains)
    if (targets.isEmpty) return base
    scala.util.Try {
      val df = spark.read.schema(schema).parquet(segmentDir)
      val aggs = targets.map(c =>
        org.apache.spark.sql.functions.hll_sketch_agg(col(c), 12).as(s"__h_$c"))
      val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
      val empty = new org.apache.datasketches.hll.HllSketch(12).toCompactByteArray
      val patched = targets.flatMap { c =>
        val bytes = Option(row.getAs[Array[Byte]](s"__h_$c")).getOrElse(empty)
        base.cols.get(c).map(col0 =>
          c -> col0.copy(ndv = Some(Base64.getEncoder.encodeToString(bytes))))
      }
      base.copy(cols = base.cols ++ patched)
    }.getOrElse(base)
  }

  /** Opt-in commit-time SUM harvest: one aggregate scan projected to exactly
    * the named integral columns. Any failure (overflow under ANSI, unreadable
    * segment) degrades to sum-less stats — min/max/null zone maps are never
    * lost to a sum problem. */
  private def withSums(spark: SparkSession, segmentDir: String, schema: StructType,
                       base: Stats, sums: Seq[String]): Stats = {
    val targets = sums.filter(c => base.cols.get(c).exists(_.kind == 'i'))
    if (targets.isEmpty) return base
    scala.util.Try {
      val df = spark.read.schema(schema).parquet(segmentDir)
      val aggs = targets.map(c => sum(col(c).cast(LongType)).as(s"__sum_$c"))
      val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
      val patched = targets.flatMap { c =>
        val v = Option(row.getAs[Any](s"__sum_$c")).map(_.toString).getOrElse("0")
        base.cols.get(c).map(col0 => c -> col0.copy(sum = Some(v)))
      }
      base.copy(cols = base.cols ++ patched)
    }.getOrElse(base)
  }

  /** One aggregate pass over the segment — the engine-only fallback when
    * footers can't serve ([[harvest]] is the zero-IO primary path). */
  def compute(spark: SparkSession, segmentDir: String, schema: StructType): Stats = {
    val eligible = eligibleLeaves(schema)
    val df = spark.read.schema(schema).parquet(segmentDir)
    val aggs = count(lit(1)).as("__rows") +: aggsFor(eligible)
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    Stats(row.getAs[Long]("__rows"), colsFrom(row, eligible))
  }

  private def aggsFor(cols: Seq[(String, Char)]) = cols.flatMap { case (name, kind) =>
    val c = kind match {
      case 'i' | 's' => colAt(name)
      case 'd'       => datediff(colAt(name), lit("1970-01-01")).cast(LongType)
      case 't'       => unix_micros(colAt(name))
    }
    Seq(min(c).as(s"__min_$name"), max(c).as(s"__max_$name"),
      sum(when(colAt(name).isNull, 1L).otherwise(0L)).as(s"__nulls_$name"))
  }

  private def colsFrom(row: org.apache.spark.sql.Row,
                       cols: Seq[(String, Char)]): Map[String, Col] =
    cols.map { case (name, kind) =>
      val mn = Option(row.getAs[Any](s"__min_$name")).map(_.toString)
      val mx = Option(row.getAs[Any](s"__max_$name")).map(_.toString)
      // aggregate-derived bounds are actual row values by construction
      name -> Col(kind, mn, mx, row.getAs[Long](s"__nulls_$name"),
        strExact = kind == 's')
    }.toMap

  /** Aggregate scan restricted to `subset` — the per-column fallback arm of
    * [[harvest]]; reads only the named columns (column pruning makes this a
    * fraction of the full-schema scan). */
  private def computeCols(spark: SparkSession, segmentDir: String,
                          schema: StructType, subset: Seq[(String, Char)]): Map[String, Col] = {
    val df = spark.read.schema(schema).parquet(segmentDir)
    val aggs = aggsFor(subset)
    colsFrom(df.agg(aggs.head, aggs.tail: _*).collect()(0), subset)
  }

  /** Harvest (rows, per-column stats, columns-needing-fallback) from the
    * segment's parquet footers. Driver-side metadata reads only. Returns None
    * if the directory itself can't be listed/read (caller falls back to the
    * aggregate scan).
    *
    * Per-column rules, conservative in the same direction as [[mayMatch]]:
    *   - a file with no chunk for the column (pre-ADD COLUMN segment) counts
    *     all its rows as null — exactly what the null-filling scan reports;
    *   - a chunk with unusable stats (INT96, statistics absent or deemed
    *     corrupt by parquet-mr, unset null counts) fails the COLUMN, which
    *     re-derives via the fallback aggregate — never silently weaker bounds;
    *   - string bounds merge by unsigned UTF-8 byte order, the same total
    *     order Spark's min/max on UTF8String uses, so harvested bounds are
    *     bit-identical to the aggregate's. */
  private[catalog] def fromFooters(segmentDir: String, schema: StructType,
                                   exactStrings: Boolean = false)
    : Option[(Long, Map[String, Col], Seq[(String, Char)])] = try {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.io.api.Binary
    import org.apache.parquet.schema.{LogicalTypeAnnotation, PrimitiveType}
    import LogicalTypeAnnotation.{DateLogicalTypeAnnotation, StringLogicalTypeAnnotation, TimestampLogicalTypeAnnotation}

    val eligible = eligibleLeaves(schema)
    val conf = SegmentStats.footerConf
    val hdir = new org.apache.hadoop.fs.Path(segmentDir)
    val fs = hdir.getFileSystem(conf)
    if (!fs.isDirectory(hdir)) return None
    val files = fs.listStatus(hdir)
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))

    // accumulator per column: failed | (nulls, min, max) in the kind's domain
    // (Long for i/d/t, Binary for s — compared by unsigned bytes)
    final class Acc(val kind: Char) {
      var failed = false
      var nulls = 0L
      var mn: Any = null
      var mx: Any = null
      def merge(v: Any): Unit = {
        def less(a: Any, b: Any): Boolean = kind match {
          case 's' =>
            val (x, y) = (a.asInstanceOf[Binary].getBytes, b.asInstanceOf[Binary].getBytes)
            val n = math.min(x.length, y.length)
            var i = 0
            while (i < n && x(i) == y(i)) i += 1
            if (i < n) (x(i) & 0xff) < (y(i) & 0xff) else x.length < y.length
          case _ => a.asInstanceOf[Long] < b.asInstanceOf[Long]
        }
        if (mn == null || less(v, mn)) mn = v
        if (mx == null || less(mx, v)) mx = v
      }
    }
    val accs = eligible.map { case (n, k) => n -> new Acc(k) }.toMap
    var rows = 0L

    // literal min OR max value from chunk stats → the column kind's domain
    def convert(kind: Char, tpe: PrimitiveType, v: Any): Option[Any] = {
      import PrimitiveType.PrimitiveTypeName._
      (kind, tpe.getPrimitiveTypeName) match {
        case ('i', INT32) => Some(v.asInstanceOf[Integer].toLong)
        case ('i', INT64) => Some(v.asInstanceOf[java.lang.Long].longValue)
        case ('d', INT32) if tpe.getLogicalTypeAnnotation.isInstanceOf[DateLogicalTypeAnnotation] =>
          Some(v.asInstanceOf[Integer].toLong)
        case ('t', INT64) => tpe.getLogicalTypeAnnotation match {
          case ts: TimestampLogicalTypeAnnotation =>
            val raw = v.asInstanceOf[java.lang.Long].longValue
            ts.getUnit match {
              case LogicalTypeAnnotation.TimeUnit.MICROS => Some(raw)
              case LogicalTypeAnnotation.TimeUnit.MILLIS => Some(math.multiplyExact(raw, 1000L))
              // floor-div is monotone, so floor(min)/floor(max) are the exact
              // micro bounds of the floored values — same as unix_micros
              case LogicalTypeAnnotation.TimeUnit.NANOS  => Some(Math.floorDiv(raw, 1000L))
            }
          case _ => None
        }
        case ('s', BINARY) if tpe.getLogicalTypeAnnotation.isInstanceOf[StringLogicalTypeAnnotation] =>
          Some(v.asInstanceOf[Binary])
        case _ => None
      }
    }

    files.foreach { st =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromStatus(st, conf))
      try {
        val footer = reader.getFooter
        footer.getBlocks.asScala.foreach { block =>
          rows += block.getRowCount
          // keyed by full dot path, so nested struct leaves resolve too
          // (collection internals like a.list.element never match an
          // eligible path and fall through harmlessly)
          val byName = block.getColumns.asScala
            .map(c => c.getPath.toDotString -> c).toMap
          eligible.foreach { case (name, kind) =>
            val acc = accs(name)
            if (!acc.failed) byName.get(name) match {
              case None =>
                // no chunk: a pre-ADD COLUMN file — the scan null-fills it
                acc.nulls += block.getRowCount
              case Some(chunk) =>
                val stats = chunk.getStatistics
                if (stats == null || !stats.isNumNullsSet) acc.failed = true
                else {
                  acc.nulls += stats.getNumNulls
                  if (stats.hasNonNullValue) {
                    (convert(kind, chunk.getPrimitiveType, stats.genericGetMin),
                      convert(kind, chunk.getPrimitiveType, stats.genericGetMax)) match {
                      case (Some(lo), Some(hi)) => acc.merge(lo); acc.merge(hi)
                      case _                    => acc.failed = true
                    }
                  } else if (block.getRowCount > stats.getNumNulls) {
                    acc.failed = true // non-null rows but no bounds recorded
                  }
                }
            }
          }
        }
      } finally reader.close()
    }

    def render(kind: Char, v: Any): String = kind match {
      case 's' => new String(v.asInstanceOf[Binary].getBytes, StandardCharsets.UTF_8)
      case _   => v.asInstanceOf[Long].toString
    }
    val ok = eligible.collect { case (n, k) if !accs(n).failed =>
      val a = accs(n)
      n -> Col(k, Option(a.mn).map(render(k, _)), Option(a.mx).map(render(k, _)),
        a.nulls, strExact = k == 's' && exactStrings)
    }.toMap
    val failed = eligible.filter { case (n, _) => accs(n).failed }
    Some((rows, ok, failed))
  } catch { case scala.util.control.NonFatal(_) => None }

  private def b64(s: String): String =
    Base64.getEncoder.encodeToString(s.getBytes(StandardCharsets.UTF_8))
  private def unb64(s: String): String =
    new String(Base64.getDecoder.decode(s), StandardCharsets.UTF_8)

  /** `rows;name:kind:minB64:maxB64:nulls[:sum],...` — base64 keeps arbitrary
    * string bounds clear of the line format's delimiters. '-' marks all-null.
    * The 6th field (per-segment SUM) appears only when harvested, so every
    * pre-existing 5-field entry still decodes. Kind 'S' (r17) is an EXACT
    * string column ([[Col.strExact]]) — pre-r17 's' entries decode as
    * bracket-only, so legacy bounds never answer MIN/MAX. */
  def encode(s: Stats): String = {
    val cols = s.cols.toSeq.sortBy(_._1).map { case (n, c) =>
      val wireKind = if (c.kind == 's' && c.strExact) 'S' else c.kind
      val base = s"$n:$wireKind:${c.min.map(b64).getOrElse("-")}:${c.max.map(b64).getOrElse("-")}:${c.nulls}"
      // positional tail: 6 fields = sum only (the pre-NDV on-disk form,
      // still read back); 7 fields = sum-or-dash + ndv sketch; 8 fields =
      // sum-or-dash + ndv-or-dash + kll quantile sketch
      (c.ndv, c.kll) match {
        case (_, Some(q)) =>
          s"$base:${c.sum.getOrElse("-")}:${c.ndv.getOrElse("-")}:$q"
        case (Some(h), None) => s"$base:${c.sum.getOrElse("-")}:$h"
        case (None, None)    => c.sum.fold(base)(v => s"$base:$v")
      }
    }
    s"${s.rows};${cols.mkString(",")}"
  }

  def decode(line: String): Stats = {
    val Array(rows, rest) = line.split(";", 2)
    val cols =
      if (rest.isEmpty) Map.empty[String, Col]
      else rest.split(',').map { rec =>
        val parts = rec.split(':')
        require(parts.length >= 5 && parts.length <= 8,
          s"graft: malformed zone entry '$rec'")
        val Array(n, k, mn, mx, nulls) = parts.take(5)
        val sum =
          if (parts.length >= 6 && parts(5) != "-") Some(parts(5)) else None
        val ndv =
          if (parts.length >= 7 && parts(6) != "-") Some(parts(6)) else None
        val kll = if (parts.length == 8) Some(parts(7)) else None
        val kind = if (k.head == 'S') 's' else k.head
        n -> Col(kind,
          if (mn == "-") None else Some(unb64(mn)),
          if (mx == "-") None else Some(unb64(mx)),
          nulls.toLong, sum, ndv, strExact = k.head == 'S', kll = kll)
      }.toMap
    Stats(rows.toLong, cols)
  }

  // ---------------------------------------------------------------------------
  // Plan-time satisfiability of pushed catalyst predicates against a segment.
  // ---------------------------------------------------------------------------

  /** Literal internal value → the column kind's comparison domain. Catalyst
    * internals line up with the stored encodings: DateType literals are epoch
    * days, TimestampType literals are micros, integral literals widen to Long. */
  private def litValue(kind: Char, v: Any): Option[Any] = (kind, v) match {
    case (_, null)                   => None
    case ('i' | 'd' | 't', n: Byte)  => Some(n.toLong)
    case ('i' | 'd' | 't', n: Short) => Some(n.toLong)
    case ('i' | 'd' | 't', n: Int)   => Some(n.toLong)
    case ('i' | 'd' | 't', n: Long)  => Some(n)
    case ('s', u: UTF8String) =>
      val s = u.toString
      // UTF8String orders by UTF-8 bytes; java String by UTF-16 chars — they
      // agree only on ASCII, so non-ASCII bounds never prune
      if (s.forall(_ < 128)) Some(s) else None
    case _ => None
  }

  private def cmp(kind: Char, bound: String, v: Any): Int = kind match {
    case 's' => bound.compareTo(v.asInstanceOf[String])
    case _   => java.lang.Long.compare(bound.toLong, v.asInstanceOf[Long])
  }

  /** Could a row of this segment satisfy `e`? Unknown shapes/columns → true. */
  def mayMatch(stats: Stats, e: Expression): Boolean = {
    // nested predicates arrive as GetStructField chains over an attribute;
    // resolve to the same dot-path the harvest keys entries by
    def pathOf(ex: Expression): Option[String] = ex match {
      case a: AttributeReference => Some(a.name)
      case g: GetStructField     => pathOf(g.child).map(p => p + "." + g.extractFieldName)
      case _                     => None
    }
    def colOf(ex: Expression): Option[(String, Col)] =
      pathOf(ex).flatMap(p => stats.cols.get(p).map(p -> _))
    def stringSafe(c: Col): Boolean =
      c.kind != 's' || (c.min.forall(_.forall(_ < 128)) && c.max.forall(_.forall(_ < 128)))
    def range(c: Col, v: Any)(keep: (Int, Int) => Boolean): Boolean =
      (c.min, c.max) match {
        case (Some(mn), Some(mx)) if stringSafe(c) => keep(cmp(c.kind, mn, v), cmp(c.kind, mx, v))
        case (None, None)                          => false // all-null column: no comparison matches
        case _                                     => true
      }
    def test(attr: Expression, lt: Literal)(keep: (Int, Int) => Boolean): Boolean =
      colOf(attr) match {
        case Some((_, c)) =>
          litValue(c.kind, lt.value) match {
            case Some(v) => range(c, v)(keep)
            case None    => true
          }
        case None => true
      }
    e match {
      case And(l, r) => mayMatch(stats, l) && mayMatch(stats, r)
      case Or(l, r)  => mayMatch(stats, l) || mayMatch(stats, r)
      case EqualTo(a, lt: Literal)            => test(a, lt)((mn, mx) => mn <= 0 && mx >= 0)
      case EqualTo(lt: Literal, a)            => test(a, lt)((mn, mx) => mn <= 0 && mx >= 0)
      case GreaterThan(a, lt: Literal)        => test(a, lt)((_, mx) => mx > 0)
      case GreaterThan(lt: Literal, a)        => test(a, lt)((mn, _) => mn < 0)
      case GreaterThanOrEqual(a, lt: Literal) => test(a, lt)((_, mx) => mx >= 0)
      case GreaterThanOrEqual(lt: Literal, a) => test(a, lt)((mn, _) => mn <= 0)
      case LessThan(a, lt: Literal)           => test(a, lt)((mn, _) => mn < 0)
      case LessThan(lt: Literal, a)           => test(a, lt)((_, mx) => mx > 0)
      case LessThanOrEqual(a, lt: Literal)    => test(a, lt)((mn, _) => mn <= 0)
      case LessThanOrEqual(lt: Literal, a)    => test(a, lt)((_, mx) => mx >= 0)
      case In(a, vs) if vs.forall(_.isInstanceOf[Literal]) =>
        vs.exists(v => mayMatch(stats, EqualTo(a, v.asInstanceOf[Literal])))
      case IsNull(a) =>
        colOf(a) match {
          case Some((_, c)) => c.nulls > 0
          case None         => true
        }
      case IsNotNull(a) =>
        colOf(a) match {
          case Some((_, c)) => stats.rows - c.nulls > 0
          case None         => true
        }
      case _ => true
    }
  }
}
