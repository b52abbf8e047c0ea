package graft.catalog

import java.io.{BufferedInputStream, BufferedOutputStream}
import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Segment-level BLOOM FILTER indexes — point-lookup pruning where zone maps
  * are blind.
  *
  * Zone maps prune by RANGE, which works exactly when the layout correlates
  * with the predicate column (order-by, partitioning, Z-order). A
  * high-cardinality column with no layout correlation — order keys in a
  * date-clustered table, doc ids, join keys — has every segment spanning
  * nearly the full domain, so min/max never excludes anything. A per-segment
  * bloom filter answers the question zone maps can't: "can THIS segment
  * contain value v at all?" — and a plan-time equality probe drops every
  * segment whose filter says no, before any parquet file is opened (the
  * Iceberg puffin-blob recipe, re-derived at the graft segment layer).
  *
  * Opt-in per table: `'graft.index.bloom' = 'col[,col...]'` (integral and
  * string columns). Every commit path that harvests zone maps also builds
  * the filters — one projected aggregate pass over the fresh segment per
  * indexed column (the same pay-once-at-write trade as `graft.stats.sums`)
  * — and writes them as `_bloom_<col>.bf` INSIDE the segment dir: an
  * underscore-prefixed file is invisible to parquet listings, travels with
  * the segment through compaction-deletes/expiry/clone (hard links
  * included), and needs no metadata-file growth (a 3%-fpp filter is KBs–MBs
  * per segment — meta-file lines are not the place for it).
  *
  * Read side: plan-time only, equality shapes only (`=`, `IN`, `<=>` with a
  * non-null literal), conservative in the same direction as zone maps —
  * any missing file, unreadable filter, or unsupported shape KEEPS the
  * segment. Probes mirror `DataFrameStatFunctions.bloomFilter`'s element
  * encoding (longs for integral columns, UTF-8 bytes for strings). Loaded
  * filters are cached on the driver (bounded LRU) so repeated point lookups
  * pay the file read once. */
private[catalog] object GraftBloom {
  val Prop = "graft.index.bloom"
  val FppProp = "graft.index.bloom.fpp"
  val DefaultFpp = 0.01

  def fileFor(segDir: String, col: String): Path =
    Paths.get(segDir).resolve(s"_bloom_$col.bf")

  private def indexable(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | StringType => true
    case _ => false
  }

  def cols(props: Map[String, String], schema: StructType): Seq[String] =
    props.get(Prop).toSeq.flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
      .flatMap(c => schema.fields.find(f =>
        f.name.equalsIgnoreCase(c) && indexable(f.dataType)).map(_.name))

  /** Build and persist the segment's filters — called at commit, after the
    * parquet job landed and before the meta CAS. A failure degrades to
    * no-filter (the segment simply never bloom-prunes); it must never fail
    * the write. */
  def harvest(spark: SparkSession, segmentDir: String, schema: StructType,
              bloomCols: Seq[String], rows: Long): Unit =
    if (bloomCols.nonEmpty && rows > 0) scala.util.Try {
      // fpp is a TABLE property (`graft.index.bloom.fpp`, default 0.01 — the
      // Iceberg/parquet convention): read from the segment's parent meta so
      // every harvest path honors it without threading one more parameter
      val fpp = scala.util.Try(
        GraftMeta.read(Paths.get(segmentDir).getParent).props
          .get(FppProp).map(_.toDouble)).toOption.flatten
        .filter(f => f > 0 && f < 0.5).getOrElse(DefaultFpp)
      val df = spark.read.schema(schema).parquet(segmentDir)
      bloomCols.foreach { c =>
        val bf = df.stat.bloomFilter(c, math.max(rows, 64L), fpp)
        val out = new BufferedOutputStream(
          Files.newOutputStream(fileFor(segmentDir, c)))
        try bf.writeTo(out) finally out.close()
      }
    }

  // driver-side bounded LRU of loaded filters, keyed by absolute file path;
  // None caches "file absent/unreadable" so cold segments don't re-stat
  private val MaxCached = 256
  private val cache =
    new java.util.LinkedHashMap[String, Option[BloomFilter]](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Option[BloomFilter]]): Boolean =
        size() > MaxCached
    }

  private def load(segDir: String, col: String): Option[BloomFilter] = {
    val key = fileFor(segDir, col).toString
    cache.synchronized {
      val hit = cache.get(key)
      if (hit != null) return hit
    }
    val bf = scala.util.Try {
      val p = Paths.get(key)
      if (!Files.isRegularFile(p)) None
      else {
        val in = new BufferedInputStream(Files.newInputStream(p))
        try Some(BloomFilter.readFrom(in)) finally in.close()
      }
    }.toOption.flatten
    cache.synchronized(cache.put(key, bf))
    bf
  }

  /** Mirror of `DataFrameStatFunctions.bloomFilter`'s element encoding. */
  private def contains(bf: BloomFilter, v: Any): Boolean = v match {
    case b: Byte    => bf.mightContainLong(b.toLong)
    case s: Short   => bf.mightContainLong(s.toLong)
    case i: Int     => bf.mightContainLong(i.toLong)
    case l: Long    => bf.mightContainLong(l)
    case u: org.apache.spark.unsafe.types.UTF8String =>
      bf.mightContainBinary(u.getBytes)
    case s: String  => bf.mightContainString(s)
    case _          => true // unknown literal domain: keep
  }

  private def litValue(e: Expression): Option[Any] = e match {
    case Literal(v, _) if v != null => Some(v)
    case _ => None
  }

  /** Can the segment possibly satisfy `e`? Equality shapes consult the
    * bloom; everything else keeps. The traversal is deliberately the same
    * conservative algebra as SegmentStats.mayMatch. */
  def mayContain(segDir: String, e: Expression): Boolean = {
    def colName(a: Expression): Option[String] = a match {
      case ar: AttributeReference => Some(ar.name)
      case _ => None
    }
    def probe(c: String, v: Any): Boolean =
      load(segDir, c).forall(contains(_, v))
    e match {
      case And(l, r) => mayContain(segDir, l) && mayContain(segDir, r)
      case Or(l, r)  => mayContain(segDir, l) || mayContain(segDir, r)
      case EqualTo(a, lit) if colName(a).isDefined && litValue(lit).isDefined =>
        probe(colName(a).get, litValue(lit).get)
      case EqualTo(lit, a) if colName(a).isDefined && litValue(lit).isDefined =>
        probe(colName(a).get, litValue(lit).get)
      case EqualNullSafe(a, lit) if colName(a).isDefined && litValue(lit).isDefined =>
        probe(colName(a).get, litValue(lit).get)
      case EqualNullSafe(lit, a) if colName(a).isDefined && litValue(lit).isDefined =>
        probe(colName(a).get, litValue(lit).get)
      case In(a, vs) if colName(a).isDefined && vs.nonEmpty &&
          vs.forall(litValue(_).isDefined) =>
        vs.exists(v => probe(colName(a).get, litValue(v).get))
      case InSet(a, vs) if colName(a).isDefined && vs.nonEmpty =>
        vs.exists(v => v != null && probe(colName(a).get, v))
      case _ => true
    }
  }
}
