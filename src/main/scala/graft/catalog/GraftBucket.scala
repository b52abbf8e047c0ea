package graft.catalog

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** The graft BUCKET transform (`PARTITIONED BY (bucket(n, col))`) — hash
  * partitioning for join keys too wide to identity-partition, the Iceberg
  * bucket-transform shape on public APIs:
  *
  *   bucket(v) = pmod(murmur3_32(canonical bytes of v), n)
  *
  * ONE definition serves every consumer, which is the correctness contract:
  * the partitioned writer routes rows with it (bucket-pure segments whose
  * suffix IS the bucket id), the catalog's FunctionCatalog exposes it as the
  * bound `bucket` function so Spark's SPJ machinery can resolve the reported
  * `bucket(n, col)` transform (V2ExpressionUtils resolves transforms against
  * the relation catalog's functions), and COW rewrites / compaction re-route
  * through the same bytes. Integral values hash their LONG form, so the
  * metadata-only int→bigint widening cannot reshuffle history.
  *
  * Cited shape: Iceberg's bucket transform + SparkFunctions catalog (public
  * docs); the hash itself is Spark's own Murmur3_x86_32 (seed 42). */
private[catalog] object GraftBucket {

  /** Table property: "<sourceCol>,<numBuckets>". Mutually exclusive with
    * identity partitioning; engine-owned after CREATE. */
  val Prop = "graft.bucket-by"

  val Seed = 42

  final case class Spec(col: String, n: Int)

  def of(props: Map[String, String]): Option[Spec] =
    props.get(Prop).map { v =>
      val Array(c, n) = v.split(',')
      Spec(c.trim, n.trim.toInt)
    }

  /** Types whose canonical bytes are stable across the write paths. */
  def supportedType(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | StringType | DateType => true
    case _ => false
  }

  /** Catalyst value -> bucket id. Integrals (incl. DATE's epoch-day int)
    * promote to LONG before hashing, so type widening preserves buckets.
    * NULL rows land in bucket -1 (a real id is never negative). */
  def bucketOf(v: Any, n: Int): Int = v match {
    // the SQL-callable face reaches here with a runtime n the writer's
    // create-time range check never saw — pmod(_, 0) would be a task-failure
    // ArithmeticException and a negative n would collide with the -1 sentinel
    case _ if n <= 0 =>
      throw new IllegalArgumentException(s"graft bucket: numBuckets must be positive, got $n")
    case null             => -1
    case b: Byte          => ofLong(b.toLong, n)
    case s: Short         => ofLong(s.toLong, n)
    case i: Int           => ofLong(i.toLong, n)
    case l: Long          => ofLong(l, n)
    case u: UTF8String    => pmod(Murmur3_x86_32.hashUnsafeBytes(
                               u.getBaseObject, u.getBaseOffset, u.numBytes(), Seed), n)
    case other => throw new IllegalArgumentException(s"graft bucket: unhashable $other")
  }

  private def ofLong(l: Long, n: Int): Int =
    pmod(Murmur3_x86_32.hashLong(l, Seed), n)

  private def pmod(h: Int, n: Int): Int = { val m = h % n; if (m < 0) m + n else m }

  /** The FunctionCatalog face: `bucket(numBuckets, col)` — the canonical v2
    * bucket-transform argument order, so Spark resolves the transform the
    * scans report against this exact implementation. */
  object BucketFunction extends UnboundFunction {
    override def name(): String = "bucket"
    override def description(): String =
      "bucket(n, col) -> pmod(murmur3(col), n); the graft partition transform"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.length == 2,
        s"graft bucket(n, col) takes two arguments, got ${inputType.length}")
      val vt = inputType.fields(1).dataType
      require(inputType.fields(0).dataType == IntegerType,
        s"graft bucket: numBuckets must be INT, got ${inputType.fields(0).dataType.simpleString}")
      require(supportedType(vt),
        s"graft bucket: unsupported value type ${vt.simpleString} " +
          "(integral/string/date only)")
      new ScalarFunction[Int] {
        override def inputTypes(): Array[DataType] = Array(IntegerType, vt)
        override def resultType(): DataType = IntegerType
        override def name(): String = "bucket"
        override def canonicalName(): String = s"graft.bucket(${vt.catalogString})"
        override def isResultNullable: Boolean = false
        override def produceResult(input: InternalRow): Int = {
          val n = input.getInt(0)
          val v = if (input.isNullAt(1)) null else vt match {
            case ByteType    => input.getByte(1)
            case ShortType   => input.getShort(1)
            case IntegerType | DateType => input.getInt(1)
            case LongType    => input.getLong(1)
            case StringType  => input.getUTF8String(1)
            case other       => throw new IllegalStateException(other.toString)
          }
          bucketOf(v, n)
        }
      }
    }
  }
}
