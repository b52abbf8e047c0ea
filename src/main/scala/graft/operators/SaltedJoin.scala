package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY.md scale toolbox; AQE's skew-join
  * handles sort-merge skew at runtime, but salting is the deterministic, plannable
  * form — and the only option when the skew sits under an aggregation).
  *
  * The skewed (large) side gets a salt in [0, n) derived from each row's IDENTITY
  * (hash of monotonically_increasing_id — see [[SaltedJoin.rowSalt]]): deterministic
  * under task retry, no RNG, and exact-duplicate rows of the hot key still spread
  * (content hashing would send all duplicates to one salt). The small side is
  * replicated n ways with an exploded salt column. The join key becomes (key, salt):
  * a hot key's rows now spread across n reducers instead of one.
  */
object SaltedJoin {

  /** Row-identity salt: hashing row CONTENT would send exact-duplicate rows of the
    * hot key (the common case in log data) to one salt, defeating the spread.
    * monotonically_increasing_id is (partition << 33 | row-in-partition), which is
    * stable across task retries as long as the upstream partitioning is
    * deterministic — the same condition any exactly-once sink already needs. */
  private def rowSalt(n: Int) = pmod(hash(monotonically_increasing_id()), lit(n))

  /** Inner equi-join of `big` (skewed on `key`) with `small`, salted `n` ways.
    * `small` must not contain columns named `__salt`. */
  def inner(big: DataFrame, small: DataFrame, key: String, n: Int): DataFrame = {
    require(n > 0, "salt fan-out must be positive")
    val saltedBig = big.withColumn("__salt", rowSalt(n))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(n - 1))))
    saltedBig.join(saltedSmall,
        saltedBig(key) === saltedSmall(key) && saltedBig("__salt") === saltedSmall("__salt"))
      .drop(saltedSmall(key)).drop("__salt")
  }

  /** Skew-safe grouped aggregation: two-phase (salted partial, then final). The
    * caller's aggregates must be algebraic (sum/count/min/max style) — expressed here
    * for the common sum/count case used by the declared queries. */
  def groupSumCount(df: DataFrame, key: String, valueCol: String, n: Int): DataFrame = {
    val salted = df.withColumn("__salt", rowSalt(n))
    salted
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(sum(col("__psum")).as("sum"), sum(col("__pcnt")).as("count"))
  }
}
