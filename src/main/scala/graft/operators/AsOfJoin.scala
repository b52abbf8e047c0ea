package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of joins: "latest right row at or before each left row's time" (backward)
  * and "earliest right row at or after" (forward).
  *
  * The naive composition — equi-join on key + time inequality, then a row_number
  * window over the joined blowup — materializes |left| × |matching right| rows before
  * discarding all but one per left row. At 100 TB that intermediate is the bottleneck.
  *
  * This implementation instead UNIONs the two sides, shuffles ONCE on the key, sorts
  * each key partition by (time, side, tieBreak), and carries the nearest right
  * payload across with `last(_, ignoreNulls = true)` over a RUNNING frame. The
  * forward direction reuses the same running frame over a time-DESCENDING sort
  * rather than a (currentRow, unboundedFollowing) frame: Spark executes
  * unbounded-following frames by recomputing the aggregate from each row to the
  * partition end — O(k²) per key of size k — while the running frame is O(k).
  * Cost in both directions is a single exchange + sort of |left| + |right| rows —
  * the same shape Spark plans for a sort-merge join — with no quadratic
  * intermediate. Right rows sort before left rows at equal times in both
  * directions, so `rightTime == leftTime` matches (inclusive as-of).
  *
  * Null semantics match the SQL formulation (`l.key = r.key AND r.t <= l.t`):
  * rows with a null key or null time can never equi-match, so null-key/time right
  * rows are dropped and null-key/time left rows bypass the window entirely and
  * come back with an all-null payload — without the bypass, `partitionBy` would
  * group null keys together and the carry would fabricate matches SQL never
  * produces.
  *
  * Caveat: right payload columns are carried independently, so a right row holding
  * NULL in a payload column would "see through" to an adjacent row's value for that
  * column only. Callers with nullable payloads should wrap them in a struct first.
  *
  * Reference semantics: SURVEY.md §2b "as-of join" row; the reference repo itself has
  * no as-of operator — this is part of the declared engine contract.
  */
object AsOfJoin {

  /** Latest right row at or before each left time; ties at equal rightTime resolve
    * to the LARGEST tieBreak.
    *
    * @param left      driving side; all its columns are preserved
    * @param right     lookup side; must share `key`; its OTHER columns become the
    *                  matched payload (rename before calling to avoid collisions)
    * @param key       equality key column name present on both sides
    * @param leftTime  event-time column on `left`
    * @param rightTime event-time column on `right`
    * @param tieBreak  right-side column ordering ties at equal rightTime
    */
  def backward(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String, tieBreak: String): DataFrame =
    asof(left, right, key, leftTime, rightTime, tieBreak, forward = false)

  /** Earliest right row at or after each left time; ties at equal rightTime resolve
    * to the SMALLEST tieBreak. Same single-shuffle, linear-time shape as
    * [[backward]] (descending sort + running frame, not an unbounded-following
    * frame). */
  def forward(left: DataFrame, right: DataFrame, key: String,
              leftTime: String, rightTime: String, tieBreak: String): DataFrame =
    asof(left, right, key, leftTime, rightTime, tieBreak, forward = true)

  private def asof(left: DataFrame, right: DataFrame, key: String,
                   leftTime: String, rightTime: String, tieBreak: String,
                   forward: Boolean): DataFrame = {
    val payload = right.columns.filterNot(c => c == key || c == rightTime).toSeq
    val leftCols = left.columns.toSeq

    // SQL equi-join semantics: null keys/times never match. Matchable rows ride
    // the window; unmatchable LEFT rows are preserved with a null payload and
    // re-unioned; unmatchable RIGHT rows are dropped.
    val matchableL = left.filter(col(key).isNotNull && col(leftTime).isNotNull)
    val unmatchedL = payload.foldLeft(
      left.filter(col(key).isNull || col(leftTime).isNull)
    ) { (df, c) => df.withColumn(c, lit(null).cast(right.schema(c).dataType)) }
    val matchableR = right.filter(col(key).isNotNull && col(rightTime).isNotNull)

    val lTagged = payload.foldLeft(
      matchableL.withColumn("__t", col(leftTime)).withColumn("__side", lit(1))
    ) { (df, c) => df.withColumn(c, lit(null).cast(right.schema(c).dataType)) }
      .withColumn("__tie", lit(null).cast(right.schema(tieBreak).dataType))

    val rTagged = leftCols.filterNot(_ == key).foldLeft(
      matchableR.withColumn("__t", col(rightTime)).withColumn("__side", lit(0))
        .withColumn("__tie", col(tieBreak))
        .drop(rightTime)
    ) { (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType)) }

    val cols = (leftCols ++ payload ++ Seq("__t", "__side", "__tie")).map(col)
    val unioned = lTagged.select(cols: _*).unionByName(rTagged.select(cols: _*))

    // Time ascending for backward, descending for forward; rights (__side 0) sort
    // before lefts at equal times in both, keeping equal-time matches inclusive.
    // last() over the running frame then yields the nearest-in-time right row,
    // and the tie sort direction makes it the max (backward) / min (forward)
    // tieBreak among equal right times.
    val (tSort, tieSort) =
      if (forward) (col("__t").desc, col("__tie").desc)
      else (col("__t").asc, col("__tie").asc)
    val w = Window.partitionBy(col(key))
      .orderBy(tSort, col("__side"), tieSort)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1).drop("__t", "__side", "__tie")
      .unionByName(unmatchedL)
  }
}
