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
  * payload across with `last(_, ignoreNulls = true)` over a running frame (backward)
  * or `first` over the mirrored frame (forward). Cost is a single exchange + sort of
  * |left| + |right| rows — the same shape Spark plans for a sort-merge join — with no
  * quadratic intermediate. Side ordering makes equal times match inclusively: right
  * rows sort before left rows for backward, after them for forward.
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
    * to the SMALLEST tieBreak. Same single-shuffle shape as [[backward]]. */
  def forward(left: DataFrame, right: DataFrame, key: String,
              leftTime: String, rightTime: String, tieBreak: String): DataFrame =
    asof(left, right, key, leftTime, rightTime, tieBreak, forward = true)

  private def asof(left: DataFrame, right: DataFrame, key: String,
                   leftTime: String, rightTime: String, tieBreak: String,
                   forward: Boolean): DataFrame = {
    val payload = right.columns.filterNot(c => c == key || c == rightTime).toSeq
    val leftCols = left.columns.toSeq
    // side ordering at equal __t decides inclusivity: backward wants rights first
    // (so an equal-time right is "before or at"), forward wants rights last
    val (leftSide, rightSide) = if (forward) (0, 1) else (1, 0)

    val lTagged = payload.foldLeft(
      left.withColumn("__t", col(leftTime)).withColumn("__side", lit(leftSide))
    ) { (df, c) => df.withColumn(c, lit(null).cast(right.schema(c).dataType)) }
      .withColumn("__tie", lit(null).cast(right.schema(tieBreak).dataType))

    val rTagged = leftCols.filterNot(_ == key).foldLeft(
      right.withColumn("__t", col(rightTime)).withColumn("__side", lit(rightSide))
        .withColumn("__tie", col(tieBreak))
        .drop(rightTime)
    ) { (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType)) }

    val cols = (leftCols ++ payload ++ Seq("__t", "__side", "__tie")).map(col)
    val unioned = lTagged.select(cols: _*).unionByName(rTagged.select(cols: _*))

    val ordered = Window.partitionBy(col(key))
      .orderBy(col("__t"), col("__side"), col("__tie"))
    // backward: carry the most recent right value forward -> last over a running
    // frame (ties: larger __tie is later in frame, wins). forward: take the next
    // right value -> first over the mirrored frame (ties: smaller __tie wins).
    val w =
      if (forward) ordered.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      else ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carry: Column => Column =
      if (forward) first(_, ignoreNulls = true).over(w)
      else last(_, ignoreNulls = true).over(w)
    val carried = payload.foldLeft(unioned) { (df, c) => df.withColumn(c, carry(col(c))) }
    carried.filter(col("__side") === leftSide).drop("__t", "__side", "__tie")
  }
}
