package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join ("latest right row at or before each left row's time").
  *
  * The naive composition — equi-join on key + time inequality, then a row_number
  * window over the joined blowup — materializes |left| × |matching right| rows before
  * discarding all but one per left row. At 100 TB that intermediate is the bottleneck.
  *
  * This implementation instead UNIONs the two sides, shuffles ONCE on the key, sorts
  * each key partition by (time, side, tieBreak), and carries the most recent right
  * payload forward with `last(_, ignoreNulls = true)` over a running frame. Cost is a
  * single exchange + sort of |left| + |right| rows — the same shape Spark plans for a
  * sort-merge join — with no quadratic intermediate. Right rows sort before left rows
  * at equal times, so `rightTime == leftTime` matches (inclusive as-of).
  *
  * Caveat: right payload columns are carried independently, so a right row holding
  * NULL in a payload column would "see through" to the previous row's value for that
  * column only. Callers with nullable payloads should wrap them in a struct first.
  *
  * Reference semantics: SURVEY.md §2b "as-of join" row; the reference repo itself has
  * no as-of operator — this is part of the declared engine contract.
  */
object AsOfJoin {

  /** @param left      driving side; all its columns are preserved
    * @param right     lookup side; must share `key`; its OTHER columns become the
    *                  matched payload (rename before calling to avoid collisions)
    * @param key       equality key column name present on both sides
    * @param leftTime  event-time column on `left`
    * @param rightTime event-time column on `right`
    * @param tieBreak  right-side column ordering ties at equal rightTime (max wins)
    */
  def backward(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String, tieBreak: String): DataFrame = {
    val payload = right.columns.filterNot(c => c == key || c == rightTime).toSeq
    val leftCols = left.columns.toSeq

    val lTagged = payload.foldLeft(
      left.withColumn("__t", col(leftTime)).withColumn("__side", lit(1))
    ) { (df, c) => df.withColumn(c, lit(null).cast(right.schema(c).dataType)) }
      .withColumn("__tie", lit(null).cast(right.schema(tieBreak).dataType))

    val rTagged = leftCols.filterNot(_ == key).foldLeft(
      right.withColumn("__t", col(rightTime)).withColumn("__side", lit(0))
        .withColumn("__tie", col(tieBreak))
        .drop(rightTime)
    ) { (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType)) }

    val cols = (leftCols ++ payload ++ Seq("__t", "__side", "__tie")).map(col)
    val unioned = lTagged.select(cols: _*).unionByName(rTagged.select(cols: _*))

    val w = Window.partitionBy(col(key))
      .orderBy(col("__t"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1).drop("__t", "__side", "__tie")
  }
}
