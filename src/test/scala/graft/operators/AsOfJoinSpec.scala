package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** As-of join semantics: inclusive backward match, tie-breaking, unmatched lefts. */
class AsOfJoinSpec extends SparkSpec {

  test("forward as-of picks the earliest right row at or after each left time") {
    import spark.implicits._
    val left = Seq(
      ("u1", 10L, "L1"),  // equal-time right row at 10 -> inclusive match
      ("u1", 16L, "L2"),  // next right is 20
      ("u1", 30L, "L3"),  // after every right row -> no match
      ("u2", 1L, "L4")    // key with no right rows
    ).toDF("k", "t", "lname")
    val right = Seq(
      ("u1", 10L, 100L),
      ("u1", 20L, 200L),
      ("u1", 20L, 201L)   // tie at t=20: SMALLEST tieBreak wins going forward
    ).toDF("k", "rt", "rid")

    val out = AsOfJoin.forward(left, right, key = "k",
      leftTime = "t", rightTime = "rt", tieBreak = "rid")
      .select("lname", "rid").as[(String, Option[Long])].collect().toMap

    assert(out("L1") == Some(100L))
    assert(out("L2") == Some(200L))
    assert(out("L3") == None)
    assert(out("L4") == None)
    assert(out.size == 4)
  }

  test("null keys and null times never match, in either direction") {
    import spark.implicits._
    val left = Seq(
      (Some("u1"), Some(10L), "L1"),   // normal: matches
      (None, Some(10L), "L2"),         // null key -> no match
      (Some("u1"), None, "L3"),        // null time -> no match
      (None, None, "L4")               // both null -> no match
    ).toDF("k", "t", "lname")
    val right = Seq(
      (Some("u1"), Some(5L), Some(100L)),
      (None, Some(1L), Some(666L)),    // null-key right: must never be carried
      (Some("u1"), None, Some(777L))   // null-time right: must never be carried
    ).toDF("k", "rt", "rid")

    for (dir <- Seq("backward", "forward")) {
      val joined =
        if (dir == "backward")
          AsOfJoin.backward(left, right, "k", "t", "rt", "rid")
        else AsOfJoin.forward(left, right.withColumn("rt", col("rt") + 10), "k", "t", "rt", "rid")
      val out = joined.select("lname", "rid").as[(String, Option[Long])].collect().toMap
      assert(out.size == 4, s"$dir must preserve all left rows")
      assert(out("L1") == Some(100L), s"$dir: normal row must match")
      Seq("L2", "L3", "L4").foreach { l =>
        assert(out(l) == None, s"$dir: $l must not match (got ${out(l)})")
      }
    }
  }

  test("backward as-of picks the latest right row at or before each left time") {
    import spark.implicits._
    val left = Seq(
      ("u1", 10L, "L1"),
      ("u1", 20L, "L2"),
      ("u1", 5L, "L3"), // before any right row -> no match
      ("u2", 50L, "L4") // key with no right rows at all
    ).toDF("k", "t", "lname")
    val right = Seq(
      ("u1", 10L, 100L), // equal time: inclusive match for L1
      ("u1", 15L, 200L),
      ("u1", 15L, 201L) // tie at t=15: larger tieBreak wins
    ).toDF("k", "rt", "rid")

    val out = AsOfJoin.backward(left, right, key = "k",
      leftTime = "t", rightTime = "rt", tieBreak = "rid")
      .select("lname", "rid").as[(String, Option[Long])].collect().toMap

    assert(out("L1") == Some(100L)) // rt == t matches (inclusive)
    assert(out("L2") == Some(201L)) // latest <= 20 is t=15, tie -> rid 201
    assert(out("L3") == None)
    assert(out("L4") == None)
    assert(out.size == 4)
  }

  test("matches the join+window reference implementation on random data") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val rng = new scala.util.Random(99)
    val left = (0 until 500).map(i =>
      ("k" + rng.nextInt(20), rng.nextInt(1000).toLong, i.toLong)).toDF("k", "t", "lid")
    val right = (0 until 800).map(i =>
      ("k" + rng.nextInt(25), rng.nextInt(1000).toLong, i.toLong)).toDF("k", "rt", "rid")

    val fast = AsOfJoin.backward(left, right, "k", "t", "rt", "rid")
      .select(col("lid"), col("rid")).as[(Long, Option[Long])].collect().toMap

    // reference: equi-join + time filter + row_number (the quadratic formulation)
    val w = Window.partitionBy(col("lid")).orderBy(col("rt").desc, col("rid").desc)
    val slow = left.join(right.withColumnRenamed("k", "k2"),
        col("k") === col("k2") && col("rt") <= col("t"), "left")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("lid"), col("rid")).as[(Long, Option[Long])].collect().toMap

    assert(fast.size == 500 && slow.size == 500)
    assert(fast == slow)

    // forward direction against its own quadratic reference (earliest rt >= t,
    // ties -> smallest rid)
    val fastF = AsOfJoin.forward(left, right, "k", "t", "rt", "rid")
      .select(col("lid"), col("rid")).as[(Long, Option[Long])].collect().toMap
    val wF = Window.partitionBy(col("lid")).orderBy(col("rt").asc, col("rid").asc)
    val slowF = left.join(right.withColumnRenamed("k", "k2"),
        col("k") === col("k2") && col("rt") >= col("t"), "left")
      .withColumn("rn", row_number().over(wF))
      .filter(col("rn") === 1)
      .select(col("lid"), col("rid")).as[(Long, Option[Long])].collect().toMap
    assert(fastF.size == 500 && slowF.size == 500)
    assert(fastF == slowF)
  }

  test("result preserves all left rows and columns exactly once") {
    import spark.implicits._
    val left = (1 to 100).map(i => ("k" + i % 5, i.toLong, i)).toDF("k", "t", "payload")
    val right = (1 to 20).map(i => ("k" + i % 5, i.toLong * 3, i.toLong)).toDF("k", "rt", "rid")
    val out = AsOfJoin.backward(left, right, "k", "t", "rt", "rid")
    assert(out.count() == 100)
    assert(out.columns.toSet == Set("k", "t", "payload", "rid"))
  }
}
