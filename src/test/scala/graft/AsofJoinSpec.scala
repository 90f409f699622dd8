package graft

import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

import graft.operators.AsofJoin

class AsofJoinSpec extends AnyFunSuite with SparkTestBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoin matches the latest right row at-or-before each left row") {
    import spark.implicits._
    val left = Seq(
      (100L, 1L, ts("2024-01-01 00:00:01")), // before any purchase → null
      (101L, 1L, ts("2024-01-01 00:00:02")), // tie with purchase@2 → 20.0 (inclusive)
      (102L, 1L, ts("2024-01-01 00:00:03")), // between → still 20.0
      (103L, 1L, ts("2024-01-01 00:00:06")), // after purchase@5 → 50.0
      (104L, 2L, ts("2024-01-01 00:00:09"))  // user with no purchases → null
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (1L, ts("2024-01-01 00:00:02"), 20.0),
      (1L, ts("2024-01-01 00:00:05"), 50.0)
    ).toDF("user_id", "ts", "value")

    val out = AsofJoin.asofJoin(left, right, Seq("user_id"), "ts", Seq("value"))
    assert(out.columns.toSeq == Seq("event_id", "user_id", "ts", "asof_value"))
    val got = out.select("event_id", "asof_value")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got == Map(
      100L -> None,
      101L -> Some(20.0),
      102L -> Some(20.0),
      103L -> Some(50.0),
      104L -> None))
  }

  test("asofJoin carries multi-column payload from one right row") {
    import spark.implicits._
    val left = Seq((1L, 7L, ts("2024-01-01 00:00:10"))).toDF("id", "k", "ts")
    val right = Seq(
      (7L, ts("2024-01-01 00:00:01"), 1.0, "a"),
      (7L, ts("2024-01-01 00:00:05"), 2.0, "b")
    ).toDF("k", "ts", "v", "tag")
    val out = AsofJoin.asofJoin(left, right, Seq("k"), "ts", Seq("v", "tag"))
      .select("asof_v", "asof_tag").head()
    assert((out.getDouble(0), out.getString(1)) == ((2.0, "b")))
  }
}
