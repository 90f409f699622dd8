package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeJoin

class RangeJoinSpec extends AnyFunSuite with SparkTestBase {

  test("bucketedIntervalJoin equals the exact containment predicate") {
    import spark.implicits._
    val points = Seq(0L, 5L, 10L, 15L, 25L, 99L, 100L, 101L)
      .toDF("p").withColumn("p_us", $"p").drop("p")
    val intervals = Seq(
      (1L, 0L, 10L),    // [0,10): hits 0, 5 — not 10 (exclusive end)
      (2L, 9L, 31L),    // spans 4 buckets of width 8
      (3L, 100L, 100L), // empty → nothing
      (4L, 95L, 105L)   // hits 99, 100, 101
    ).toDF("iid", "s_us", "e_us")

    val got = RangeJoin.bucketedIntervalJoin(points, "p_us",
        intervals, "s_us", "e_us", bucketUs = 8L)
      .select("iid", "p_us").as[(Long, Long)].collect().toSet
    val expected = Set(
      (1L, 0L), (1L, 5L),
      (2L, 10L), (2L, 15L), (2L, 25L),
      (4L, 99L), (4L, 100L), (4L, 101L))
    assert(got == expected)
  }

  test("bucketedIntervalJoin emits each matching pair exactly once") {
    import spark.implicits._
    val points = Seq(50L).toDF("p_us")
    // Interval spanning many buckets: the containing point matches once.
    val intervals = Seq((9L, 0L, 1000L)).toDF("iid", "s_us", "e_us")
    val got = RangeJoin.bucketedIntervalJoin(points, "p_us",
      intervals, "s_us", "e_us", bucketUs = 7L)
    assert(got.count() == 1)
  }
}
