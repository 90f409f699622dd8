package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Profile

/** Null-handling and failure branches of the profiler/expectation gate —
  * the oracle fixture (documents) is null-free and unique-keyed, so the
  * paths that make the operator useful (nulls counted, checks FAILING)
  * are pinned here.
  */
class ProfileSpec extends AnyFunSuite with SparkTestBase {

  private def fixture = {
    import spark.implicits._
    // 6 rows: id 3 duplicated, two null texts, one null score.
    Seq(
      (1L, Option("aaaa"), Option(10.0)),
      (2L, None, Option(20.0)),
      (3L, Option("bb"), None),
      (3L, Option("cccccc"), Option(40.0)),
      (4L, None, Option(50.0)),
      (5L, Option("dd"), Option(60.0))
    ).toDF("id", "text", "score")
  }

  test("profile counts nulls and distincts per column, length stats for strings") {
    val out = Profile.profile(fixture, numCols = Seq("id", "score"), strCols = Seq("text"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("id", "score", "text"))
    val id = out("id")
    assert(id.getLong(1) == 0L && id.getLong(2) == 5L)      // n_nulls, n_distinct
    assert(id.getDouble(3) == 1.0 && id.getDouble(4) == 5.0)
    val score = out("score")
    assert(score.getLong(1) == 1L && score.getLong(2) == 5L)
    assert(score.getDouble(5) == 36.0)                       // mean over non-nulls
    val text = out("text")
    assert(text.getLong(1) == 2L && text.getLong(2) == 4L)
    assert(text.getDouble(3) == 2.0 && text.getDouble(4) == 6.0)  // length stats
    assert(text.getLong(6) == 6L)                            // n_rows counts all
  }

  test("expectations fail loudly on duplicate keys and null fractions over bound") {
    val out = Profile.expectations(fixture, keyCol = "id",
      nullBoundedCols = Seq("text", "score"), minRows = 10L, maxNullFraction = 0.2)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("row_count_min").getInt(3) == 0)              // 6 < 10
    assert(out("pk_unique:id").getInt(3) == 0)               // id 3 duplicated
    assert(out("pk_unique:id").getDouble(1) == 5.0)          // distinct count surfaced
    assert(out("null_fraction_max:text").getInt(3) == 0)     // 2/6 ≈ 0.33 > 0.2
    assert(out("null_fraction_max:score").getInt(3) == 1)    // 1/6 ≈ 0.17 ≤ 0.2
    assert(out("null_fraction_max:score").getDouble(1) == 0.166667)
  }
}
