package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Outliers

class OutliersSpec extends AnyFunSuite with SparkTestBase {

  test("mahalanobis2: joint outlier tops the ranking despite central marginals") {
    import spark.implicits._
    // Points near the y=x line; (25, 5) is central in x AND inside the
    // y range, but jointly impossible given the strong correlation.
    val pts = Seq(
      (1L, 10.0, 11.0), (2L, 20.0, 19.0), (3L, 30.0, 31.0),
      (4L, 40.0, 39.0), (5L, 50.0, 51.0), (6L, 25.0, 5.0))
      .toDF("id", "x", "y")
    val out = Outliers.mahalanobis2(pts, "id", "x", "y", topK = 6)
      .as[(Long, Double, Double, Double)].collect()
    assert(out.head._1 == 6L)
    // d² is non-negative and the trace identity Σd² = 2n holds exactly
    // for the population covariance (up to the 6-dp rounding).
    assert(out.forall(_._4 >= 0.0))
    assert(math.abs(out.map(_._4).sum - 12.0) < 1e-3)
    // the ranking is descending
    assert(out.map(_._4).sliding(2).forall(p => p(0) >= p(1)))

    // topK truncation keeps the head of the same order.
    val top2 = Outliers.mahalanobis2(pts, "id", "x", "y", topK = 2)
      .as[(Long, Double, Double, Double)].collect()
    assert(top2.map(_._1).toSeq == out.map(_._1).take(2).toSeq)
  }

  test("mahalanobis2: singular covariance (constant column) yields null scores") {
    import spark.implicits._
    val flat = Seq((1L, 1.0, 7.0), (2L, 2.0, 7.0), (3L, 3.0, 7.0))
      .toDF("id", "x", "y")
    val out = Outliers.mahalanobis2(flat, "id", "x", "y", topK = 3)
      .as[(Long, Double, Double, Option[Double])].collect()
    assert(out.length == 3 && out.forall(_._4.isEmpty))
    // null scores fall back to id order
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L))
  }
}
