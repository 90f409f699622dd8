package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MarketBasket

class MarketBasketSpec extends AnyFunSuite with SparkTestBase {

  test("lift is pair_count*n_baskets/(cnt_a*cnt_b) over deduped incidence") {
    import spark.implicits._
    // 4 baskets; {1,2} together twice of 4, item1 in 3, item2 in 2:
    // lift(1,2) = 2*4/(3*2) = 1.333333. Duplicate (b1,i1) row must not
    // inflate any count.
    val df = Seq(
      (10L, 1L), (10L, 1L), (10L, 2L),
      (20L, 1L), (20L, 2L),
      (30L, 1L), (30L, 3L),
      (40L, 3L))
      .toDF("basket", "item")
    val out = MarketBasket.pairLift(df, "basket", "item", minPairs = 1, topK = 10)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(out == Set(
      (1L, 2L, 2L, 1.333333),
      (1L, 3L, 1L, 0.666667)))
  }

  test("itemNeighbors: jaccard = inter/union over basket sets, both orientations, per-item topK") {
    import spark.implicits._
    // baskets of item 1: {10,20,30}; item 2: {10,20,40}; item 3: {10}
    val df = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L),
      (20L, 1L), (20L, 2L),
      (30L, 1L),
      (40L, 2L))
      .toDF("basket", "item")
    val out = MarketBasket.itemNeighbors(df, "basket", "item",
        minPairs = 1, topK = 1)
      .as[(Long, Long, Long, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // j(1,2) = 2/(3+3-2) = 0.5, j(1,3) = 1/3, j(2,3) = 1/3 → top-1:
    assert(out(1L) == ((2L, 2L, 0.5)))
    assert(out(2L) == ((1L, 2L, 0.5)))
    assert(out(3L) == ((1L, 1L, 0.333333))) // tie on j broken by id: 1 < 2
  }

  test("minPairs filters and topK keeps the highest-lift pairs") {
    import spark.implicits._
    val df = Seq(
      (1L, 100L), (1L, 200L),
      (2L, 100L), (2L, 200L),
      (3L, 100L), (3L, 300L),
      (4L, 400L), (4L, 500L))
      .toDF("basket", "item")
    val out2 = MarketBasket.pairLift(df, "basket", "item", minPairs = 2, topK = 10)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(out2.map(r => (r._1, r._2)) == Set((100L, 200L)))
    val top1 = MarketBasket.pairLift(df, "basket", "item", minPairs = 1, topK = 1)
      .as[(Long, Long, Long, Double)].collect().toSeq
    // lift(400,500)=1*4/(1*1)=4.0 beats lift(100,200)=2*4/(3*2)=1.33
    assert(top1 == Seq((400L, 500L, 1L, 4.0)))
  }

  test("tripleCounts: Apriori-pruned triples match brute-force supports, infrequent sub-pair blocks") {
    import spark.implicits._
    // b1={1,2,3} b2={1,2,3} b3={1,2,4} b4={1,2,3,4}:
    // frequent pairs at min 2: (1,2)4 (1,3)3 (2,3)3 (1,4)2 (2,4)2 — NOT (3,4).
    // triples: (1,2,3)→3 baskets, (1,2,4)→2; (1,3,4)/(2,3,4) blocked by (3,4).
    val df = Seq(
      (1L, 1L), (1L, 2L), (1L, 3L),
      (2L, 1L), (2L, 2L), (2L, 3L),
      (3L, 1L), (3L, 2L), (3L, 4L),
      (4L, 1L), (4L, 2L), (4L, 3L), (4L, 4L))
      .toDF("basket", "item")
    val out = MarketBasket.tripleCounts(df, "basket", "item",
        minCount = 2, topK = 10)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L, 3L, 3L), (1L, 2L, 4L, 2L)))
  }
}
