package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, SortedNeighborhood}

class SortedNeighborhoodSpec extends AnyFunSuite with SparkTestBase {

  test("globalRank assigns contiguous 0-based ranks in total sort order") {
    import spark.implicits._
    val df = Seq((3L, "c"), (1L, "a"), (2L, "a"), (4L, "b"))
      .toDF("id", "k")
    val ranked = SortedNeighborhood.globalRank(df.repartition(3),
        Seq("k", "id"), "rank")
      .as[(Long, String, Long)].collect().sortBy(_._3)
    assert(ranked.map(_._3).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(ranked.map(_._1).toSeq == Seq(1L, 2L, 4L, 3L)) // a,a,b,c; id ties
  }

  test("pairs finds neighbors inside the window, misses beyond it") {
    import spark.implicits._
    // Sort key = first 10 chars. Docs 1/2 share a prefix (adjacent);
    // doc 9 is an identical twin of doc 1 but sorts far away with a
    // window of 2 only if something separates them — here 'mmm'/'zzz'
    // rows pad the sorted distance.
    val df = Seq(
      (1L, "aaa bbb ccc ddd eee"),
      (2L, "aaa bbb ccc ddd fff"),
      (5L, "mmm nnn ooo ppp qqq"),
      (6L, "nnn ooo ppp qqq rrr"),
      (9L, "zzz bbb ccc ddd eee"))
      .toDF("doc_id", "text")
    val close = SortedNeighborhood.pairs(df, "text", "doc_id",
        keyLen = 10, window = 2, n = 3, threshold = 0.4)
      .as[(Long, Long, Double)].collect().toSet
    // adjacent pairs: (1,2) share 2 of 4 distinct shingles → 0.5, and
    // (5,6) likewise overlap on 2 of 4 → 0.5; (9) pairs with nothing
    // adjacent.
    assert(close.map(p => (p._1, p._2)) == Set((1L, 2L), (5L, 6L)))
    assert(close.forall(_._3 == 0.5))
    // widening the window to cover the whole set recovers the pair the
    // prefix key scattered: (1,9) overlap on {bbb ccc ddd, ccc ddd eee}
    // → 2/4 = 0.5, but doc 9's 'zzz' prefix sorts it far from doc 1.
    val wide = SortedNeighborhood.pairs(df, "text", "doc_id",
        keyLen = 10, window = 5, n = 3, threshold = 0.4)
      .as[(Long, Long, Double)].collect().toSet
    assert(wide == close + ((1L, 9L, 0.5)))
  }

  test("each unordered pair is emitted exactly once") {
    import spark.implicits._
    val df = Seq(
      (1L, "aaa bbb ccc ddd"),
      (2L, "aaa bbb ccc ddd"),
      (3L, "aaa bbb ccc ddd"))
      .toDF("doc_id", "text")
    val out = SortedNeighborhood.pairs(df, "text", "doc_id",
        keyLen = 10, window = 3, n = 3, threshold = 0.9)
      .as[(Long, Long, Double)].collect()
    assert(out.length == 3)
    assert(out.map(p => (p._1, p._2)).toSet ==
      Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("recallAudit: SNM pairs are a subset of truth; recall = found/truth") {
    import spark.implicits._
    val df = Seq(
      (1L, "aaa bbb ccc ddd eee"),
      (2L, "aaa bbb ccc ddd fff"),
      // same similarity but opposite prefixes → truth pair SNM misses
      // at window 2 (zzz row sorts last, qqq separates it from aaa's)
      (3L, "qqq rrr sss ttt uuu"),
      (9L, "zzz bbb ccc ddd eee"))
      .toDF("doc_id", "text")
    val Array((nTruth, nFound, recall)) =
      SortedNeighborhood.recallAudit(df, "text", "doc_id",
          keyLen = 10, window = 2, n = 3, threshold = 0.4, maxDocId = 100)
        .as[(Long, Long, Double)].collect()
    val truth = Dedup.ngramJaccardPairs(df, "text", "doc_id", 3, 0.4, 100)
      .count()
    assert(nTruth == truth)
    assert(nFound <= nTruth)
    assert(recall == math.rint(nFound.toDouble / nTruth * 1e6) / 1e6)
  }
}
