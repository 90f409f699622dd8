package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{ScoredId, TopK}

/** Algebraic properties of the bounded-heap aggregate: partial
  * aggregation is only correct if reduce/merge composition is
  * insensitive to how Spark partitions and orders the input — checked
  * here against the brute-force sort over deterministic LCG fixtures
  * (hand-rolled properties, PcaPropertySpec-style: the scalacheck
  * scalatest bridge isn't in the offline cache).
  */
class TopKSpec extends AnyFunSuite {

  private def lcgStream(seed0: Long, n: Int): Seq[ScoredId] = {
    var seed = seed0
    def next(): Long = { seed = seed * 6364136223846793005L + 1442695040888963407L; seed }
    (0 until n).map { i =>
      // Coarse score grid (0.00–0.99) to force plenty of score ties —
      // the id tie-break is exactly what must stay deterministic.
      val score = ((next() >>> 40) % 100) / 100.0
      ScoredId(i.toLong, score)
    }
  }

  private def bruteTopK(xs: Seq[ScoredId], k: Int): Seq[ScoredId] =
    xs.sortBy(s => (-s.score, s.id)).take(k)

  test("reduce-fold equals brute-force top-k for any k") {
    for (k <- Seq(1, 3, 10, 50); n <- Seq(0, 1, 7, 200)) {
      val agg = new TopK(k)
      val xs = lcgStream(k * 1000L + n, n)
      val folded = xs.foldLeft(agg.zero)(agg.reduce)
      assert(agg.finish(folded) == bruteTopK(xs, k), s"k=$k n=$n")
    }
  }

  test("any partition split + merge equals the unpartitioned fold") {
    val k = 5
    val agg = new TopK(k)
    val xs = lcgStream(987654321L, 120)
    val whole = xs.foldLeft(agg.zero)(agg.reduce)
    for (splits <- Seq(Seq(40, 80), Seq(1, 2, 3, 119), Seq(60))) {
      val bounds = (0 +: splits :+ xs.length).distinct.sorted
      val parts = bounds.sliding(2).map { case Seq(a, b) => xs.slice(a, b) }.toSeq
      val merged = parts.map(_.foldLeft(agg.zero)(agg.reduce))
        .foldLeft(agg.zero)(agg.merge)
      assert(merged == whole, s"splits=$splits")
    }
  }

  test("input order never changes the result (ties included)") {
    val k = 8
    val agg = new TopK(k)
    val xs = lcgStream(42L, 100)
    val expected = bruteTopK(xs, k)
    for (perm <- Seq(xs.reverse, xs.sortBy(_.score), xs.sortBy(_.id).reverse)) {
      assert(agg.finish(perm.foldLeft(agg.zero)(agg.reduce)) == expected)
    }
  }

  test("buffer never exceeds k entries (the boundedness contract)") {
    val k = 4
    val agg = new TopK(k)
    val xs = lcgStream(7L, 500)
    var b = agg.zero
    xs.foreach { x => b = agg.reduce(b, x); assert(b.length <= k) }
    assert(agg.merge(b, b).length <= k)
    // MULTISET semantics: duplicated input rows are distinct candidates
    // (exactly what a window rank over duplicated rows would keep), so
    // folding xs ++ xs must equal brute-force over xs ++ xs — not
    // deduplicate.
    val doubled = xs ++ xs
    assert(agg.finish(doubled.foldLeft(agg.zero)(agg.reduce)) ==
      bruteTopK(doubled, k))
  }
}
