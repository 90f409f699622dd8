package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bm25

/** BM25 scoring semantics: exact formula parity against a hand-computed
  * expectation, case folding, and term-presence ordering. Oracle
  * hash-parity is gated by tools/check_oracle.py (q_bm25).
  */
class Bm25Spec extends AnyFunSuite with SparkTestBase {

  private def bm25(tf: Double, dl: Double, n: Double, df: Double,
                   avgdl: Double): Double = {
    val idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    idf * (tf * (Bm25.K1 + 1.0)) /
      (tf + Bm25.K1 * (1.0 - Bm25.B + Bm25.B * dl / avgdl))
  }

  test("score matches the closed-form expectation on a tiny corpus") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark spark hash"),
      (2L, "hash table scan"),
      (3L, "window sort")).toDF("doc_id", "text")
    val out = Bm25.score(docs, "text", "doc_id", Seq("spark", "hash"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val avgdl = 8.0 / 3.0
    // Per-term scores sum in declaration order; round(_, 6) at the end.
    def exp(tfs: Double, tfh: Double, dl: Double) =
      BigDecimal(bm25(tfs, dl, 3, 1, avgdl) + bm25(tfh, dl, 3, 2, avgdl))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L) == ((3L, exp(2, 1, 3))))
    assert(out(2L) == ((3L, exp(0, 1, 3))))
    assert(out(3L) == ((2L, exp(0, 0, 2))))
    // No query term at all -> score exactly 0.
    assert(out(3L)._2 == 0.0)
  }

  test("matching is case-insensitive (documents lowercased)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Spark SPARK spark"),
      (2L, "spark spark spark")).toDF("doc_id", "text")
    val out = Bm25.score(docs, "text", "doc_id", Seq("spark"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(out(1L) == out(2L) && out(1L) > 0.0)
  }

  test("rejects non-lowercase, duplicate, or empty term sets") {
    import spark.implicits._
    val docs = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](Bm25.score(docs, "text", "doc_id", Seq("Spark")))
    intercept[IllegalArgumentException](Bm25.score(docs, "text", "doc_id", Seq("a", "a")))
    intercept[IllegalArgumentException](Bm25.score(docs, "text", "doc_id", Nil))
  }

  test("inverted-index path equals the direct scorer row-for-row") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark hash window spark"),
      (2L, "window filler words"),
      (3L, ""),
      (4L, "hash hash hash")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("bm25-idx").toString
    Bm25.buildIndex(docs, "text", "doc_id", dir)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    val terms = Seq("spark", "hash")
    assert(rows(Bm25.scoreFromIndex(spark, dir, terms)) ==
      rows(Bm25.score(docs, "text", "doc_id", terms)))
    // a query term absent from the corpus: df=0 on both paths, identical
    val terms2 = Seq("spark", "absentterm")
    assert(rows(Bm25.scoreFromIndex(spark, dir, terms2)) ==
      rows(Bm25.score(docs, "text", "doc_id", terms2)))
  }

  test("rarer term contributes more than a common one at equal tf") {
    import spark.implicits._
    // 'rare' in 1/10 docs, 'common' in 9/10; doc 1 has both once at the
    // same dl -> the rare term's contribution must dominate.
    val docs = ((2L to 9L).map(i => (i, "common filler words here")) ++ Seq(
      (1L, "rare common pad padd"),
      (10L, "none of these terms"))).toDF("doc_id", "text")
    val rare = Bm25.score(docs, "text", "doc_id", Seq("rare"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    val common = Bm25.score(docs, "text", "doc_id", Seq("common"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(rare(1L) > common(1L))
  }

  test("appendToIndex: segmented index scores identically to a full rebuild") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = (1L to 20L).map(i =>
      (i, s"spark hash window doc$i " + ("pad " * (i % 5).toInt).trim))
      .toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    val full = java.nio.file.Files.createTempDirectory("bm25full").toString
    Bm25.buildIndex(docs, "text", "doc_id", full)
    val segd = java.nio.file.Files.createTempDirectory("bm25seg").toString
    Bm25.buildIndex(docs.filter(col("doc_id") <= 7), "text", "doc_id", segd)
    Bm25.appendToIndex(docs.filter(col("doc_id") > 7 && col("doc_id") <= 14),
      "text", "doc_id", segd)
    Bm25.appendToIndex(docs.filter(col("doc_id") > 14), "text", "doc_id", segd)
    // three segments, one truth: df/n/sumdl are additive over disjoint
    // doc sets, so the segmented read equals the one-shot index AND the
    // direct scorer.
    val terms = Seq("spark", "pad")
    assert(rows(Bm25.scoreFromIndex(spark, segd, terms)) ==
      rows(Bm25.scoreFromIndex(spark, full, terms)))
    assert(rows(Bm25.scoreFromIndex(spark, segd, terms)) ==
      rows(Bm25.score(docs, "text", "doc_id", terms)))

    // The disjoint-doc-set contract is enforced, not assumed: a batch
    // overlapping the indexed ids must fail loudly (a silent re-append
    // double-counts df/n/sumdl and corrupts every score), and the
    // rejected append must leave the index unchanged.
    val before = rows(Bm25.scoreFromIndex(spark, segd, terms))
    val ex = intercept[IllegalArgumentException] {
      Bm25.appendToIndex(docs.filter(col("doc_id") >= 14), "text",
        "doc_id", segd)
    }
    assert(ex.getMessage.contains("already indexed"))
    assert(rows(Bm25.scoreFromIndex(spark, segd, terms)) == before)

    // A FRESH index dir is a legal append target (ADVICE r12): with no
    // doclen relation there is nothing to overlap with, and the append
    // creates the first segment instead of throwing path-not-found.
    val fresh = java.nio.file.Files.createTempDirectory("bm25fresh").toString + "/idx"
    Bm25.appendToIndex(docs.filter(col("doc_id") <= 7), "text", "doc_id", fresh)
    Bm25.appendToIndex(docs.filter(col("doc_id") > 7), "text", "doc_id", fresh)
    assert(rows(Bm25.scoreFromIndex(spark, fresh, terms)) ==
      rows(Bm25.score(docs, "text", "doc_id", terms)))
  }
}
