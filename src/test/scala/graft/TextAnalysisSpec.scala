package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextAnalysis

class TextAnalysisSpec extends AnyFunSuite with SparkTestBase {

  private def one(text: String) = {
    import spark.implicits._
    Seq(text).toDF("text")
  }

  test("token count handles empty, padded, and multi-space text") {
    import spark.implicits._
    val df = Seq("", "   ", "one", " a  b   c ", "x y").toDF("text")
      .select(TextAnalysis.tokenCount(col("text")).as("n"))
    assert(df.as[Long].collect().toSeq == Seq(0L, 0L, 1L, 3L, 2L))
  }

  test("bpe-ish token count splits letter runs, digit runs, symbols") {
    import spark.implicits._
    val df = one("ab12cd!x").select(TextAnalysis.bpeTokenCount(col("text")).as("n"))
    // ab | 12 | cd | ! | x
    assert(df.as[Long].head() == 5L)
  }

  test("stopword and word counts count duplicate occurrences") {
    import spark.implicits._
    val df = one("the cat the hat a cat")
    assert(df.select(TextAnalysis.wordCount(col("text"), "the")).as[Long].head() == 2L)
    assert(df.select(TextAnalysis.wordCount(col("text"), "cat")).as[Long].head() == 2L)
    assert(df.select(TextAnalysis.stopwordCount(col("text"))).as[Long].head() == 3L)
  }

  test("quality score is in [0,1] and 0-token text is safe") {
    import spark.implicits._
    val df = Seq("", "the the the", "a quick brown fox jumps over stuff")
      .toDF("text").select(TextAnalysis.qualityScore(col("text")).as("q"))
    df.as[Double].collect().foreach(q => assert(q >= 0.0 && q <= 1.0))
  }

  test("langId picks marker-majority language, und for no markers") {
    import spark.implicits._
    val df = Seq("the cat and a dog", "el los una perro", "xyz qqq", "")
      .toDF("text").select(TextAnalysis.langId(col("text")).as("l"))
    assert(df.as[String].collect().toSeq == Seq("en", "es", "und", "und"))
  }

  test("fingerprint equals the hand-computed rolling hash") {
    import spark.implicits._
    val text = "ab c"
    val expected = text.foldLeft(0L)((acc, ch) =>
      (acc * TextAnalysis.FpBase + ch.toLong) % TextAnalysis.FpMod)
    val got = one(text).select(TextAnalysis.fingerprint(col("text"))).as[Long].head()
    assert(got == expected)
    // empty text folds to the init value
    assert(one("").select(TextAnalysis.fingerprint(col("text"))).as[Long].head() == 0L)
  }

  test("null text: stats are null and quality/lang gates drop the row") {
    import spark.implicits._
    // General-engine posture (the fixtures carry no nulls): every text
    // function propagates null rather than throwing, and the standard
    // curation predicates (lang === x, quality >= q) evaluate to null
    // ⇒ filtered out — null documents cannot leak into a curated set.
    val df = Seq((1L, null: String), (2L, "the quick fox")).toDF("doc_id", "text")
      .withColumn("_w", TextAnalysis.tokens(col("text")))
      .select(col("doc_id"),
        TextAnalysis.tokenCountOf(col("_w")).as("n_tok"),
        TextAnalysis.qualityScoreOf(col("text"), col("_w")).as("q"),
        TextAnalysis.langIdOf(col("_w")).as("lang"),
        TextAnalysis.fingerprint(col("text")).as("fp"))
    val rows = df.collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).isNullAt(1) && rows(1L).isNullAt(2) && rows(1L).isNullAt(4))
    assert(!rows(2L).isNullAt(1))
    val kept = df.filter(col("lang") === "en" && col("q") >= 0.0)
      .select("doc_id").as[Long].collect().toSeq
    assert(kept == Seq(2L))
  }

  test("canonical text collapses case, punctuation, and spacing variants") {
    import spark.implicits._
    val df = Seq(
      "The Quick, Brown Fox!",
      "the   quick brown--fox",
      "  THE QUICK(brown)FOX  ",
      "a different document").toDF("text")
      .select(TextAnalysis.canonicalText(col("text")).as("c"))
    val canon = df.as[String].collect().toSeq
    assert(canon.take(3).toSet == Set("the quick brown fox"))
    assert(canon(3) == "a different document")
    // empty and punctuation-only inputs canonicalize to the empty string
    val edge = Seq("", "?!...", "  \t ").toDF("text")
      .select(TextAnalysis.canonicalText(col("text")).as("c"))
    assert(edge.as[String].collect().forall(_ == ""))
  }

  test("readability: hand-worked FK grade; empty text scores via the clamped divisors") {
    import spark.implicits._
    val docs = Seq((1L, "The cat sat. It ran!"), (2L, "")).toDF("doc_id", "text")
    val out = docs
      .withColumn("_w", TextAnalysis.tokens(col("text")))
      .withColumn("_r", TextAnalysis.readabilityOf(col("text"), col("_w")))
      .select(col("doc_id"), col("_r.n_words"), col("_r.n_sentences"),
        col("_r.n_syllables"), col("_r.fk_grade"))
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // 5 tokens, 2 sentence runs, 5 vowel groups:
    // 0.39*(5/2) + 11.8*(5/5) - 15.59 = -2.815
    assert(out(1L) == ((5L, 2L, 5L, -2.815)))
    // empty: 0 words (clamped to 1), 0 sentences (clamped), 0 syllables:
    // 0.39*1 + 11.8*0 - 15.59 = -15.2
    assert(out(2L) == ((0L, 1L, 0L, -15.2)))
  }

  test("canonical fingerprint groups fuzzy-exact duplicates, min-id keeps") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Hello, World!"), (2L, "hello world"), (3L, "HELLO  world."),
      (4L, "something else")).toDF("doc_id", "text")
    val fp = docs.select(col("doc_id"),
      TextAnalysis.fingerprint(TextAnalysis.canonicalText(col("text"))).as("fp"))
    val groups = fp.groupBy("fp").agg(
        count(lit(1)).as("n"), min("doc_id").as("keeper"))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toSet
    assert(groups == Set(3L -> 1L, 1L -> 4L))
  }
}
