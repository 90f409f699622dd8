package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Phrase

class PhraseSpec extends AnyFunSuite with SparkTestBase {

  private def hits(docs: Seq[(Long, String)], phrase: Seq[String]): Map[Long, Long] = {
    import spark.implicits._
    Phrase.phraseHits(docs.toDF("doc_id", "text"), "text", "doc_id", phrase)
      .as[(Long, Long)].collect().toMap
  }

  test("consecutive in-order only; overlaps count; scattered words don't") {
    val docs = Seq(
      (1L, "a b c a b c"),          // "a b" twice
      (2L, "b a x a x b"),          // has a and b, never "a b"
      (3L, "a a a"),                // no b
      (4L, "x a b y"))              // once, mid-document
    assert(hits(docs, Seq("a", "b")) == Map(1L -> 2L, 4L -> 1L))
  }

  test("repeated phrase word aligns correctly (a a b)") {
    val docs = Seq(
      (1L, "a a b"),                // exactly one
      (2L, "a b"),                  // too short a run
      (3L, "a a a b"),              // one (anchor at pos 1)
      (4L, "a a b a a b"))          // two
    assert(hits(docs, Seq("a", "a", "b")) == Map(1L -> 1L, 3L -> 1L, 4L -> 2L))
  }

  test("single-word phrase counts occurrences") {
    val docs = Seq((1L, "w x w"), (2L, "x"), (3L, "w"))
    assert(hits(docs, Seq("w")) == Map(1L -> 2L, 3L -> 1L))
  }
}
