package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bpe

class BpeSpec extends AnyFunSuite with SparkTestBase {

  test("BPE merges on 'banana' follow the hand-traced greedy order") {
    import spark.implicits._
    // One word type, freq 3. Round 1 pairs: (b,a)=3, (a,n)=6, (n,a)=6 —
    // (a,n) wins the count tie on left ASC. Renders then proceed:
    //   b an an a  → (an,a)=3 wins on left ASC → b an ana
    //   b an ana   → (an,ana)               → b anana
    //   b anana    → (b,anana)              → banana
    // and round 5 finds no pairs, so k=6 yields exactly 4 merges.
    val docs = Seq("banana banana banana").toDF("text")
    val got = Bpe.learnMerges(docs, "text", k = 6, maxWordLen = 20)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(got == Seq(
      (1L, "a", "n", "an", 6L),
      (2L, "an", "a", "ana", 3L),
      (3L, "an", "ana", "anana", 3L),
      (4L, "b", "anana", "banana", 3L)))
  }

  test("BPE: word-type weighting and the length cap") {
    import spark.implicits._
    // 'ab' appears 5 times as a word type, 'cd' twice — (a,b) must win
    // despite both pairs appearing in one word type each. The 25-char
    // word is excluded by maxWordLen=20 and contributes no pairs.
    val docs = Seq("ab ab ab", "ab ab cd", "cd " + "x" * 25).toDF("text")
    val got = Bpe.learnMerges(docs, "text", k = 1, maxWordLen = 20)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(4))).toSeq
    assert(got == Seq(("a", "b", 5L)))
  }

  test("BPE tokenize: learned merges compress counts; capped words still tokenize") {
    import spark.implicits._
    // Doc 1's 'banana' fully merges in 4 rounds → 1 token per word.
    // Doc 2's 25-char word is excluded from LEARNING by maxWordLen but
    // is still tokenized — no merge touches 'x', so it stays 25 tokens.
    val docs = Seq(
      (1L, "banana banana banana"),
      (2L, "x" * 25)).toDF("doc_id", "text")
    val got = Bpe.tokenCounts(docs, "text", "doc_id", k = 6, maxWordLen = 20)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(1L -> (3L, 3L), 2L -> (1L, 25L)))
  }

  test("BPE: merged symbols do not cascade within one pass") {
    import spark.implicits._
    // 'aaaa': pairs (a,a)=3·freq. One merge pass renders aa aa — the
    // merged 'aa' must not re-merge with the next raw 'a' in the same
    // pass (leftmost-first non-overlapping), which round 2 then pairs
    // as (aa,aa).
    val docs = Seq("aaaa").toDF("text")
    val got = Bpe.learnMerges(docs, "text", k = 2, maxWordLen = 20)
      .collect().map(r => (r.getLong(0), r.getString(3), r.getLong(4))).toSeq
    assert(got == Seq((1L, "aa", 3L), (2L, "aaaa", 1L)))
  }

  test("native BpeTokenCount matches the chained HOF fold on varied words") {
    import spark.implicits._
    // Cascade bait (aaaa/aaa), multi-byte UTF-8, the learned-merge
    // boundary cases, and words no merge touches — the native
    // expression must reproduce the fold's counts exactly (r16).
    val docs = Seq(
      (1L, "banana bananas ban anana"),
      (2L, "aaaa aaa aa a"),
      (3L, "héllo wörld ünïcode"),
      (4L, "x" * 25 + " " + "an" * 12),
      (5L, "b anana banana nab")).toDF("doc_id", "text")
    val merges = Seq("a" -> "n", "an" -> "a", "an" -> "ana", "b" -> "anana",
      "a" -> "a")
    val native = Bpe.tokenCountsWithMerges(docs, "text", "doc_id", merges)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val hof = Bpe.tokenCountsWithMergesHof(docs, "text", "doc_id", merges)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(native == hof && native.size == 5)
  }

  test("fertilityByGroup: tokens-per-word ratio per group; merges lower it") {
    import spark.implicits._
    // No merges: every word splits to characters → fertility = mean
    // word length. g1: "aa bb" → 4 tokens / 2 words = 2.0;
    // g2: "abcd" → 4/1 = 4.0.
    val docs = Seq((1L, "g1", "aa bb"), (2L, "g2", "abcd"))
      .toDF("doc_id", "lang", "text")
    val out = Bpe.fertilityByGroup(docs, "text", "doc_id", "lang", Seq.empty)
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("g1") == (("g1", 1L, 2L, 4L, 2.0)))
    assert(out("g2") == (("g2", 1L, 1L, 4L, 4.0)))

    // A merge tuned to g1's vocabulary ("a"+"a") lowers ONLY g1's
    // fertility — the per-language tokenizer-equity signal.
    val merged = Bpe.fertilityByGroup(docs, "text", "doc_id", "lang",
      Seq(("a", "a")))
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r._5).toMap
    assert(merged("g1") == 1.5 && merged("g2") == 4.0)
  }
}
