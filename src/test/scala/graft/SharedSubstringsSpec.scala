package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SharedSubstrings

class SharedSubstringsSpec extends AnyFunSuite with SparkTestBase {

  test("finds the planted cross-doc span at full length; ignores within-doc repeats") {
    import spark.implicits._
    val shared = "the five boxing wizards jump quickly" // 36 chars
    // separators differ on BOTH sides of the planted span, so the
    // true longest shared substring is exactly shared + the one space
    // both continuations start with
    val docs = Seq(
      (1L, "aaaa." + shared + " xxxxxxxx"),
      (2L, "bbbb," + shared + " zzzzzzzz"),
      // doc 3 repeats a long phrase INTERNALLY only — no other doc has
      // it, so it must not be reported (cross-doc pairs only)
      (3L, "unique interior phrase here unique interior phrase here"))
      .toDF("doc_id", "text")
    val got = SharedSubstrings.topShared(docs, "text", "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // the longest reported span is the shared sentence plus the space
    // both docs continue with before diverging
    assert(got.head == (shared + " ", 37L))
    // every reported span is a substring of the shared region's
    // extension, never the within-doc repeat
    assert(got.forall { case (s, _) => !s.contains("interior") })
    // spans shrink as suffixes start deeper inside the shared region
    assert(got.map(_._2) == got.map(_._2).sorted.reverse)
  }

  test("three docs sharing a span: boundaries still surface it at full length") {
    import spark.implicits._
    val shared = "pack my box with five dozen liquor jugs"
    val docs = Seq(
      (1L, "aa." + shared + " q1"),
      (2L, "bb," + shared + " q2"),
      (3L, "cc;" + shared + " q3")).toDF("doc_id", "text")
    val top = SharedSubstrings.topShared(docs, "text", "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1))).head
    assert(top == (shared + " q", shared.length + 2L))
  }

  test("docs shorter than minLen contribute nothing; no self pairs at equal keys") {
    import spark.implicits._
    val docs = Seq(
      (1L, "tiny"),
      (2L, "exactly sixteen!"),    // 16 chars: one suffix position
      (3L, "exactly sixteen!")).toDF("doc_id", "text")
    val got = SharedSubstrings.topShared(docs, "text", "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("exactly sixteen!", 16L)))
  }

  test("screened variant: flagged sharers mined exactly, never-sharing docs screened out") {
    import spark.implicits._
    val shared = "the five boxing wizards jump quickly" // 6 words >= 3-gram screen
    val docs = Seq(
      (1L, "aaaa." + shared + " xxxxxxxx"),
      (2L, "bbbb," + shared + " zzzzzzzz"),
      // no cross-doc word 3-gram: must be screened out before the
      // suffix explosion (and shares nothing anyway)
      (3L, "completely unrelated filler text with no repeats at all"),
      (4L, "another standalone document nothing shared here either"))
      .toDF("doc_id", "text")
    val full = SharedSubstrings.topShared(docs, "text", "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val screened = SharedSubstrings.topSharedScreened(docs, "text", "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // docs 3/4 share nothing >= minLen, so removing them leaves the
    // mined spans identical on this fixture
    assert(screened == full)
    assert(screened.head == (shared + " ", 37L))
  }
}
