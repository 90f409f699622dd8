package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextAnalysis
import graft.operators.{Bpe, ChangeLog, ContentChunks, SharedSubstrings}

/** Property-style sweeps over seeded random corpora for the curation
  * primitives added late in round 9 — each property runs as ONE Spark
  * job over a many-doc random DataFrame rather than a job per seed.
  * Deterministic java.util.Random corpora stand in for scalacheck
  * (whose scalatest bridge isn't in the offline cache).
  */
class CurationPropertySpec extends AnyFunSuite with SparkTestBase {

  private def randomDocs(n: Int, seed: Long, maxLen: Int,
                         alphabet: String): Seq[(Long, String)] = {
    val rnd = new java.util.Random(seed)
    (0 until n).map { i =>
      val len = rnd.nextInt(maxLen + 1)
      val s = (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      (i.toLong, s)
    }
  }

  test("canonicalText is idempotent and emits only [a-z0-9 ]") {
    import spark.implicits._
    val docs = randomDocs(300, seed = 7,
      maxLen = 80, alphabet = "aB c!?.,-\t09Zz  ")
      .toDF("doc_id", "text")
    val once = docs.select(col("doc_id"),
      TextAnalysis.canonicalText(col("text")).as("c1"))
    val twice = once.select(col("doc_id"),
      col("c1"), TextAnalysis.canonicalText(col("c1")).as("c2"))
    val rows = twice.collect()
    rows.foreach { r =>
      assert(r.getString(1) == r.getString(2),
        s"not idempotent on doc ${r.getLong(0)}: '${r.getString(1)}' vs '${r.getString(2)}'")
      assert(r.getString(1).forall(ch => ch.isDigit || ch.isLower || ch == ' '))
      assert(!r.getString(1).startsWith(" ") && !r.getString(1).endsWith(" "))
      assert(!r.getString(1).contains("  "))
    }
  }

  test("content-defined chunks always reassemble the source text") {
    import spark.implicits._
    val docs = randomDocs(300, seed = 11, maxLen = 200, alphabet = "abcd ")
      .filter(_._2.nonEmpty).toDF("doc_id", "text")
    val joined = ContentChunks.chunksOf(docs, "text", "doc_id", w = 8, divisor = 16)
      .groupBy(col("doc_id"))
      // chunks explode in order; concat_ws over collect_list preserves
      // the per-row order under whole-stage codegen of one partition per
      // doc — assert against a sort-free rebuild via the boundary spans
      .agg(concat_ws("", collect_list(col("chunk"))).as("rebuilt"))
      .join(docs, "doc_id")
    joined.collect().foreach { r =>
      assert(r.getString(1) == r.getString(2),
        s"doc ${r.getLong(0)} did not reassemble")
    }
  }

  test("every reported shared substring really occurs in two distinct docs") {
    import spark.implicits._
    // low-entropy alphabet so long cross-doc repeats actually arise
    val raw = randomDocs(120, seed = 13, maxLen = 120, alphabet = "ab ")
    val docs = raw.toDF("doc_id", "text")
    val spans = SharedSubstrings.topShared(docs, "text", "doc_id",
        minLen = 12, cap = 32, prefixLen = 6, k = 20)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    spans.foreach { case (span, len) =>
      assert(span.length == len)
      val owners = raw.filter(_._2.contains(span)).map(_._1)
      assert(owners.size >= 2,
        s"span '$span' occurs in ${owners.size} docs: $owners")
    }
  }

  test("inferChanges of a table against itself is empty; classes partition the key space") {
    import spark.implicits._
    val rnd = new java.util.Random(17)
    val a = (0 until 400).map(i => (i.toLong, rnd.nextInt(5).toLong, rnd.nextInt(3).toString))
      .toDF("k", "v1", "v2")
    assert(ChangeLog.inferChanges(a, a, Seq("k")).isEmpty)
    // random second state: every key falls in exactly one class
    val b = (100 until 500).map(i => (i.toLong, rnd.nextInt(5).toLong, rnd.nextInt(3).toString))
      .toDF("k", "v1", "v2")
    val diff = ChangeLog.inferChanges(a, b, Seq("k"))
      .groupBy(col("k")).agg(collect_set(col("_change_type")).as("cts"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    diff.foreach { case (k, cts) =>
      assert(cts == Set("insert") || cts == Set("delete") ||
        cts == Set("update_preimage", "update_postimage"),
        s"key $k got inconsistent classes $cts")
    }
    // no diff row for keys absent from both or identical in both
    val aRows = a.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    val bRows = b.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    val unchanged = aRows.keySet.intersect(bRows.keySet)
      .filter(k => aRows(k) == bRows(k))
    assert(unchanged.forall(!diff.contains(_)))
  }

  test("BPE token counts sit between word counts and character counts") {
    import spark.implicits._
    val docs = randomDocs(150, seed = 23, maxLen = 60, alphabet = "ab c")
      .filter(_._2.trim.nonEmpty).toDF("doc_id", "text")
    val counts = Bpe.tokenCounts(docs, "text", "doc_id", k = 4, maxWordLen = 20)
      .join(docs, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    counts.foreach { case (id, nWords, nBpe, text) =>
      val chars = text.trim.split("\\s+").filter(_.nonEmpty).map(_.length).sum
      assert(nBpe >= nWords, s"doc $id: fewer tokens than words")
      assert(nBpe <= chars, s"doc $id: more tokens than characters")
    }
  }
}
