package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ContentChunks

class ContentChunksSpec extends AnyFunSuite with SparkTestBase {

  private val W = 8
  private val D = 32

  test("boundaries end at n, are ascending, and chunks reassemble the text") {
    import spark.implicits._
    val text = "the quick brown fox jumps over the lazy dog " * 4
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val bp = df.select(ContentChunks.boundariesOf(col("text"), W, D).as("b"))
      .head().getSeq[Int](0)
    assert(bp.last == text.length)
    assert(bp == bp.sorted && bp.distinct == bp)
    val chunks = ContentChunks.chunksOf(df, "text", "doc_id", W, D)
      .select("chunk").as[String].collect()
    assert(chunks.mkString("") == text)
  }

  test("content-defined chunks realign after an insertion near the start") {
    import spark.implicits._
    // The CDC property (and the reason fixed windows lose): prepending a
    // byte shifts every fixed-offset chunk, but content-defined
    // boundaries depend only on the local window, so every boundary of
    // the original reappears shifted by one — at most the first chunk
    // (which absorbs the insertion) differs.
    val base = "the quick brown fox jumps over the lazy dog " * 5
    val shifted = "Z" + base
    val df = Seq((1L, base), (2L, shifted)).toDF("doc_id", "text")
    val fps = ContentChunks.chunksOf(df, "text", "doc_id", W, D)
      .select(col("doc_id"), md5(col("chunk")).as("fp"))
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getString(1)).toSet).toMap
    val shared = fps(1L).intersect(fps(2L))
    assert(fps(1L).size >= 4, s"fixture too short to be meaningful: ${fps(1L).size} chunks")
    assert(shared.size >= fps(1L).size - 2,
      s"expected near-total chunk realignment, shared ${shared.size} of ${fps(1L).size}")
    // and the boundary positions themselves are the originals shifted +1
    // (modulo the artificial end-of-text boundary)
    val Seq(bBase, bShift) = Seq(base, shifted).map { t =>
      Seq((1L, t)).toDF("doc_id", "text")
        .select(ContentChunks.boundariesOf(col("text"), W, D).as("b"))
        .head().getSeq[Int](0)
    }
    val natural = bBase.dropRight(1)
    assert(natural.map(_ + 1).forall(bShift.contains),
      s"shifted boundaries $bShift missing some of ${natural.map(_ + 1)}")
  }

  test("short and sub-window docs chunk as a single whole-text chunk") {
    import spark.implicits._
    val df = Seq((1L, "tiny"), (2L, "a")).toDF("doc_id", "text")
    val got = ContentChunks.chunksOf(df, "text", "doc_id", W, D)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "tiny", 2L -> "a"))
  }
}
