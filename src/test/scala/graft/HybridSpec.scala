package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Hybrid

class HybridSpec extends AnyFunSuite with SparkTestBase {

  test("rrfFuse ranks by summed rank reciprocals, absent side contributes zero") {
    import spark.implicits._
    // lex top-3: 10, 11, 12; sem top-3: 12, 13, 10.
    val lex = Seq((10L, 5.0), (11L, 4.0), (12L, 3.0), (13L, 0.5))
      .toDF("id", "score")
    val sem = Seq((12L, 0.9), (13L, 0.8), (10L, 0.7), (11L, 0.01))
      .toDF("id", "score")
    val out = Hybrid.rrfFuse(lex, sem, kPerSide = 3, kOut = 4)
      .select("id", "rank", "rrf").as[(Long, Long, Double)].collect()
      .sortBy(_._2)
    def r(lexRank: Option[Int], semRank: Option[Int]): Double = {
      val v = lexRank.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        semRank.map(x => 1.0 / (60 + x)).getOrElse(0.0)
      math.rint(v * 1e6) / 1e6
    }
    // id 10: lex#1 + sem#3; id 12: lex#3 + sem#1 (same sum, id ASC breaks
    // the tie); id 11: lex-only #2; id 13: sem-only #2.
    assert(out.map(t => (t._1, t._3)).toSeq == Seq(
      (10L, r(Some(1), Some(3))), (12L, r(Some(3), Some(1))),
      (11L, r(Some(2), None)), (13L, r(None, Some(2)))))
  }

  test("composed retrieval fuses the fixture's BM25 and cosine sides consistently") {
    val docs = Tables.load(spark, sf, "documents")
    val embs = Tables.load(spark, sf, "embeddings")
    val out = Hybrid.rrfRetrieve(docs, embs, "text", "doc_id",
      "embedding", "vec_id", terms = Seq("spark", "hash", "window"),
      queryVecId = 0L, kPerSide = 100, kOut = 50)
    val rows = out.collect()
    assert(rows.length == 50)
    // Every row carries at least one side's rank; ranks are 1..kPerSide.
    assert(rows.forall(r => !(r.isNullAt(2) && r.isNullAt(3))))
    // The rank column is exactly the (rrf DESC, id ASC) order.
    val byRank = rows.sortBy(_.getLong(1)).map(_.getLong(0)).toSeq
    val expected = rows.sortBy(r => (-r.getDouble(4), r.getLong(0))).map(_.getLong(0)).toSeq
    assert(byRank == expected)
  }
}
