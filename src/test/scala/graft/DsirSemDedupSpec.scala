package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dsir, SemDedup}

/** DSIR importance-weight and SemDeDup semantics on synthetic fixtures.
  * Oracle hash-parity is gated by tools/check_oracle.py
  * (q_dsir_weights, q_semdedup).
  */
class DsirSemDedupSpec extends AnyFunSuite with SparkTestBase {

  test("dsir: target-like documents outweigh off-target ones") {
    import spark.implicits._
    // Target slice (lang=en) speaks 'alpha'; the rest speak 'beta'.
    // A held-out doc written in 'alpha' must score above one in 'beta',
    // regardless of its own lang label.
    val docs = ((1L to 20L).map(i => (i, "alpha alpha alpha", "en")) ++
      (21L to 40L).map(i => (i, "beta beta beta", "xx")) ++
      Seq((41L, "alpha alpha alpha", "xx"), (42L, "beta beta beta", "en")))
      .toDF("doc_id", "text", "lang")
    val out = Dsir.importanceWeights(docs, "text", "doc_id", "lang = 'en'")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // 3 unigrams + 2 bigrams per doc.
    assert(out(41L)._1 == 5L)
    assert(out(41L)._2 > out(42L)._2,
      s"alpha doc ${out(41L)._2} must outweigh beta doc ${out(42L)._2}")
    // Same text => identical weight (pure function of features).
    assert(out(1L)._2 == out(41L)._2)
  }

  test("dsir: docs with no tokens are excluded, not crashed on") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta", "en"),
      (2L, "", "en"),
      (3L, null.asInstanceOf[String], "xx"),
      (4L, "solo", "xx")).toDF("doc_id", "text", "lang")
    val out = Dsir.importanceWeights(docs, "text", "doc_id", "lang = 'en'")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._2).toMap
    // Doc 4 has one unigram and no bigram; empty/null docs vanish.
    assert(out.keySet == Set(1L, 4L))
    assert(out(1L) == 3L && out(4L) == 1L)
  }

  test("gumbel resample: sample is k rows, biased hard toward the target") {
    import spark.implicits._
    // Target speaks 'alpha'; logw gap vs 'beta' docs is ~28 nats, far
    // beyond Gumbel tail mass — all 50 picks must be alpha docs, and
    // determinism means rerunning yields the identical id set.
    val docs = ((1L to 100L).map(i => (i, "alpha alpha alpha", "en")) ++
      (101L to 200L).map(i => (i, "beta beta beta", "xx")))
      .toDF("doc_id", "text", "lang")
    val pick = Dsir.gumbelResample(docs, "text", "doc_id", "lang = 'en'", k = 50)
      .select("doc_id").as[Long].collect().toSet
    assert(pick.size == 50)
    assert(pick.forall(_ <= 100L), s"off-target docs sampled: ${pick.filter(_ > 100L)}")
    val again = Dsir.gumbelResample(docs, "text", "doc_id", "lang = 'en'", k = 50)
      .select("doc_id").as[Long].collect().toSet
    assert(pick == again)
  }

  test("semdedup: within-cell exact duplicates collapse to the min id") {
    import spark.implicits._
    // Two well-separated directions; ids 0 and 1 seed the two k-means
    // cells (min-id init). 3 duplicates id 0; 4 duplicates id 1; 2 and 5
    // are near-but-not-identical neighbors that must survive at a
    // 0.9999 threshold.
    val a = Seq(1.0f, 0.0f); val b = Seq(0.0f, 1.0f)
    val nearA = Seq(0.99939f, 0.03489f); val nearB = Seq(0.03489f, 0.99939f)
    val emb = Seq(
      (0L, a, 10), (1L, b, 11), (2L, nearA, 12),
      (3L, a, 13), (4L, b, 14), (5L, nearB, 15))
      .toDF("vec_id", "embedding", "label")
    val out = SemDedup.dedup(emb, "embedding", "vec_id",
        k = 2, iters = 2, threshold = 0.9999)
      .select("vec_id").as[Long].collect().toSet
    assert(out == Set(0L, 1L, 2L, 5L))
    // At a looser threshold the near neighbors fold in too.
    val loose = SemDedup.dedup(emb, "embedding", "vec_id",
        k = 2, iters = 2, threshold = 0.99)
      .select("vec_id").as[Long].collect().toSet
    assert(loose == Set(0L, 1L))
  }

  test("semdedup fixture guard: largest k-means cell stays well under the cap") {
    // duckDedup mirrors the MaxCellSize cap as a no-op, so oracle parity
    // would diverge silently if a fixture cell ever approached the cap.
    // Pin both gate scales (sf0.01 correctness, sf0.1 bench) to < cap/2.
    import org.apache.spark.sql.functions.max
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val emb = Tables.load(spark, dir, "embeddings")
      val maxCell = operators.Similarity
        .kmeansCells(emb, "embedding", "vec_id", k = 8, iters = 2)
        .groupBy("cell").count().agg(max("count")).head().getLong(0)
      assert(maxCell <= SemDedup.MaxCellSize / 2,
        s"$dir largest cell $maxCell approaches cap ${SemDedup.MaxCellSize}")
    }
  }

  test("semdedup: pair search stays inside cells and honors the cap") {
    import spark.implicits._
    val a = Seq(1.0f, 0.0f); val b = Seq(0.0f, 1.0f)
    val emb = Seq((0L, a, 0), (1L, b, 0), (2L, a, 0), (3L, b, 0))
      .toDF("vec_id", "embedding", "label")
    val p = SemDedup.pairs(emb, "embedding", "vec_id",
        k = 2, iters = 2, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // Cross-cell pairs (0,1), (0,3), … have cosine 0 AND different cells;
    // only the within-cell identicals pair up.
    assert(p == Set((0L, 2L), (1L, 3L)))
    // Cap of 1 drops every cell (both have 2 members) -> no pairs, all rows survive.
    val capped = SemDedup.dedup(emb, "embedding", "vec_id",
        k = 2, iters = 2, threshold = 0.5, maxCellSize = 1)
      .select("vec_id").as[Long].collect().toSet
    assert(capped == Set(0L, 1L, 2L, 3L))
  }
}
