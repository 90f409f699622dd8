package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{BloomPrune, SkewJoin}

class BloomSkewSpec extends AnyFunSuite with SparkTestBase {

  test("bloom filter has no false negatives (every member passes)") {
    import spark.implicits._
    val build = (1L to 200L).map(i => i * 7).toDF("k")
    val bits = BloomPrune.buildBits(build, "k")
    val membersPassing = build
      .filter(BloomPrune.mightContain(col("k"), bits)).count()
    assert(membersPassing == 200L)
  }

  test("bloom prune audit: candidates ⊇ members, false positives bounded") {
    import spark.implicits._
    val build = (1L to 500L).toDF("bk")
    val probe = (1L to 5000L).toDF("pk")   // 10% members
    val out = BloomPrune.pruneAudit(probe, "pk", build, "bk")
      .as[(Long, Long, Long)].head()
    val (cand, members, fps) = out
    assert(members == 500L)
    assert(cand >= members && fps == cand - members)
    // m=4096, k=3, n=500 → fill ~0.31, fp ≈ 0.3%; allow generous 5%.
    assert(fps <= 250, s"false positives $fps out of 4500 non-members")
  }

  test("salted join equals the plain join on skewed data") {
    import spark.implicits._
    // 90% of facts hit key 1 — the skew case.
    val facts = (1L to 1000L)
      .map(i => (if (i % 10 == 0) i % 50 else 1L, i, i * 2.0))
      .toDF("k", "row_id", "v")
    val dim = (0L until 50L).map(i => (i, s"dim$i")).toDF("k", "name")
    val saltedOut = SkewJoin.salted(facts, dim, "k", "row_id", nSalt = 8)
      .select("k", "row_id", "name").as[(Long, Long, String)].collect().toSet
    val plainOut = facts.join(dim, "k")
      .select("k", "row_id", "name").as[(Long, Long, String)].collect().toSet
    assert(saltedOut == plainOut)
  }

  test("salted join plan: exchange hashes the widened (key, salt) pair") {
    import spark.implicits._
    val facts = (1L to 100L).map(i => (i % 5, i)).toDF("k", "row_id")
    val dim = (0L until 5L).map(i => (i, s"d$i")).toDF("k", "name")
    val plan = SkewJoin.salted(facts, dim, "k", "row_id", nSalt = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("_salt"), "salt column missing from physical plan")
    val exchangeLines = plan.linesIterator
      .filter(l => l.contains("Exchange hashpartitioning")).toSeq
    assert(exchangeLines.nonEmpty &&
      exchangeLines.forall(l => l.contains("_salt")),
      s"join exchanges must partition by (key, _salt):\n${exchangeLines.mkString("\n")}")
  }
}
