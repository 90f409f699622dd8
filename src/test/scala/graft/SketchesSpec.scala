package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Multimodal, Rolling, Sketches, TfidfSim}

/** Sketch / similarity / rolling-window operator semantics. Oracle
  * hash-parity is gated by tools/check_oracle.py; these specs pin the
  * mathematical properties the sketches must satisfy regardless of
  * engine.
  */
class SketchesSpec extends AnyFunSuite with SparkTestBase {

  test("HLL estimate is within the m=64 error envelope and exact-aware") {
    import spark.implicits._
    // 3 groups of very different cardinality: the small one must take
    // the linear-counting branch, the big one the raw-estimate branch.
    val rows = (1 to 2000).map(i => ("big", i.toLong)) ++
      (1 to 40).map(i => ("mid", i.toLong)) ++
      Seq(("tiny", 1L), ("tiny", 1L), ("tiny", 2L))
    val df = rows.toDF("grp", "v")
    val out = Sketches.hllDistinct(df, "v", "grp")
      .as[(String, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out("tiny")._1 == 2L)
    // HLL with m=64 has ~13% standard error; allow 3 sigma.
    out.foreach { case (g, (exact, est)) =>
      assert(math.abs(est - exact) <= math.max(2.0, 0.40 * exact),
        s"group $g: estimate $est too far from exact $exact")
    }
  }

  test("HLL registers are merge-order independent (dyadic-exact sum)") {
    import spark.implicits._
    val df = (1 to 500).map(i => ("g", i.toLong)).toDF("grp", "v")
    val a = Sketches.hllDistinct(df, "v", "grp").as[(String, Long, Double)].head()
    val b = Sketches.hllDistinct(df.repartition(13), "v", "grp")
      .as[(String, Long, Double)].head()
    assert(a == b)
  }

  test("count-min estimate is >= exact for every reported heavy hitter") {
    import spark.implicits._
    val docs = (1 to 100)
      .map(i => (i.toLong, s"alpha beta w$i ${if (i % 2 == 0) "gamma" else "delta"}"))
      .toDF("doc_id", "text")
    val out = Sketches.cmsHeavyHitters(docs, "text", k = 5)
      .as[(String, Long, Long)].collect()
    assert(out.length == 5)
    out.foreach { case (term, exact, est) =>
      assert(est >= exact, s"$term: cms $est < exact $exact")
    }
    val byTerm = out.map(r => r._1 -> r._2).toMap
    assert(byTerm("alpha") == 100L && byTerm("gamma") == 50L)
  }

  test("rollingDistinct: trailing windows union registers; exact twin counts overlap once") {
    import spark.implicits._
    def t(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-$d%02d 01:00:00")
    // day1 {u1..u40}, day2 {u21..u60} (20 overlap), day4 {u1..u10};
    // day3 has no events → no output row. Window = 2 days.
    val rows = (1 to 40).map(u => (u.toLong, t(1))) ++
      (21 to 60).map(u => (u.toLong, t(2))) ++
      (1 to 10).map(u => (u.toLong, t(4)))
    val out = Sketches.rollingDistinct(rows.toDF("user_id", "ts"), "ts", "user_id",
        win = 2)
      .collect().map(r => r.getDate(0).toString -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(out.keySet == Set("2024-01-01", "2024-01-02", "2024-01-04"))
    assert(out("2024-01-01")._1 == 40L)
    assert(out("2024-01-02")._1 == 60L) // 40 + 40 − 20 overlap, counted once
    assert(out("2024-01-04")._1 == 10L) // day3 empty, so the window holds only day4
    // m=64 registers → ~13% standard error; allow 3σ like the hll gate
    out.foreach { case (d, (exact, est)) =>
      assert(math.abs(est - exact) <= math.max(2.0, 0.4 * exact),
        s"$d: estimate $est too far from exact $exact")
    }
  }

  test("cms join-cardinality estimate is >= the exact join size on a skewed key") {
    import spark.implicits._
    // 'hot' appears 100× on one side and 80× on the other: exact join
    // size 100·80 + the 30 singleton matches = 8030 — the exploding-join
    // shape the estimator exists to flag before execution.
    val a = ((1 to 100).map(_ => "hot") ++ (1 to 50).map(i => s"a$i")).toDF("k")
    val b = ((1 to 80).map(_ => "hot") ++ (1 to 30).map(i => s"a$i")).toDF("k")
    val Array(row) = Sketches.cmsJoinCardinality(a, "k", b, "k").collect()
    val (exact, est) = (row.getLong(0), row.getLong(1))
    assert(exact == 100L * 80L + 30L)
    assert(est >= exact, s"cms estimate $est < exact $exact")
    // collisions in a 256-wide sketch over 81 keys stay modest
    assert(est <= exact + 2000, s"cms estimate $est implausibly inflated")
  }

  test("kmv containment: a subset source reads as fully contained while jaccard stays partial") {
    import spark.implicits._
    // 'sub' docs are verbatim copies of a third of 'big' docs, so sub's
    // shingle set ⊆ big's: every union-sample row in sub is also in big
    // → the containment estimate is exactly 1.0, with no sketch error.
    val big = (1 to 90).map(i => (i.toLong, s"w${i}a w${i}b w${i}c w${i}d w${i}e", "big"))
    val sub = (1 to 30).map(i => (1000L + i, s"w${i}a w${i}b w${i}c w${i}d w${i}e", "sub"))
    val docs = (big ++ sub).toDF("doc_id", "text", "source")
    val Array(row) = Sketches.kmvContainment(docs, "text", "source", n = 3, k = 64)
      .collect()
    assert(row.getString(0) == "big" && row.getString(1) == "sub")
    val (cBigInSub, cSubInBig) = (row.getDouble(5), row.getDouble(6))
    assert(cSubInBig == 1.0, s"subset containment $cSubInBig != 1.0")
    assert(cBigInSub < 0.7, s"reverse containment $cBigInSub should be partial")
    val j = Sketches.kmvSourceJaccard(docs, "text", "source", n = 3, k = 64)
      .collect().head.getDouble(5)
    assert(j < cSubInBig, "jaccard must blur the asymmetry containment keeps")
  }

  test("tfidf pairs: identical docs hit cosine 1, disjoint docs absent") {
    import spark.implicits._
    // Filler docs keep the corpus above the df-cap floor (a term with
    // df=2 survives pruning only when df·5 ≤ n_docs, i.e. n ≥ 10).
    val docs = (Seq(
      (1L, "apple banana cherry apple"),
      (2L, "apple banana cherry apple"),
      (3L, "dog elephant fox goose"),
      (4L, "dog elephant fox goose"),
      (5L, "zebra yak xylophone walrus")) ++
      (6L to 15L).map(i => (i, s"unique$i words$i only$i"))).toDF("doc_id", "text")
    val out = TfidfSim.pairs(docs, "text", "doc_id", minCos = 0.5)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(out.keySet == Set((1L, 2L), (3L, 4L)))
    out.values.foreach(c => assert(math.abs(c - 1.0) < 1e-9))
  }

  test("rolling 7-day window sums trailing days within type, gap-aware") {
    import spark.implicits._
    val ts = (day: Int, k: Int) =>
      java.sql.Timestamp.valueOf(f"2024-01-$day%02d 0$k:00:00")
    // type a: days 1,2,3 with 1,2,3 events; day 15 after a gap.
    val rows =
      (Seq(ts(1, 1)) ++ Seq(ts(2, 1), ts(2, 2)) ++
        Seq(ts(3, 1), ts(3, 2), ts(3, 3)) ++ Seq(ts(15, 1))).map(("a", _)) ++
        Seq(("b", ts(2, 5)))
    val out = Rolling.dailyCounts(rows.toDF("event_type", "ts"), "ts", "event_type")
      .as[(String, String, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    assert(out(("a", "2024-01-03")) == ((3L, 6L, 2.0)))   // 1+2+3 over 3 days
    assert(out(("a", "2024-01-15")) == ((1L, 1L, 1.0)))   // gap: window empty behind
    assert(out(("b", "2024-01-02")) == ((1L, 1L, 1.0)))   // types isolated
  }

  test("kmv jaccard: exact when sets fit the sketch, close when they don't") {
    import spark.implicits._
    // Each 5-word text contributes 3 globally-unique shingles, so source
    // overlap is controlled exactly by shared texts: A∩B = texts 6..10
    // of 15 distinct -> J = 1/3. 30 shingles/source < k=128: the sketch
    // IS the set, so the estimate must equal the exact value.
    def text(i: Int) = s"a$i b$i c$i d$i e$i"
    val small = ((1 to 10).map(i => (text(i), "A")) ++
      (6 to 15).map(i => (text(i), "B"))).toDF("text", "source")
    val s1 = Sketches.kmvSourceJaccard(small, "text", "source")
      .select("j_kmv").as[Double].head()
    assert(s1 == 0.333333)
    // The exact audit twin agrees with the analytic ground truth.
    val e1 = Sketches.exactSourceOverlap(small, "text", "source")
      .select("inter_exact", "j_exact").as[(Long, Double)].head()
    assert(e1 == ((15L, 0.333333)))
    // 900 shingles/source >> k: genuinely approximate; 3σ for J=1/3 at
    // k=128 is ~0.125.
    val big = ((1 to 300).map(i => (text(i), "A")) ++
      (151 to 450).map(i => (text(i), "B"))).toDF("text", "source")
    val s2 = Sketches.kmvSourceJaccard(big, "text", "source")
      .select("j_kmv").as[Double].head()
    assert(math.abs(s2 - 1.0 / 3.0) < 0.15,
      s"kmv estimate $s2 too far from exact 1/3")
  }

  test("pmi: exclusive pair outranks a chance pair of promiscuous words") {
    import spark.implicits._
    // "new york": both words occur ONLY together. "a b": a and b each
    // also pair with others, so their co-occurrence is closer to chance
    // -> pmi lower by ~ln(4).
    val docs = ((1 to 20).map(i => (i.toLong, "new york")) ++
      (21 to 40).map(i => (i.toLong, "a b")) ++
      (41 to 60).map(i => (i.toLong, "a c")) ++
      (61 to 80).map(i => (i.toLong, "d b"))).toDF("doc_id", "text")
    val out = graft.operators.Collocations.pmiPairs(docs, "text", minCount = 5L)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._4).toMap
    assert(out.keySet == Set(("new", "york"), ("a", "b"), ("a", "c"), ("d", "b")))
    assert(out(("new", "york")) > out(("a", "b")))
    assert(math.abs((out(("new", "york")) - out(("a", "b"))) - math.log(4.0)) < 1e-6)
  }

  test("pmi log-space scoring survives counts where c12·Nt² overflows BIGINT") {
    import spark.implicits._
    // Web-scale counts: c12·Nt² ≈ 9.6e27 >> 2^63 ≈ 9.2e18 — the naive
    // BIGINT product silently wraps; the log-space expression must not.
    val c12 = 1000000000L; val c1 = 2000000000L; val c2 = 1500000000L
    val nt = 3100000000L; val nb = 3099999999L
    assert(BigDecimal(c12) * BigDecimal(nt) * BigDecimal(nt) >
      BigDecimal(Long.MaxValue))
    val got = Seq((c12, c1, c2, nt, nb)).toDF("c12", "c1", "c2", "nt", "nb")
      .select(graft.operators.Collocations.pmiExpr(
        col("c12"), col("c1"), col("c2"), col("nt"), col("nb")).as("pmi"))
      .as[Double].head()
    // Independent overflow-free path: ln((c12/nb)·(nt/c1)·(nt/c2)) with
    // the ratios taken in double BEFORE multiplying.
    val expected = math.log(
      (c12.toDouble / nb.toDouble) * (nt.toDouble / c1.toDouble) *
        (nt.toDouble / c2.toDouble))
    assert(math.abs(got - expected) < 1e-9,
      s"log-space pmi $got diverged from reference $expected")
  }

  test("perplexity: repeated fluent bigrams score lower nll than rare ones") {
    import spark.implicits._
    // "good morning" appears in 9 docs -> high bigram count -> low nll;
    // doc 10's bigrams are unique -> smoothed floor probability.
    val docs = ((1L to 9L).map(i => (i, "good morning everyone")) :+
      (10L, "zxq qqv wvx")).toDF("doc_id", "text")
    val out = graft.operators.Perplexity.docScores(docs, "text", "doc_id")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(out.size == 10)
    assert(out(1L) < out(10L),
      s"fluent doc nll ${out(1L)} should undercut gibberish ${out(10L)}")
  }

  test("perplexity: docs with <2 tokens are excluded, not crashed on") {
    import spark.implicits._
    // Empty, one-token, and null texts have no bigrams: they must drop
    // out of the scored output (no INVALID_ARRAY_INDEX from a
    // descending `sequence`), while their tokens still feed the
    // unigram/vocab counts — same posture as the DuckDB oracle, whose
    // `range(1, len(w))` is empty for them.
    val docs = Seq(
      (1L, "good morning everyone"),
      (2L, ""),
      (3L, "solo"),
      (4L, null.asInstanceOf[String]),
      (5L, "good morning team")).toDF("doc_id", "text")
    val out = graft.operators.Perplexity.docScores(docs, "text", "doc_id")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._2).toMap
    assert(out.keySet == Set(1L, 5L))
    assert(out(1L) == 2L && out(5L) == 2L)
  }

  test("mixture weights: sum to ~1 and temperature upweights small sources") {
    import spark.implicits._
    val docs = ((1L to 90L).map(i => (i, "w " * 100, "big")) ++
      (91L to 100L).map(i => (i, "w " * 100, "small")))
      .toDF("doc_id", "text", "source")
    val out = graft.operators.Splits.mixtureWeights(docs, "text", "source")
      .as[(String, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(math.abs(out.values.map(_._2).sum - 1.0) < 1e-6)
    val (nBig, wBig) = out("big"); val (nSmall, wSmall) = out("small")
    // proportional share would be 10%; sqrt-temperature gives 25%.
    assert(nBig == 9L * nSmall)
    assert(wSmall > nSmall.toDouble / (nBig + nSmall))
    assert(math.abs(wSmall - 0.25) < 1e-6)
  }

  test("perceptual hash: deterministic, above-mean bits, empty payload -> 0") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"),  // uniform -> no bit above mean
      (2L, ""),                                   // empty -> 0
      (3L, "abababababababababababababababab"),  // 'b' positions above mean
      (4L, "abababababababababababababababab")).toDF("doc_id", "text")
    val out = Multimodal.perceptualHash(
        Multimodal.attachBinary(docs, "text"), "doc_id")
      .as[(Long, Long)].collect().toMap
    assert(out(1L) == 0L)
    assert(out(2L) == 0L)
    assert(out(3L) == out(4L) && out(3L) != 0L)
    // 'b' (98) at odd positions is above the 97.5 mean: bits 1,3,5,…
    val expected = (1 until Multimodal.PhashBits by 2)
      .foldLeft(0L)((acc, i) => acc | (1L << i))
    assert(out(3L) == expected)
  }

  test("perceptual hash: null payload and null id do not NPE") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = true),
      StructField("payload", BinaryType, nullable = true)))
    val rows = java.util.Arrays.asList(
      Row(1L, null),                                  // null media -> phash 0
      Row(null, "ab".getBytes("UTF-8")),              // null id propagates
      Row(3L, Array.emptyByteArray))
    val out = Multimodal.perceptualHash(spark.createDataFrame(rows, schema), "doc_id")
      .collect().map(r => (if (r.isNullAt(0)) -999L else r.getLong(0)) -> r.getLong(1)).toMap
    assert(out(1L) == 0L)
    assert(out(3L) == 0L)
    assert(out.contains(-999L))
  }
}
