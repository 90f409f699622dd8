package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{QualityFilters, Redaction, TextAnalysis}
import graft.operators.{ChunkDedup, Curriculum, Decontaminate, Dedup, Drift, DupSpan, Entropy, Idf, Packing, Splits, Winnow}

/** Unit gates for the round-3 corpus-curation operators (quality
  * filters, decontamination, chunk dedup, redaction, splits, packing).
  * The oracle gate proves engine parity on the full corpus; these pin
  * the SEMANTICS on hand-checkable fixtures and the edge cases the
  * corpus doesn't contain (empty text, short docs, window straddling).
  */
class CorpusOpsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("quality filters: hand-computed stats on a known doc, zero-guards on empty") {
    val df = Seq(
      (1L, "aa bb aa cc"),        // 4 tokens, 3 uniq, top=2/4, bigrams: aa bb/bb aa/aa cc all distinct
      (2L, ""),                   // empty: all stats 0
      (3L, "x x x x")             // pathological repetition
    ).toDF("id", "text").withColumn("w", TextAnalysis.tokens(col("text")))
    val r = df.select(col("id"),
      QualityFilters.meanWordLenOf(col("w")).as("mwl"),
      QualityFilters.uniqWordRatioOf(col("w")).as("uniq"),
      QualityFilters.topWordRatioOf(col("w")).as("top"),
      QualityFilters.dup2gramRatioOf(col("w")).as("dup2"),
      QualityFilters.keepOf(col("w")).as("keep"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(r(1L).getDouble(1) == 2.0)       // (2+2+2+2)/4
    assert(r(1L).getDouble(2) == 0.75)      // 3/4
    assert(r(1L).getDouble(3) == 0.5)       // aa appears 2/4
    assert(r(1L).getDouble(4) == 0.0)       // 3 distinct bigrams of 3
    assert(r(2L).getDouble(1) == 0.0 && r(2L).getDouble(2) == 0.0 &&
      r(2L).getDouble(3) == 0.0 && r(2L).getDouble(4) == 0.0)
    assert(r(2L).getLong(5) == 0L)          // empty docs dropped (mwl < min)
    assert(r(3L).getDouble(3) == 1.0)       // top word is everything
    assert(r(3L).getDouble(4) == round2(1.0 - 1.0 / 3.0)) // "x x" ×3
    assert(r(3L).getLong(5) == 0L)
  }

  private def round2(d: Double): Double = math.round(d * 1e6) / 1e6

  test("decontaminate: overlap counts exactly the shared distinct 3-grams") {
    val df = Seq(
      (0L, "a b c d e"),          // eval doc: grams {a b c, b c d, c d e}
      (1L, "a b c d x"),          // shares {a b c, b c d} → 2
      (2L, "z z z z z"),          // shares nothing
      (3L, "c d e f g")           // shares {c d e} → 1
    ).toDF("doc_id", "text")
    val got = Decontaminate.overlap(df, "text", "doc_id",
      evalPred = col("doc_id") === 0L, n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 3L -> 1L))
  }

  test("decontaminate: item containment names the leaked eval item with its gram fraction") {
    val df = Seq(
      (0L, "a b c d e"),          // eval item A: 3 grams
      (5L, "p q r s t u"),        // eval item B: 4 grams
      (1L, "x a b c d e y"),      // contains ALL of A's grams (5 of its own) → containment 1.0 vs A
      (2L, "a b c d x"),          // 2 of A's 3 grams → 0.666667
      (3L, "p q r z"),            // 1 of B's 4 grams → 0.25, below 0.5
      (4L, "no shared phrases at all here")
    ).toDF("doc_id", "text")
    val got = Decontaminate.itemContainment(df, "text", "doc_id",
        evalPred = col("doc_id") === 0L || col("doc_id") === 5L,
        n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got == Map(
      (1L, 0L) -> ((3L, 1.0)),
      (2L, 0L) -> ((2L, 0.666667))))
  }

  test("chunk dedup: first global occurrence kept, later duplicates dropped") {
    // 2-token chunks; doc 1 = [a b][c d], doc 2 = [a b][e f], doc 3 = [c d]
    val df = Seq(
      (1L, "a b c d"),
      (2L, "a b e f"),
      (3L, "c d")
    ).toDF("doc_id", "text")
    val got = ChunkDedup.stats(df, "text", "doc_id", chunkTokens = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(1L -> ((2L, 2L)), 2L -> ((2L, 1L)), 3L -> ((1L, 0L))))
  }

  test("chunk dedup: empty docs contribute zero chunks (no descending-sequence blowup)") {
    val df = Seq((1L, ""), (2L, "a b c")).toDF("doc_id", "text")
    val got = ChunkDedup.stats(df, "text", "doc_id", chunkTokens = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(2L -> 2L)) // empty doc has no chunk rows at all
  }

  test("boilerplate strip: chunks in >= minDocs distinct docs are removed, order kept") {
    // 2-token chunks; "a b" occurs in 3 distinct docs -> boilerplate;
    // "c d" in 2 docs -> kept at minDocs=3. Doc 4 repeats "a b" twice —
    // distinct-doc counting must not let within-doc repeats reach τ.
    val df = Seq(
      (1L, "a b c d"),
      (2L, "a b e f"),
      (3L, "x y a b"),   // "a b" is doc 3's SECOND chunk: position survives
      (4L, "c d g g a b a b"),
      (5L, "")
    ).toDF("doc_id", "text")
    val got = ChunkDedup.stripBoilerplate(df, "text", "doc_id",
        chunkTokens = 2, minDocs = 3)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(
      1L -> (("c d", 2L, 1L)),
      2L -> (("e f", 2L, 1L)),
      3L -> (("x y", 2L, 1L)),
      4L -> (("c d g g", 4L, 2L)),
      5L -> (("", 0L, 0L))))
  }

  test("boilerplate strip: anti-join shape (above the broadcast ceiling) matches the broadcast shape") {
    // broadcastMaxChunks = -1 forces the explode + left-anti + re-agg
    // path; same fixture and expectations as the broadcast-shape test,
    // including the all-boilerplate doc (6) and the empty doc (5) that
    // the doc-base re-join must keep.
    val df = Seq(
      (1L, "a b c d"),
      (2L, "a b e f"),
      (3L, "x y a b"),
      (4L, "c d g g a b a b"),
      (5L, ""),
      (6L, "a b")        // fully boilerplate: every chunk dropped
    ).toDF("doc_id", "text")
    val got = ChunkDedup.stripBoilerplate(df, "text", "doc_id",
        chunkTokens = 2, minDocs = 3, broadcastMaxChunks = -1L)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(
      1L -> (("c d", 2L, 1L)),
      2L -> (("e f", 2L, 1L)),
      3L -> (("x y", 2L, 1L)),
      4L -> (("c d g g", 4L, 2L)),
      5L -> (("", 0L, 0L)),
      6L -> (("", 1L, 1L))))
    val broadcastShape = ChunkDedup.stripBoilerplate(df, "text", "doc_id",
        chunkTokens = 2, minDocs = 3)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == broadcastShape)
  }

  test("boilerplate strip: empty boiler set leaves every document unchanged") {
    val df = Seq((1L, "a b"), (2L, "c d")).toDF("doc_id", "text")
    val got = ChunkDedup.stripBoilerplate(df, "text", "doc_id",
        chunkTokens = 2, minDocs = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "a b", 2L -> "c d"))
  }

  test("winnowing: a shared run of w+k-1 words guarantees a common fingerprint") {
    // k=3, w=4: the paper's guarantee threshold is w+k-1 = 6 words.
    // Docs 1/2 share exactly the 6-word run "p q r s t u" inside
    // otherwise-disjoint vocabularies; doc 3 is fully disjoint.
    val df = Seq(
      (1L, "a1 a2 a3 p q r s t u a4 a5 a6"),
      (2L, "b1 b2 p q r s t u b3 b4 b5 b6"),
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10")
    ).toDF("doc_id", "text")
    val pairs = Winnow.overlapPairs(df, "text", "doc_id",
        k = 3, w = 4, maxDocFreq = 10, minCommon = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("winnowing boundaries: sub-k docs select nothing, sub-w docs one window") {
    val df = Seq(
      (1L, "a b"),        // < k=3 words: no grams, no fingerprints
      (2L, "a b c"),      // exactly one gram: one whole-doc window
      (3L, "")            // empty
    ).toDF("doc_id", "text")
    val got = Winnow.fingerprints(df, "text", "doc_id", k = 3, w = 4)
      .groupBy("doc_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(2L -> 1L))
  }

  test("winnowing df-cap: corpus-wide fingerprints are excluded from pairing") {
    // The same text in 3 docs; cap=2 drops every shared fingerprint
    // before the join, so no pair survives.
    val df = Seq(
      (1L, "x y z x y z x y z"),
      (2L, "x y z x y z x y z"),
      (3L, "x y z x y z x y z")
    ).toDF("doc_id", "text")
    val pairs = Winnow.overlapPairs(df, "text", "doc_id",
      k = 3, w = 2, maxDocFreq = 2, minCommon = 1)
    assert(pairs.count() == 0L)
  }

  test("dup-span: a shared s-token span is a run of s-k+1 grams; within-doc repeats don't count") {
    // A and B share the 7-word run "p q r s t u v" → 5 shared 3-grams,
    // max_span = 5 + 3 - 1 = 7. C repeats a gram only within itself →
    // not cross-doc-shared → absent from the output.
    val df = Seq(
      (1L, "p q r s t u v a b"),
      (2L, "x y p q r s t u v"),
      (3L, "m m m m m m")
    ).toDF("doc_id", "text")
    val got = DupSpan.stats(df, "text", "doc_id", k = 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got == Map(
      1L -> ((7L, 5L, 5L, 7L)),
      2L -> ((7L, 5L, 5L, 7L))))
  }

  test("dup-span: disjoint shared runs report total coverage and the longest run") {
    // A shares "a b c" (1 gram) and "x y z" (1 gram) with B, separated
    // by unshared filler → two islands of length 1 in A.
    val df = Seq(
      (1L, "a b c f1 f2 x y z"),
      (2L, "a b c g1 g2 x y z")
    ).toDF("doc_id", "text")
    val got = DupSpan.stats(df, "text", "doc_id", k = 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(1L -> ((2L, 1L)), 2L -> ((2L, 1L))))
  }

  test("dup-span strip: cuts the exact token extent of qualifying runs, keeps the rest") {
    // Shared 7-token span "p q r s t u v" = 5 shared 3-grams >= minRun 3.
    // A cuts tokens 0..6 keeping "a b"; B cuts 2..8 keeping "x y".
    val df = Seq(
      (1L, "p q r s t u v a b"),
      (2L, "x y p q r s t u v")
    ).toDF("doc_id", "text")
    val got = DupSpan.strip(df, "text", "doc_id", k = 3, minRun = 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(
      1L -> (("a b", 9L, 7L)),
      2L -> (("x y", 9L, 7L))))
  }

  test("dup-span strip: below-threshold runs and unshared docs pass through uncut") {
    val df = Seq(
      (1L, "a b c f1 f2"),   // shares only 1 gram with doc 2 (< minRun)
      (2L, "a b c g1 g2"),
      (3L, "totally unrelated words here")
    ).toDF("doc_id", "text")
    val got = DupSpan.strip(df, "text", "doc_id", k = 3, minRun = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 0L))
  }

  test("quality classifier: repetitive text scores below diverse text, both in (0,1)") {
    val df = Seq(
      (1L, "spam spam spam spam spam spam spam spam"),
      (2L, "a genuinely varied sentence with many distinct informative words here")
    ).toDF("doc_id", "text")
      .withColumn("_w", graft.functions.TextAnalysis.tokens(col("text")))
      .select(col("doc_id"),
        graft.functions.QualityFilters.classifierScoreOf(col("_w")).as("s"))
    val got = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) < got(2L), s"repetition outranked diversity: $got")
    assert(got.values.forall(s => s > 0.0 && s < 1.0), got.toString)
  }

  test("source KL drift matches the hand-computed divergence") {
    // Corpus: x:4 y:4 → q = (1/2, 1/2). Source A p=(3/4, 1/4), B mirrored.
    // KL = 0.75·ln 1.5 + 0.25·ln 0.5 = 0.130812 (6 dp) for both.
    val df = Seq(
      (1L, "x x x y", "A"),
      (2L, "x y y y", "B")
    ).toDF("doc_id", "text", "source")
    val got = Drift.sourceKl(df, "text", "source", minCount = 1)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got == Map("A" -> ((2L, 4L, 0.130812)), "B" -> ((2L, 4L, 0.130812))))
  }

  test("source KL drift: identical distribution gives zero divergence") {
    val df = Seq(
      (1L, "x y", "A"),
      (2L, "x y", "B")
    ).toDF("doc_id", "text", "source")
    val kl = Drift.sourceKl(df, "text", "source", minCount = 1)
      .collect().map(r => r.getDouble(3))
    assert(kl.forall(_ == 0.0))
  }

  test("redaction: masks every email and phone, counts match") {
    val df = Seq((7L, "hi")).toDF("doc_id", "text")
      .withColumn("t", Redaction.withSyntheticPii(col("text"), col("doc_id")))
    val r = df.select(
      col("t"),
      Redaction.emailCount(col("t")).as("ne"),
      Redaction.phoneCount(col("t")).as("np"),
      Redaction.redact(col("t")).as("red")).head()
    assert(r.getString(0) == "hi contact user7@example.com call +1-555-0007")
    assert(r.getLong(1) == 1L && r.getLong(2) == 1L)
    assert(r.getString(3) == "hi contact [EMAIL] call [PHONE]")
  }

  test("splits: deterministic buckets, exhaustive and stable partition") {
    val df = (0L until 200L).toDF("id")
    val splits = df.select(Splits.splitOf(col("id"), 80, 10).as("s"))
      .groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(splits.values.sum == 200L)
    assert(splits.keySet == Set("train", "val", "test"))
    assert(splits("train") > splits("val") && splits("train") > splits("test"))
    // Same ids → same buckets on re-evaluation (pure function of id).
    val b1 = df.select(Splits.bucketOf(col("id"), 100).as("b")).collect().map(_.getLong(0))
    val b2 = df.select(Splits.bucketOf(col("id"), 100).as("b")).collect().map(_.getLong(0))
    assert(b1.sameElements(b2) && b1.forall(b => b >= 0 && b < 100))
  }

  test("splits: sampledPred keeps everything for strata without a rate") {
    val df = Seq((1L, "en"), (2L, "xx"), (3L, "xx")).toDF("id", "lang")
    val kept = df.filter(Splits.sampledPred(col("id"), col("lang"), Seq("en" -> 0)))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L)) // en rate 0 drops all en; unknown strata kept
  }

  test("packing: offsets, window ids, and straddling spans are exact") {
    // ctx=4, one group; docs of 3, 3, 2 tokens in id order:
    //   doc 1: start 0 → pack 0, offset 0, spans 1 (tokens 0..2)
    //   doc 2: start 3 → pack 0, offset 3, spans 2 (tokens 3..5 straddles)
    //   doc 3: start 6 → pack 1, offset 2, spans 1 (tokens 6..7)
    val df = Seq(
      (1L, "g", "a b c"), (2L, "g", "d e f"), (3L, "g", "h i")
    ).toDF("doc_id", "src", "text")
    val got = Packing.assign(df, "text", "doc_id", "src", ctxLen = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got == Map(
      1L -> ((0L, 0L, 1L)),
      2L -> ((0L, 3L, 2L)),
      3L -> ((1L, 2L, 1L))))
  }

  test("idf: hand-computed mean-IDF over a 3-doc corpus") {
    // N=3; df: a=3, b=1, c=1. doc1/doc2 avg = (ln 1 + ln 3)/2; doc3 = ln 1 = 0.
    val df = Seq((1L, "a b"), (2L, "a c"), (3L, "a")).toDF("doc_id", "text")
    val got = Idf.docScores(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val half3 = math.round(math.log(3.0) / 2.0 * 1e6) / 1e6
    assert(got == Map(1L -> ((2L, half3)), 2L -> ((2L, half3)), 3L -> ((1L, 0.0))))
  }

  test("packing: groups pack independently; empty docs span 1 at their boundary") {
    val df = Seq(
      (1L, "g1", "a b c d"), (2L, "g1", ""), (3L, "g1", "e"),
      (4L, "g2", "x y")
    ).toDF("doc_id", "src", "text")
    val got = Packing.assign(df, "text", "doc_id", "src", ctxLen = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got(2L) == ((1L, 0L, 1L))) // empty doc at pack boundary, spans 1
    assert(got(3L) == ((1L, 0L, 1L))) // starts where the empty doc sat
    assert(got(4L) == ((0L, 0L, 1L))) // fresh group restarts at 0
  }

  test("softWeights: every row kept, cluster mass splits to exactly 1") {
    val df = Seq(
      (1L, "dup text"), (2L, "dup text"), (3L, "dup text"), (4L, "dup text"),
      (5L, "unique one"), (6L, "other")
    ).toDF("doc_id", "text")
    val got = Dedup.softWeights(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got.size == 6)                       // nothing dropped
    assert(got(1L) == ((4L, 0.25, 0.5)))        // 1/4, 1/√4
    assert(got(5L) == ((1L, 1.0, 1.0)))
    // each cluster's w_prop mass sums to 1 (up to the round(6))
    val mass = got.values.groupBy(_._1).map { case (n, g) => n -> g.map(_._2).sum }
    assert(mass.forall { case (_, m) => math.abs(m - (m).round.toDouble) < 1e-4 })
  }

  test("domainCap: keeps at most cap per domain, best scores first") {
    val docs = (1L to 30L).map { i =>
      val dom = if (i <= 20) "big" else "small"
      // longer docs score differently; id tie-break keeps it deterministic
      (i, dom, ("w" + i.toString + " the and of common words here") * (1 + (i % 3).toInt))
    }.toDF("doc_id", "source", "text")
    val kept = Curriculum.domainCap(docs, "text", "doc_id", "source", cap = 5)
      .collect()
    val byDom = kept.groupBy(_.getString(1))
    assert(byDom("big").length == 5 && byDom("small").length == 5)
    assert(kept.forall(_.getLong(3) <= 5L))
    // within a domain the kept set is the argmax-by-(score, -id) prefix:
    // ranks are dense 1..5
    assert(byDom("big").map(_.getLong(3)).sorted.toSeq == (1L to 5L))
  }

  test("temperatureSample: rates capped at 1, small sources boosted above " +
       "their proportional share, kept set matches the bucket rule") {
    val docs = ((1L to 80L).map(i => (i, "big", "alpha beta gamma delta")) ++
      (81L to 90L).map(i => (i, "small", "alpha beta gamma delta")))
      .toDF("doc_id", "source", "text")
    val out = Splits.temperatureSample(docs, "text", "source", "doc_id",
      targetFrac = 0.5)
    val rates = out.select("source", "rate_bps").distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rates.values.forall(_ <= 10000L))
    // √-temperature: the small source's keep rate must exceed the big one's
    assert(rates("small") > rates("big"))
    // and exceed the flat targetFrac (boost), while the big source is trimmed
    assert(rates("small") > 5000L && rates("big") < 5000L)
    // kept rows are exactly the bucket-rule rows (spot-check via recompute)
    val kept = out.collect().map(_.getLong(0)).toSet
    val check = docs.select(col("doc_id"), col("source"),
        Splits.bucketOf(col("doc_id"), 10000).as("b")).collect()
      .filter(r => r.getLong(2) < rates(r.getString(1))).map(_.getLong(0)).toSet
    assert(kept == check)
  }

  test("embedding drift: aligned group scores near 1, inverted group scores low") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Seq(1f, 0f), 0), (2L, Seq(1f, 0f), 0), (3L, Seq(0.8f, 0.6f), 0),
      (4L, Seq(-1f, 0f), 1), (5L, Seq(-0.6f, -0.8f), 1))
      .toDF("vec_id", "embedding", "label")
    val got = graft.operators.Drift.embeddingDrift(vecs, "embedding", "label")
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got(0)._1 == 3L && got(1)._1 == 2L)
    // corpus centroid points roughly +x: group 0 aligns, group 1 opposes
    assert(got(0)._2 > 0.9 && got(1)._2 < -0.5)
    // degenerate single-group corpus: group centroid IS the corpus
    // centroid — cosine rounds to exactly 1
    val solo = graft.operators.Drift.embeddingDrift(
      vecs.filter(col("label") === 0), "embedding", "label")
    assert(solo.collect().map(_.getDouble(2)).toSeq == Seq(1.0))
  }

  test("centroidSimMatrix: identical groups cos 1, orthogonal 0, opposed -1") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Seq(1f, 0f), 0), (2L, Seq(1f, 0f), 0),     // centroid (+1, 0)
      (3L, Seq(1f, 0f), 1),                            // centroid (+1, 0)
      (4L, Seq(0f, 1f), 2),                            // centroid (0, +1)
      (5L, Seq(-1f, 0f), 3), (6L, Seq(-1f, 0f), 3))    // centroid (−1, 0)
      .toDF("vec_id", "embedding", "label")
    val got = graft.operators.Drift
      .centroidSimMatrix(vecs, "embedding", "label")
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got.size == 6)                      // C(4,2) unordered pairs
    assert(got((0, 1)) == ((2L, 1L, 1.0)))     // same direction
    assert(got((0, 2))._3 == 0.0)              // orthogonal
    assert(got((0, 3))._3 == -1.0)             // opposed
    assert(got((2, 3))._3 == 0.0)
  }

  test("neymanAllocation: budget follows N_h·σ_h; flat and singleton strata get zero") {
    import spark.implicits._
    // a: {0,20} → n=2, σ=10, term 20; b: {0,0,30,30} → n=4, σ=15, term 60;
    // flat: {10,10} → σ=0; solo: {5} → σ undefined → alloc 0 (reported).
    val df = (Seq(("a", 0.0), ("a", 20.0), ("b", 0.0), ("b", 0.0),
      ("b", 30.0), ("b", 30.0), ("flat", 10.0), ("flat", 10.0),
      ("solo", 5.0))).toDF("src", "v")
    val out = graft.operators.Splits
      .neymanAllocation(df, "src", "v", budget = 100L)
      .as[(String, Long, Option[Double], Option[Double], Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("a") == (("a", 2L, Some(10.0), Some(0.25), 25L)))
    assert(out("b") == (("b", 4L, Some(15.0), Some(0.75), 75L)))
    assert(out("flat") == (("flat", 2L, Some(0.0), Some(0.0), 0L)))
    assert(out("solo") == (("solo", 1L, None, Some(0.0), 0L)))
    // floored allocations never exceed the budget
    assert(out.values.map(_._5).sum <= 100L)
  }

  test("withinGroupAlignment: exact mean pairwise cosine without pair enumeration") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Seq(1f, 0f), 0), (2L, Seq(1f, 0f), 0),          // aligned: 1
      (3L, Seq(1f, 0f), 1), (4L, Seq(-1f, 0f), 1),         // opposed: −1
      (5L, Seq(1f, 0f), 2), (6L, Seq(0f, 1f), 2),          // orthogonal pair
      (7L, Seq(0f, 1f), 2),
      (8L, Seq(1f, 0f), 3))                                 // singleton
      .toDF("vec_id", "embedding", "label")
    val got = graft.operators.Drift
      .withinGroupAlignment(vecs, "embedding", "label")
      .as[(Int, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(0) == ((2L, Some(1.0))))
    assert(got(1) == ((2L, Some(-1.0))))
    // group 2 pairs: (5,6)=0, (5,7)=0, (6,7)=1 → mean = 2/6 = 0.333333
    assert(got(2) == ((3L, Some(0.333333))))
    assert(got(3) == ((1L, None)))   // no pairs → undefined
  }

  test("cluster split: near-dup clusters land in one split, singletons match splitOf") {
    import spark.implicits._
    val docs = Seq(1L, 2L, 3L, 10L, 11L, 20L, 21L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val got = Splits.clusterSplit(docs, pairs, "doc_id", trainPct = 80, valPct = 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // every cluster member carries the component-min representative and
    // therefore ONE split
    assert(Seq(1L, 2L, 3L).map(got(_)._1).distinct == Seq(1L))
    assert(Seq(1L, 2L, 3L).map(got(_)._2).distinct.size == 1)
    assert(Seq(10L, 11L).map(got(_)._1).distinct == Seq(10L))
    assert(Seq(10L, 11L).map(got(_)._2).distinct.size == 1)
    // singletons degrade to the plain per-id split exactly
    val plain = docs.select(col("doc_id"),
        Splits.splitOf(col("doc_id"), 80, 10).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    Seq(20L, 21L).foreach { id =>
      assert(got(id)._1 == id && got(id)._2 == plain(id))
    }
  }

  test("scorePsi: identical sides score 0, shifted distributions score high") {
    // same texts on both sides → per-bucket shares equal → every term 0
    val same = (1 to 20).flatMap(i => Seq(
      (i.toLong, s"doc number $i with some words", "A"),
      (100L + i, s"doc number $i with some words", "B")))
      .toDF("doc_id", "text", "side")
    val s0 = graft.operators.Drift.scorePsi(same, "text", col("side") === "A")
      .collect().head
    assert(s0.getLong(0) == 20L && s0.getLong(1) == 20L)
    assert(s0.getDouble(2) == 0.0)
    // side A short/repetitive, side B long/diverse → bucket mass moves
    val shifted = ((1 to 20).map(i => (i.toLong, "x x", "A")) ++
      (1 to 20).map(i => (200L + i,
        s"many varied quality tokens compose document $i of the cleaner corpus", "B")))
      .toDF("doc_id", "text", "side")
    val s1 = graft.operators.Drift.scorePsi(shifted, "text", col("side") === "A")
      .collect().head
    assert(s1.getDouble(2) > 0.25, s"psi ${s1.getDouble(2)} should flag the shift")
  }

  test("distinctNgramRatio: repeated phrasing scores low, fresh text scores 1") {
    val docs = Seq(
      (1L, "a b c a b c a b c", "loop"),   // 7 3-grams, 3 distinct
      (2L, "p q r s t u v w x", "fresh"))  // 7 3-grams, all distinct
      .toDF("doc_id", "text", "source")
    val got = graft.operators.Novelty.distinctNgramRatio(docs, "text", "source", 3)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got("loop") == ((7L, 3L, 0.428571)))
    assert(got("fresh") == ((7L, 7L, 1.0)))
  }

  test("scoreNormalize: within-group quantile positions, singleton groups pin to 0") {
    // distinct lengths → distinct scores; percent_rank = (rank−1)/(n−1)
    val docs = Seq(
      (1L, "short words here", "en"),
      (2L, "a much longer document with many more quality words inside", "en"),
      (3L, "medium length document with words", "en"),
      (4L, "solo", "de"))
      .toDF("doc_id", "text", "lang")
    val got = Curriculum.scoreNormalize(docs, "text", "doc_id", "lang")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got(4L) == 0.0)
    assert(Seq(got(1L), got(2L), got(3L)).sorted == Seq(0.0, 0.5, 1.0))
  }

  test("binPack: NFD hand-check — no-fit opens a bin, oversize gets its own, empty docs ride along") {
    def text(n: Int) = Seq.fill(n)("w").mkString(" ")
    // all ids ≡ 0 mod 1 → one shard; tokens desc: 15, 7, 5, 4, 3, 1, 0
    val docs = Seq(
      (1L, text(7)), (2L, text(5)), (3L, text(4)), (4L, text(3)),
      (5L, text(1)), (6L, text(15)), (7L, ""))
      .toDF("doc_id", "text")
    val got = graft.operators.Packing.binPack(docs, "text", "doc_id",
        capacity = 10L, nShards = 1)
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    // 15 → bin0 (oversize, alone: rem goes negative so 7 opens bin1);
    // 7 → bin1 (rem 3); 5 → bin2 (rem 5); 4 → bin2 (rem 1);
    // 3 → bin3 (rem 7); 1 → bin3 (rem 6); 0-token doc fits bin3
    assert(got == Map(6L -> 0, 1L -> 1, 2L -> 2, 3L -> 2, 4L -> 3,
      5L -> 3, 7L -> 3))
  }

  test("entropy: uniform tokens hit ln(k), repetition hits 0, empty docs absent") {
    val docs = Seq(
      (1L, "a b c d"),      // 4 uniform types → ln 4
      (2L, "x x x x x"),    // one type → 0
      (3L, "a a b b"),      // 2 uniform types over 4 tokens → ln 2
      (4L, "")              // no tokens → no row
    ).toDF("doc_id", "text")
    val got = Entropy.docEntropy(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(1L)._1 == 4L && math.abs(got(1L)._2 - math.log(4)) < 1e-6)
    assert(got(2L)._1 == 5L && math.abs(got(2L)._2) < 1e-9)
    assert(math.abs(got(3L)._2 - math.log(2)) < 1e-6)
  }

  test("tokenBudgetSelect equals the global prefix rule at every budget, including boundaries") {
    val docs = Tables.load(spark, sf, "documents")
    // the semantics, stated directly: global (score desc, id) running
    // total, kept while the inclusive cumsum fits
    val scored = docs
      .withColumn("_w", TextAnalysis.tokens(col("text")))
      .select(col("doc_id"),
        QualityFilters.classifierScoreOf(col("_w")).as("q_score"),
        TextAnalysis.tokenCountOf(col("_w")).as("n_tokens"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("q_score").desc, col("doc_id").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val ranked = scored.withColumn("_cum", sum(col("n_tokens")).over(w))
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    val total = ranked.map(_._2).max
    // one mid budget, one that lands EXACTLY on a doc boundary (the
    // inclusive-≤ edge), zero, and beyond-total
    val exactBoundary = ranked(ranked.length / 3)._2
    for (budget <- Seq(0L, 5000L, exactBoundary, total, total + 1000L)) {
      val expect = ranked.filter(_._2 <= budget).map(_._1).toSet
      val got = Curriculum.tokenBudgetSelect(docs, "text", "doc_id", budget)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got == expect, s"budget $budget: ${got.size} kept vs ${expect.size}")
    }
  }

  test("timeSplitAudit: side totals, entity census, and leak fraction over test entities") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val cutoff = ts("2024-01-03 00:00:00")
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-04 10:00:00")), // leaky
      (2L, ts("2024-01-02 10:00:00")),                                  // train only
      (3L, ts("2024-01-05 10:00:00")), (3L, ts("2024-01-06 10:00:00")), // test only
      (4L, ts("2024-01-02 23:59:59")), (4L, ts("2024-01-03 00:00:00"))) // boundary: 2nd row is TEST
      .toDF("user_id", "ts")
    val Array(r) = Splits.timeSplitAudit(df, "user_id", "ts", cutoff.getTime)
      .as[(Long, Long, Long, Long, Long, Option[Double])].collect()
    // train rows: u1@01, u2@02, u4@02 = 3; test rows: u1@04, u3@05, u3@06, u4@03 = 4
    // train entities {1,2,4}, test entities {1,3,4}, leaky {1,4} -> 2/3
    assert(r == ((3L, 4L, 3L, 3L, 2L, Some(0.666667))))
  }

  test("jsDivergence: one-sided tokens stay finite; identical slices score 0") {
    import graft.operators.Entropy
    // A: "x x y" (n=3), B: "x z" (n=2): y and z are one-sided — KL
    // would be infinite, JSD's midpoint keeps them at (c/n)·ln2.
    val docs = Seq((1L, "en", "x x y"), (2L, "es", "x z"),
      (3L, "zh", "ignored entirely")).toDF("doc_id", "lang", "text")
    val r = Entropy.jsDivergence(docs, "text",
      predA = "lang = 'en'", predB = "lang = 'es'")
      .as[(Long, Long, Long, Option[Double], Option[Double])].head()
    assert(r == ((3L, 2L, 3L, Some(0.294784), Some(0.425284))))

    // Identical distributions → 0.
    val same = Seq((1L, "en", "x y"), (2L, "es", "x y"))
      .toDF("doc_id", "lang", "text")
    assert(Entropy.jsDivergence(same, "text", "lang = 'en'", "lang = 'es'")
      .as[(Long, Long, Long, Option[Double], Option[Double])]
      .head()._4.contains(0.0))

    // Empty side → NULL.
    val one = Seq((1L, "en", "x")).toDF("doc_id", "lang", "text")
    assert(Entropy.jsDivergence(one, "text", "lang = 'en'", "lang = 'es'")
      .as[(Long, Long, Long, Option[Double], Option[Double])]
      .head()._4.isEmpty)
  }

  test("heapsFit: first-bucket vocab counting, 2-point fit, degenerate guard") {
    import graft.operators.Zipf
    // ids 0–4 → bucket 0 (2 tokens each: vocab {a, b});
    // ids 5–9 → bucket 1 (3 tokens each: {a, c, d} — `a` NOT new).
    // cum: (10, 2), (25, 4) → β = ln2/ln2.5, logK from the same line.
    val docs = ((0L to 4L).map(i => (i, "a b"))
      ++ (5L to 9L).map(i => (i, "a c d"))).toDF("doc_id", "text")
    val rows = Zipf.heapsFit(docs, "text", "doc_id", nBuckets = 2)
      .as[(Long, Long, Long, Option[Double], Option[Double])]
      .collect().sortBy(_._1)
    assert(rows.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq((0L, 10L, 2L), (1L, 25L, 4L)))
    assert(rows.forall(r => r._4.contains(0.756471) && r._5.contains(-1.048691)))

    // Single document → one bucket → one fit point → NULL fit, curve kept.
    val single = Seq((7L, "a b c")).toDF("doc_id", "text")
    val rs = Zipf.heapsFit(single, "text", "doc_id", nBuckets = 4)
      .as[(Long, Long, Long, Option[Double], Option[Double])].collect()
    assert(rs.length == 1 && rs.head._2 == 3L && rs.head._3 == 3L
      && rs.head._4.isEmpty && rs.head._5.isEmpty)
  }

  test("qualityTopPercent: ceil(pct·n/100) kept per domain, rank-dense") {
    val docs = (1L to 30L).map { i =>
      val dom = if (i <= 20) "big" else "small"
      (i, dom, ("w" + i.toString + " the and of common words here") * (1 + (i % 3).toInt))
    }.toDF("doc_id", "source", "text")
    val kept = Curriculum.qualityTopPercent(docs, "text", "doc_id",
      "source", pct = 30).collect()
    val byDom = kept.groupBy(_.getString(1))
    // ceil(0.3·20)=6, ceil(0.3·10)=3 — proportional, unlike domainCap.
    assert(byDom("big").length == 6 && byDom("small").length == 3)
    assert(byDom("big").map(_.getLong(3)).sorted.toSeq == (1L to 6L))
    // d_n carries the domain size for auditability.
    assert(byDom("big").forall(_.getLong(4) == 20L)
      && byDom("small").forall(_.getLong(4) == 10L))

    // Boundary: pct=100 keeps everything; pct=1 keeps exactly 1 per domain.
    assert(Curriculum.qualityTopPercent(docs, "text", "doc_id", "source",
      pct = 100).count() == 30L)
    val one = Curriculum.qualityTopPercent(docs, "text", "doc_id", "source",
      pct = 1).collect()
    assert(one.groupBy(_.getString(1)).values.forall(_.length == 1))
  }
}
