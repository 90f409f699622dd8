package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Deterministic corpus splitting and sampling: hash-bucket assignment
  * to train/val/test splits and per-stratum (e.g. per-language)
  * downsampling to target rates — the data-mixture machinery of a
  * pre-training pipeline.
  *
  * The bucket is a pure function of the id (Rabin–Karp fold over its
  * decimal string, [[TextAnalysis.fingerprint]] — parity with DuckDB is
  * already gated by q_fingerprint), so membership is stable across
  * runs, machines, and engines: re-running the pipeline on new data
  * never reassigns an old row. That determinism is the point —
  * `rand()`-based sampling is irreproducible and `TABLESAMPLE` is
  * engine-specific.
  *
  * Scale shape: bucket/split/keep are narrow codegen projections over
  * the scan (no shuffle, no state); the demo aggregates below add one
  * map-side-combined hash agg. Filtering to a split is a predicate —
  * at 100 TB the sampled corpus never materializes unsampled.
  */
object Splits {

  /** Stable bucket in [0, buckets) from the row id. */
  def bucketOf(id: Column, buckets: Int): Column =
    pmod(TextAnalysis.fingerprint(id.cast("string")), lit(buckets.toLong))

  /** train/val/test label by bucket percentile. */
  def splitOf(id: Column, trainPct: Int, valPct: Int): Column = {
    val b = bucketOf(id, 100)
    when(b < trainPct, "train")
      .when(b < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** CLUSTER-AWARE split assignment — the leakage-free variant of
    * [[splitOf]]: near-duplicate documents must land in the SAME split
    * (a train/test pair of near-dups is evaluation contamination), so
    * the split hash is computed over each doc's CLUSTER REPRESENTATIVE
    * (component min id from [[Dedup.connectedComponents]]) instead of
    * the doc's own id. Unpaired docs are their own singleton cluster —
    * for them this degrades to [[splitOf]] exactly.
    *
    * Scale shape: the CC label table has one row per PAIRED doc (a
    * small fraction of the corpus); the label join is one id-keyed
    * equi-join and the split itself stays a narrow projection. Output:
    * (idCol, cluster_rep, split).
    */
  def clusterSplit(df: DataFrame, pairs: DataFrame, idCol: String,
                   trainPct: Int, valPct: Int, maxIters: Int = 50): DataFrame = {
    val labels = Dedup.connectedComponents(pairs, maxIters)
    val rep = coalesce(col("lbl"), col(idCol))
    df.join(labels, df(idCol) === labels("id"), "left")
      .select(col(idCol), rep.as("cluster_rep"),
        splitOf(rep, trainPct, valPct).as("split"))
  }

  /** DuckDB oracle for [[clusterSplit]] over
    * [[Dedup.ngramJaccardPairs]]: recursive-CTE closure → component min
    * → the same split hash over the representative.
    */
  def duckClusterSplitNgram(tbl: String, textCol: String, idCol: String,
                            n: Int, threshold: Double, maxDocId: Long,
                            trainPct: Int, valPct: Int): String = {
    val pairsSql = Dedup.duckNgramJaccardPairs(tbl, textCol, idCol, n, threshold, maxDocId)
    val rep = s"COALESCE(cc.lbl, d.$idCol)"
    s"""WITH pairs AS ($pairsSql),
       |e AS (SELECT id_a AS src, id_b AS dst FROM pairs
       |      UNION SELECT id_b, id_a FROM pairs),
       |cc AS (
       |  WITH RECURSIVE reach(id, lbl) AS (
       |    SELECT src, src FROM e
       |    UNION
       |    SELECT e.src, reach.lbl FROM e JOIN reach ON e.dst = reach.id)
       |  SELECT id, min(lbl) AS lbl FROM reach GROUP BY id)
       |SELECT d.$idCol, $rep AS cluster_rep,
       |       ${duckSplit(rep, trainPct, valPct)} AS split
       |FROM $tbl d LEFT JOIN cc ON d.$idCol = cc.id""".stripMargin
  }

  /** Per-(stratum, split) row counts — the stratification audit. */
  /** TEMPORAL train/test split audit: split at a time cutoff (the only
    * leak-free split for forecasting-style training) and report the
    * ENTITY LEAKAGE the cutoff still allows — entities (users, devices,
    * documents' sources…) with rows on BOTH sides, which is fine for
    * time-series models but poisons per-entity generalization claims.
    * One entity-keyed exchange (per-entity side flags) + one global
    * aggregate; exact integers, one final division.
    * Output 1 row: (n_train, n_test, n_train_entities, n_test_entities,
    * n_leaky_entities, leaky_frac) — leaky_frac over TEST entities
    * (the fraction of evaluation entities the model saw in training).
    */
  def timeSplitAudit(df: DataFrame, entityCol: String, tsCol: String,
                     cutoffMs: Long): DataFrame = {
    val isTrain = unix_millis(col(tsCol)) < cutoffMs
    val perEntity = df
      .groupBy(col(entityCol))
      .agg(sum(when(isTrain, 1L).otherwise(0L)).as("_tr"),
        sum(when(isTrain, 0L).otherwise(1L)).as("_te"))
    perEntity.agg(
        sum(col("_tr")).as("n_train"),
        sum(col("_te")).as("n_test"),
        sum(when(col("_tr") > 0L, 1L).otherwise(0L)).as("n_train_entities"),
        sum(when(col("_te") > 0L, 1L).otherwise(0L)).as("n_test_entities"),
        sum(when(col("_tr") > 0L && col("_te") > 0L, 1L).otherwise(0L))
          .as("n_leaky_entities"))
      .select(col("n_train"), col("n_test"), col("n_train_entities"),
        col("n_test_entities"), col("n_leaky_entities"),
        when(col("n_test_entities") === 0L, lit(null).cast("double"))
          .otherwise(round(col("n_leaky_entities").cast("double")
            / col("n_test_entities").cast("double"), 6)).as("leaky_frac"))
  }

  /** DuckDB oracle twin of [[timeSplitAudit]]. */
  def duckTimeSplitAudit(rel: String, entityCol: String, tsCol: String,
                         cutoffMs: Long): String =
    s"""WITH pe AS (
       |  SELECT $entityCol,
       |         CAST(count(*) FILTER (WHERE epoch_ms($tsCol) < $cutoffMs) AS BIGINT) AS tr,
       |         CAST(count(*) FILTER (WHERE epoch_ms($tsCol) >= $cutoffMs) AS BIGINT) AS te
       |  FROM $rel GROUP BY 1),
       |g AS (SELECT CAST(sum(tr) AS BIGINT) AS n_train,
       |             CAST(sum(te) AS BIGINT) AS n_test,
       |             CAST(count(*) FILTER (WHERE tr > 0) AS BIGINT) AS n_train_entities,
       |             CAST(count(*) FILTER (WHERE te > 0) AS BIGINT) AS n_test_entities,
       |             CAST(count(*) FILTER (WHERE tr > 0 AND te > 0) AS BIGINT) AS n_leaky_entities
       |      FROM pe)
       |SELECT n_train, n_test, n_train_entities, n_test_entities,
       |       n_leaky_entities,
       |       CASE WHEN n_test_entities <> 0
       |            THEN round(CAST(n_leaky_entities AS DOUBLE)
       |                       / CAST(n_test_entities AS DOUBLE), 6)
       |            END AS leaky_frac
       |FROM g""".stripMargin

  def splitCounts(df: DataFrame, idCol: String, stratumCol: String,
                  trainPct: Int, valPct: Int): DataFrame =
    df.withColumn("split", splitOf(col(idCol), trainPct, valPct))
      .groupBy(col(stratumCol), col("split"))
      .agg(count(lit(1)).as("n"))

  /** Keep-predicate for per-stratum target rates (rate in [0,1], in
    * hundredths): row kept iff bucket(id) < rate·100. Strata absent
    * from `rates` keep everything.
    */
  def sampledPred(id: Column, stratum: Column,
                  rates: Seq[(String, Int)]): Column = {
    val b = bucketOf(id, 100)
    rates.foldRight(lit(true)) { case ((s, pct), els) =>
      when(stratum === s, b < pct).otherwise(els)
    }
  }

  /** Per-stratum totals vs sampled counts under `rates` — the mixture
    * audit (expected ≈ total · rate).
    */
  def sampleAudit(df: DataFrame, idCol: String, stratumCol: String,
                  rates: Seq[(String, Int)]): DataFrame =
    df.groupBy(col(stratumCol))
      .agg(
        count(lit(1)).as("n_total"),
        sum(sampledPred(col(idCol), col(stratumCol), rates).cast("long"))
          .as("n_sampled"))

  /** Temperature-based mixture weights over sources: each source's
    * sampling weight ∝ (token count)^(1/2) — the standard "temperature
    * sampling" that upweights small sources relative to proportional
    * sampling (α = 0.5 here because `sqrt` is IEEE-correctly-rounded
    * in every engine; a general `pow` is not, and α=0.5 is the common
    * default in multilingual-mixture recipes anyway).
    *
    * Scale shape: one map-side-combined token-count aggregate to
    * source cardinality (tiny), then the normalizing denominator is a
    * SORTED fold over the collected per-source sqrt terms — source
    * cardinality is dozens, so the single-row fold is metadata work;
    * the weights join back via broadcast.
    * Output: (srcCol, n_tokens, weight).
    */
  def mixtureWeights(docs: DataFrame, textCol: String, srcCol: String): DataFrame = {
    val perSrc = docs.groupBy(col(srcCol))
      .agg(sum(TextAnalysis.tokenCount(col(textCol))).as("n_tokens"))
    val denom = perSrc
      .agg(sort_array(collect_list(struct(col(srcCol), col("n_tokens")))).as("_t"))
      .select(aggregate(col("_t"), lit(0.0),
        (acc, t) => acc + sqrt(t.getField("n_tokens").cast("double"))).as("_denom"))
    perSrc.crossJoin(broadcast(denom))
      .select(col(srcCol), col("n_tokens"),
        round(sqrt(col("n_tokens").cast("double")) / col("_denom"), 6).as("weight"))
  }

  /** Temperature-scaled mixture RESAMPLING — the step that applies
    * [[mixtureWeights]]-style τ=0.5 target shares to the corpus. Each
    * source's target token share is q_s ∝ √n_s (the multilingual-
    * training temperature rule: big sources demoted, small sources
    * boosted), the global budget is `targetFrac` of all tokens, and
    * each document is kept by a deterministic per-source Bernoulli:
    * rate_s = min(1, targetFrac·T·q_s / n_s), quantized to basis
    * points, tested against the id's Rabin–Karp bucket ([[bucketOf]]).
    * Deterministic end-to-end: the only non-integer inputs are √ and
    * one fixed-order multiply/divide chain (√ is correctly rounded per
    * IEEE 754, and the fold order over sources is pinned by the same
    * sorted fold as [[mixtureWeights]]), so both engines compute the
    * same basis points and the same kept set.
    *
    * Scale shape: one source-keyed partial-agg shuffle for token
    * counts (source cardinality is tiny), a one-row denominator fold,
    * and a BROADCAST join of the rate table back to the corpus — the
    * corpus itself is never shuffled; keep/drop is a narrow filter.
    *
    * Output: kept rows as (idCol, srcCol, rate_bps).
    */
  def temperatureSample(docs: DataFrame, textCol: String, srcCol: String,
                        idCol: String, targetFrac: Double): DataFrame = {
    val perSrc = docs.groupBy(col(srcCol))
      .agg(sum(TextAnalysis.tokenCount(col(textCol))).as("n_tokens"))
    // One metadata row: exact-integer token total (order-free) + the
    // √-denominator as a SORTED fold (fp order pinned, engine-exact).
    val denom = perSrc
      .agg(sort_array(collect_list(struct(col(srcCol), col("n_tokens")))).as("_t"))
      .select(
        aggregate(col("_t"), lit(0.0),
          (acc, t) => acc + sqrt(t.getField("n_tokens").cast("double"))).as("_denom"),
        aggregate(col("_t"), lit(0L),
          (acc, t) => acc + t.getField("n_tokens")).as("_total"))
    val rRaw = (lit(targetFrac) * col("_total").cast("double")) *
      (sqrt(col("n_tokens").cast("double")) / col("_denom")) /
      col("n_tokens").cast("double")
    val rates = perSrc.crossJoin(broadcast(denom))
      .select(col(srcCol),
        round(least(lit(1.0), rRaw) * 10000).cast("long").as("rate_bps"))
    docs.select(col(idCol), col(srcCol))
      .join(broadcast(rates), srcCol)
      .filter(bucketOf(col(idCol), 10000) < col("rate_bps"))
      .select(col(idCol), col(srcCol), col("rate_bps"))
  }

  /** DuckDB oracle twin of [[temperatureSample]] — same sorted fold,
    * same fixed-order rate arithmetic, same Rabin–Karp bucket test.
    */
  def duckTemperatureSample(tbl: String, textCol: String, srcCol: String,
                            idCol: String, targetFrac: Double): String =
    s"""WITH d AS (SELECT $srcCol, ${TextAnalysis.duckTokensBind(textCol)} AS w FROM $tbl),
       |per AS (SELECT $srcCol, CAST(sum(len(w)) AS BIGINT) AS n_tokens
       |        FROM d GROUP BY 1),
       |dn AS (SELECT list_reduce(
       |         list_prepend(0.0, list(sqrt(CAST(n_tokens AS DOUBLE)) ORDER BY $srcCol, n_tokens)),
       |         (acc, x) -> acc + x) AS denom,
       |       CAST(sum(n_tokens) AS BIGINT) AS total FROM per),
       |rates AS (SELECT $srcCol,
       |            CAST(round(least(CAST(1 AS DOUBLE),
       |              (CAST($targetFrac AS DOUBLE) * CAST(total AS DOUBLE))
       |                * (sqrt(CAST(n_tokens AS DOUBLE)) / denom)
       |                / CAST(n_tokens AS DOUBLE)) * 10000) AS BIGINT) AS rate_bps
       |          FROM per, dn)
       |SELECT t.$idCol, t.$srcCol, r.rate_bps
       |FROM $tbl t JOIN rates r ON t.$srcCol = r.$srcCol
       |WHERE ${duckBucket(s"t.$idCol", 10000)} < r.rate_bps""".stripMargin

  /** DuckDB oracle twin of [[mixtureWeights]] — same sorted fold. */
  def duckMixtureWeights(tbl: String, textCol: String, srcCol: String): String =
    s"""WITH d AS (SELECT $srcCol, ${TextAnalysis.duckTokensBind(textCol)} AS w FROM $tbl),
       |per AS (SELECT $srcCol, CAST(sum(len(w)) AS BIGINT) AS n_tokens
       |        FROM d GROUP BY 1),
       |dn AS (SELECT list_reduce(
       |         list_prepend(0.0, list(sqrt(CAST(n_tokens AS DOUBLE)) ORDER BY $srcCol, n_tokens)),
       |         (acc, x) -> acc + x) AS denom FROM per)
       |SELECT $srcCol, n_tokens,
       |       round(sqrt(CAST(n_tokens AS DOUBLE)) / denom, 6) AS weight
       |FROM per, dn""".stripMargin

  // --------------------------------------------------- DuckDB oracle SQL

  /** Bucket twin: the Rabin–Karp fold over the id's decimal string. */
  def duckBucket(idCol: String, buckets: Int): String =
    s"(${TextAnalysis.duckFingerprint(s"CAST($idCol AS VARCHAR)")}) % $buckets"

  def duckSplit(idCol: String, trainPct: Int, valPct: Int): String =
    s"CASE WHEN ${duckBucket(idCol, 100)} < $trainPct THEN 'train' " +
      s"WHEN ${duckBucket(idCol, 100)} < ${trainPct + valPct} THEN 'val' " +
      s"ELSE 'test' END"

  def duckSplitCounts(tbl: String, idCol: String, stratumCol: String,
                      trainPct: Int, valPct: Int): String =
    s"""SELECT $stratumCol, ${duckSplit(idCol, trainPct, valPct)} AS split,
       |       count(*) AS n
       |FROM $tbl GROUP BY 1, 2""".stripMargin

  def duckSampledPred(idCol: String, stratumCol: String,
                      rates: Seq[(String, Int)]): String =
    rates.foldRight("TRUE") { case ((s, pct), els) =>
      // SQL-escape the stratum literal (' -> '') so a quote in a
      // stratum value can't break the rendered oracle query.
      val lit = s.replace("'", "''")
      s"CASE WHEN $stratumCol = '$lit' THEN ${duckBucket(idCol, 100)} < $pct ELSE $els END"
    }

  def duckSampleAudit(tbl: String, idCol: String, stratumCol: String,
                      rates: Seq[(String, Int)]): String =
    s"""SELECT $stratumCol, count(*) AS n_total,
       |       CAST(sum(CAST(${duckSampledPred(idCol, stratumCol, rates)} AS BIGINT)) AS BIGINT) AS n_sampled
       |FROM $tbl GROUP BY 1""".stripMargin

  /** Deterministic EPOCH SHUFFLE: a fresh pseudo-random but fully
    * reproducible visit order per training epoch — the loader-side
    * "shuffle each epoch with a seeded RNG", engine-side. The order key
    * is the Rabin–Karp fingerprint of `epoch:id` (epoch-salted, so
    * orders decorrelate across epochs), and positions are assigned
    * WITHIN (epoch, shard): shard-local ordering means each of the
    * `nShards` streams sorts independently — the 100 TB shape, since a
    * global per-epoch sort of the corpus is exactly what a training
    * loader never needs (it reads shards in parallel anyway).
    *
    * Scale shape: explode over `epochs` (small constant), one
    * (epoch, shard)-keyed window; no join, integer-only arithmetic so
    * the oracle is exact.
    *
    * Output: (idCol, epoch, shard, pos) — pos is 1-based within the
    * (epoch, shard) stream.
    */
  def epochShuffle(docs: DataFrame, idCol: String,
                   epochs: Int, nShards: Int): DataFrame = {
    val key = TextAnalysis.fingerprint(
      concat(col("epoch").cast("string"), lit(":"), col(idCol).cast("string")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("epoch"), col("shard"))
      .orderBy(key.asc, col(idCol).asc)
    docs
      .select(col(idCol), explode(sequence(lit(0), lit(epochs - 1))).as("epoch"))
      .withColumn("shard", bucketOf(col(idCol), nShards))
      .withColumn("pos", row_number().over(w).cast("long"))
  }

  /** DuckDB oracle for [[epochShuffle]] — same salted fingerprint key,
    * same tie-break.
    */
  def duckEpochShuffle(tbl: String, idCol: String,
                       epochs: Int, nShards: Int): String = {
    val key = TextAnalysis.duckFingerprint(
      s"(CAST(epoch AS VARCHAR) || ':' || CAST($idCol AS VARCHAR))")
    s"""WITH e AS (SELECT $idCol, i AS epoch
       |           FROM $tbl, unnest(range(0, $epochs)) t(i))
       |SELECT $idCol, CAST(epoch AS INTEGER) AS epoch,
       |       ${duckBucket(idCol, nShards)} AS shard,
       |       CAST(ROW_NUMBER() OVER (
       |         PARTITION BY epoch, ${duckBucket(idCol, nShards)}
       |         ORDER BY ($key) ASC, $idCol ASC) AS BIGINT) AS pos
       |FROM e""".stripMargin
  }

  /** NEYMAN optimal allocation of an annotation/evaluation budget
    * across strata — "you can afford to label `budget` documents; how
    * many from each source": proportional allocation wastes labels on
    * big homogeneous strata, Neyman allocation n_h ∝ N_h·σ_h (Neyman
    * 1934) minimizes the variance of the stratified estimate by
    * spending budget where both size AND spread are. σ_h here is the
    * per-stratum std-dev of the measured column (e.g. doc length or a
    * quality score — whatever the estimate targets).
    *
    * Exactness: per-stratum moments are exact µ-integer DECIMAL sums
    * from ONE pass; σ_h = √((n·Σx² − (Σx)²)/n²)/10⁶ is one mirrored
    * double expression per stratum; the shares normalize against a
    * stratum-sorted left fold of the N·σ terms (the q_zipf_fit
    * convention) so the denominator adds in identical order on both
    * engines. Allocations are reported as exact-share doubles AND the
    * floored integer allocation (the caller tops up the remainder by
    * share order). Single-row strata have σ undefined → allocation 0
    * (reported, not silently dropped).
    *
    * Output per stratum: (stratumCol, n_h, sigma, share, alloc).
    */
  def neymanAllocation(df: DataFrame, stratumCol: String, valCol: String,
                       budget: Long): DataFrame = {
    require(budget > 0, s"neymanAllocation: budget=$budget")
    def d38(c: Column) = c.cast("decimal(38,0)")
    def d(c: Column) = c.cast("double")
    val vmu = floor(d(col(valCol)) * 1e6 + 0.5).cast("decimal(38,0)")
    val st = df.select(col(stratumCol).as("_h"), vmu.as("_v"))
      .groupBy(col("_h"))
      .agg(count(lit(1L)).as("n_h"), sum(col("_v")).as("_s"),
        sum(col("_v") * col("_v")).as("_q"))
    val sigma = when(col("n_h") < 2L, lit(null).cast("double"))
      .otherwise(sqrt((d(col("n_h")) * d(col("_q")) - d(col("_s")) * d(col("_s")))
        / (d(col("n_h")) * d(col("n_h")))) / 1e6)
    val term = coalesce(d(col("n_h")) * col("_sigma"), lit(0.0))
    val withSigma = st.withColumn("_sigma", round(sigma, 6))
    def fold(l: Column, f: Column => Column): Column =
      aggregate(l, lit(0.0), (acc, s) => acc + f(s))
    val total = withSigma
      .agg(sort_array(collect_list(struct(col("_h"), col("n_h"),
        col("_sigma")))).as("_l"))
      .select(fold(col("_l"), s =>
        coalesce(s.getField("n_h").cast("double") * s.getField("_sigma"),
          lit(0.0))).as("_tot"))
    withSigma.crossJoin(broadcast(total))
      .select(col("_h").as(stratumCol), col("n_h"),
        col("_sigma").as("sigma"),
        when(col("_tot") > 0.0, round(term / col("_tot"), 6))
          .as("share"),
        when(col("_tot") > 0.0,
          floor(term / col("_tot") * budget).cast("long"))
          .otherwise(lit(0L)).as("alloc"))
  }

  /** DuckDB oracle twin of [[neymanAllocation]] — same exact moments,
    * same rounded σ, same stratum-sorted denominator fold.
    */
  def duckNeymanAllocation(rel: String, stratumCol: String, valCol: String,
                           budget: Long): String =
    s"""WITH st AS (
       |  SELECT $stratumCol AS h, CAST(count(*) AS BIGINT) AS n_h,
       |         sum(v) AS s, sum(v * v) AS q
       |  FROM (SELECT $stratumCol,
       |               CAST(floor(CAST($valCol AS DOUBLE) * 1000000.0 + 0.5)
       |                    AS HUGEINT) AS v
       |        FROM $rel)
       |  GROUP BY 1),
       |ws AS (
       |  SELECT h, n_h,
       |         CASE WHEN n_h >= 2 THEN
       |           round(sqrt((CAST(n_h AS DOUBLE) * CAST(q AS DOUBLE)
       |                       - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
       |                      / (CAST(n_h AS DOUBLE) * CAST(n_h AS DOUBLE)))
       |                 / 1e6, 6) END AS sigma
       |  FROM st),
       |tot AS (
       |  SELECT list_reduce(list_prepend(0.0,
       |           list(coalesce(CAST(n_h AS DOUBLE) * sigma, 0.0) ORDER BY h)),
       |           (acc, x) -> acc + x) AS t
       |  FROM ws)
       |SELECT h AS $stratumCol, n_h, sigma,
       |       CASE WHEN t > 0.0 THEN
       |         round(coalesce(CAST(n_h AS DOUBLE) * sigma, 0.0) / t, 6)
       |       END AS share,
       |       CASE WHEN t > 0.0 THEN
       |         CAST(floor(coalesce(CAST(n_h AS DOUBLE) * sigma, 0.0)
       |                    / t * $budget) AS BIGINT)
       |       ELSE 0 END AS alloc
       |FROM ws CROSS JOIN tot""".stripMargin
}
