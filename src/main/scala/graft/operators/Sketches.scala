package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Probabilistic sketches for corpus statistics at 100 TB: HyperLogLog
  * distinct counting and a count-min frequency sketch. Both are the
  * sketches a training-data pipeline actually runs ("how many distinct
  * users/URLs/documents", "which tokens are heavy hitters") when exact
  * answers would need an unbounded-state shuffle.
  *
  * Scale shape:
  *   - HLL: the register table is (group × m) rows and `max(rho)` is
  *     map-side combinable, so the full pass over the data reduces to a
  *     fixed-size aggregate — the whole point of the sketch. No
  *     `countDistinct` shuffle of the raw key space.
  *   - count-min: the sketch is depth × width cells built by one
  *     map-side-combined aggregate; point estimates are a broadcast
  *     lookup. Heavy-hitter candidates never require a second full pass.
  *
  * Engine parity (why the estimator looks the way it does): the hash is
  * the repo's Rabin–Karp fingerprint (already DuckDB-gated), bucket and
  * rho come from integer bit ops, and every register's contribution
  * `2^-rho` is a dyadic rational — the register SUM is therefore EXACT
  * in double arithmetic regardless of partial-agg order, so the one
  * estimator division (and `ln` in the linear-counting branch, same
  * rounding story as [[Idf]]) is the only floating step on either
  * engine. `round(…, 6)` seals it.
  */
object Sketches {

  /** HLL precision: m = 2^P registers. P=6 → ±13% typical error — small
    * on purpose so the sf0.01 gate exercises BOTH estimator branches
    * (linear counting for small groups, raw harmonic mean for large).
    */
  val HllP = 6
  val HllM: Int = 1 << HllP                   // 64 registers
  /** Standard HLL bias constant α_m for m = 64, rendered into both
    * engines from this one Scala double (shortest-round-trip decimal).
    */
  val HllAlpha: Double = 0.7213 / (1 + 1.079 / HllM)
  /** Sentinel bit above the fingerprint's value range (h < 1e9+7 so
    * h >> 6 < 2^24): caps rho at 25 and keeps `x & -x` nonzero.
    */
  val HllSentinel: Long = 1L << 24

  /** rho(h) = 1 + number of trailing zero bits of (h >> P), sentinel-
    * capped. `x & -x` isolates the lowest set bit; log2 of a power of
    * two is exact in double, so the cast is lossless.
    */
  private[graft] def rhoOf(h: Column): Column = {
    val x = shiftright(h, HllP).bitwiseOR(lit(HllSentinel))
    lit(1L) + log2(x.bitwiseAND(-x)).cast("long")
  }

  /** The two-branch HLL estimator over a sketch row carrying `_nb`
    * (non-empty registers) and `_dpres` (Σ 2^-rho over them) — shared
    * by [[hllDistinct]] and [[rollingDistinct]].
    */
  private[graft] def hllEstimate: Column = {
    val m2 = (HllM.toDouble * HllM).toDouble
    val zeros = (lit(HllM.toLong) - col("_nb"))
    val denom = col("_dpres") + zeros.cast("double")
    val raw = lit(HllAlpha) * lit(m2) / denom
    when(raw <= lit(2.5 * HllM) && zeros > 0,
      lit(HllM.toDouble) * log(lit(HllM.toDouble) / zeros.cast("double")))
      .otherwise(raw)
  }

  /** Per-group HLL distinct estimate next to the exact answer.
    * Output: (groupCol, n_exact, hll_estimate).
    */
  def hllDistinct(df: DataFrame, valueCol: String, groupCol: String): DataFrame = {
    val h = TextAnalysis.fingerprint(col(valueCol).cast("string"))
    val regs = df
      .select(col(groupCol).as("_grp"), pmod(h, lit(HllM.toLong)).as("_bucket"),
        rhoOf(h).as("_rho"))
      .groupBy("_grp", "_bucket").agg(max("_rho").as("_mrho"))
    // 2^rho via shiftleft keeps the register term 1/2^rho a dyadic
    // rational: the sum below is exact in double, order-independent.
    val sketch = regs.groupBy("_grp").agg(
      count(lit(1)).as("_nb"),
      sum(lit(1.0) / expr("shiftleft(CAST(1 AS BIGINT), CAST(_mrho AS INT))")
        .cast("double")).as("_dpres"))
    val exact = df.groupBy(col(groupCol).as("_grp"))
      .agg(countDistinct(col(valueCol)).as("n_exact"))
    sketch.join(exact, "_grp")
      .select(col("_grp").as(groupCol), col("n_exact"),
        round(hllEstimate, 6).as("hll_estimate"))
  }

  /** ROLLING-WINDOW distinct counts via HLL register merging — the
    * "7-day active users" / "distinct URLs this week" series, answered
    * at 100 TB the only way it can be: `count(DISTINCT x)` does not
    * decompose over sliding windows (yesterday's users overlap
    * today's), so the exact form re-scans `win` days of raw data for
    * EVERY day. HLL registers, by contrast, merge by `max` — so the
    * stream collapses ONCE into per-(day, register) partials
    * (days × 64 rows, the same mergeable state a per-shard pipeline
    * would ship), and every trailing window is a metadata-scale
    * register union. This is the composable face of [[hllDistinct]]:
    * same hash, same registers, same estimator.
    *
    * The exact audit twin runs alongside (each distinct (day, value)
    * pair explodes into the ≤ `win` window days it serves — narrow,
    * two exchanges, but over the DISTINCT pair stream, not raw rows);
    * at scale a caller runs the sketch only. Window days are the days
    * present in the data (a day with no events has no row).
    * Output: (day, n_exact, hll_estimate).
    */
  def rollingDistinct(events: DataFrame, tsCol: String, valueCol: String,
                      win: Int = 7): DataFrame = {
    val h = TextAnalysis.fingerprint(col(valueCol).cast("string"))
    val regs = events
      .select(to_date(col(tsCol)).as("day"),
        pmod(h, lit(HllM.toLong)).as("_bucket"), rhoOf(h).as("_rho"))
      .groupBy("day", "_bucket").agg(max("_rho").as("_mrho"))
    val days = regs.select(col("day")).distinct()
    // register-table-scale non-equi join (days × days·64 rows):
    // broadcast + nested-loop is the RIGHT plan at this size
    val wr = broadcast(days.select(col("day").as("_d")))
      .join(regs,
        col("day") >= date_sub(col("_d"), win - 1) && col("day") <= col("_d"))
      .groupBy(col("_d"), col("_bucket")).agg(max(col("_mrho")).as("_mrho"))
    val sketch = wr.groupBy(col("_d")).agg(
      count(lit(1)).as("_nb"),
      sum(lit(1.0) / expr("shiftleft(CAST(1 AS BIGINT), CAST(_mrho AS INT))")
        .cast("double")).as("_dpres"))
    // exact twin: distinct (day, value) pairs serve window days
    // [day, day+win) that exist in the data
    val du = events
      .select(to_date(col(tsCol)).as("day"), col(valueCol).as("_v")).distinct()
    val exact = du
      .select(explode(sequence(lit(0), lit(win - 1))).as("_i"),
        col("day"), col("_v"))
      .select(expr("date_add(day, _i)").as("_d"), col("_v"))
      .join(broadcast(days.select(col("day").as("_d"))), Seq("_d"))
      .distinct()
      .groupBy(col("_d")).agg(count(lit(1)).as("n_exact"))
    sketch.join(exact, "_d")
      .select(col("_d").as("day"), col("n_exact"),
        round(hllEstimate, 6).as("hll_estimate"))
  }

  /** DuckDB oracle twin of [[rollingDistinct]]. */
  def duckRollingDistinct(rel: String, tsCol: String, valueCol: String,
                          win: Int = 7): String = {
    val fp = TextAnalysis.duckFingerprint(s"CAST($valueCol AS VARCHAR)")
    s"""WITH h AS (SELECT CAST($tsCol AS DATE) AS day, ($fp) AS h FROM $rel),
       |r AS (SELECT day, h % $HllM AS bucket,
       |             1 + CAST(log2(x & (-x)) AS BIGINT) AS rho
       |      FROM (SELECT day, h, (h // $HllM) | $HllSentinel AS x FROM h)),
       |reg AS (SELECT day, bucket, max(rho) AS mrho FROM r GROUP BY 1, 2),
       |days AS (SELECT DISTINCT day FROM reg),
       |wr AS (SELECT d.day AS day, reg.bucket, max(reg.mrho) AS mrho
       |       FROM days d JOIN reg
       |         ON reg.day >= d.day - ${win - 1} AND reg.day <= d.day
       |       GROUP BY 1, 2),
       |sk AS (SELECT day, count(*) AS nb,
       |              sum(1.0 / CAST(CAST(1 AS BIGINT) << CAST(mrho AS INT) AS DOUBLE)) AS dpres
       |       FROM wr GROUP BY 1),
       |du AS (SELECT DISTINCT CAST($tsCol AS DATE) AS day, $valueCol AS v FROM $rel),
       |ex AS (SELECT d.day AS day, count(DISTINCT u.v) AS n_exact
       |       FROM days d JOIN du u
       |         ON u.day >= d.day - ${win - 1} AND u.day <= d.day
       |       GROUP BY 1)
       |SELECT sk.day AS day, ex.n_exact,
       |       round(${duckHllEstimate("nb", "dpres")}, 6) AS hll_estimate
       |FROM sk JOIN ex ON sk.day = ex.day""".stripMargin
  }

  /** The estimator's SQL render over `nb`/`dpres` columns. */
  private[graft] def duckHllEstimate(nb: String, dpres: String): String =
    s"""CASE WHEN (CAST($HllAlpha AS DOUBLE) * CAST(${(HllM.toDouble * HllM)} AS DOUBLE) / ($dpres + CAST($HllM - $nb AS DOUBLE))) <= CAST(${2.5 * HllM} AS DOUBLE)
       |      AND ($HllM - $nb) > 0
       | THEN CAST(${HllM.toDouble} AS DOUBLE) * ln(CAST(${HllM.toDouble} AS DOUBLE) / CAST($HllM - $nb AS DOUBLE))
       | ELSE CAST($HllAlpha AS DOUBLE) * CAST(${(HllM.toDouble * HllM)} AS DOUBLE) / ($dpres + CAST($HllM - $nb AS DOUBLE))
       | END""".stripMargin

  /** DuckDB oracle twin of
    * [[graft.streaming.StreamSync.replayDistinctCounts]] — tumbling
    * epoch-floored windows, registers, estimator, exact twin.
    */
  def duckWindowedDistinct(rel: String, tsCol: String, valueCol: String,
                           lenUs: Long): String = {
    val fp = TextAnalysis.duckFingerprint(s"CAST($valueCol AS VARCHAR)")
    s"""WITH h AS (SELECT make_timestamp((epoch_us(CAST($tsCol AS TIMESTAMP)) // $lenUs) * $lenUs) AS window_start,
       |                  ($fp) AS h, $valueCol AS v
       |           FROM $rel WHERE $tsCol IS NOT NULL),
       |r AS (SELECT window_start, h % $HllM AS bucket,
       |             1 + CAST(log2(x & (-x)) AS BIGINT) AS rho
       |      FROM (SELECT window_start, h, (h // $HllM) | $HllSentinel AS x FROM h)),
       |reg AS (SELECT window_start, bucket, max(rho) AS mrho FROM r GROUP BY 1, 2),
       |sk AS (SELECT window_start, count(*) AS nb,
       |              sum(1.0 / CAST(CAST(1 AS BIGINT) << CAST(mrho AS INT) AS DOUBLE)) AS dpres
       |       FROM reg GROUP BY 1),
       |ex AS (SELECT window_start, count(DISTINCT v) AS n_exact FROM h GROUP BY 1)
       |SELECT sk.window_start, ex.n_exact,
       |       round(${duckHllEstimate("nb", "dpres")}, 6) AS hll_estimate
       |FROM sk JOIN ex USING (window_start)""".stripMargin
  }

  /** DuckDB oracle twin of
    * [[graft.streaming.StreamSync.replayCmsCounts]] — tumbling
    * epoch-floored windows, depth×width cells, literal-term probes,
    * exact twin.
    */
  def duckStreamingCms(rel: String, tsCol: String, termCol: String,
                       lenUs: Long, terms: Seq[String]): String = {
    def bucket(i: Int, termExpr: String): String =
      s"(${TextAnalysis.duckFingerprint(s"'$i:' || $termExpr")}) % $CmsWidth"
    val cellRows = (0 until CmsDepth).map { i =>
      s"SELECT window_start, $i AS h_row, ${bucket(i, "term")} AS bucket FROM b"
    }.mkString(" UNION ALL ")
    val probeRows = terms.flatMap { t =>
      val lit = s"'${t.replace("'", "''")}'"
      (0 until CmsDepth).map(i =>
        s"SELECT $lit AS term, $i AS h_row, ${bucket(i, lit)} AS bucket")
    }.mkString(" UNION ALL ")
    val inList = terms.map(t => s"'${t.replace("'", "''")}'").mkString(", ")
    s"""WITH b AS (SELECT make_timestamp((epoch_us(CAST($tsCol AS TIMESTAMP)) // $lenUs) * $lenUs) AS window_start,
       |                  CAST($termCol AS VARCHAR) AS term
       |           FROM $rel WHERE $tsCol IS NOT NULL),
       |cells AS (SELECT window_start, h_row, bucket, count(*) AS cell_n
       |          FROM ($cellRows) GROUP BY 1, 2, 3),
       |probes AS ($probeRows),
       |est AS (SELECT c.window_start, p.term, min(c.cell_n) AS cms_estimate
       |        FROM cells c JOIN probes p
       |          ON p.h_row = c.h_row AND p.bucket = c.bucket
       |        GROUP BY 1, 2),
       |ex AS (SELECT window_start, term, count(*) AS n_exact
       |       FROM b WHERE term IN ($inList) GROUP BY 1, 2)
       |SELECT est.window_start, est.term, ex.n_exact, est.cms_estimate
       |FROM est JOIN ex ON ex.window_start = est.window_start
       |                AND ex.term = est.term""".stripMargin
  }

  /** DuckDB oracle twin of [[hllDistinct]]. */
  def duckHllDistinct(tbl: String, valueCol: String, groupCol: String): String = {
    val fp = TextAnalysis.duckFingerprint(s"CAST($valueCol AS VARCHAR)")
    s"""WITH h AS (SELECT $groupCol AS grp, ($fp) AS h FROM $tbl),
       |r AS (SELECT grp, h % $HllM AS bucket,
       |             1 + CAST(log2(x & (-x)) AS BIGINT) AS rho
       |      FROM (SELECT grp, h, (h // $HllM) | $HllSentinel AS x FROM h)),
       |reg AS (SELECT grp, bucket, max(rho) AS mrho FROM r GROUP BY 1, 2),
       |sk AS (SELECT grp, count(*) AS nb,
       |              sum(1.0 / CAST(CAST(1 AS BIGINT) << CAST(mrho AS INT) AS DOUBLE)) AS dpres
       |       FROM reg GROUP BY 1),
       |ex AS (SELECT $groupCol AS grp, count(DISTINCT $valueCol) AS n_exact
       |       FROM $tbl GROUP BY 1)
       |SELECT sk.grp AS $groupCol, ex.n_exact,
       |       round(${duckHllEstimate("nb", "dpres")}, 6) AS hll_estimate
       |FROM sk JOIN ex ON sk.grp = ex.grp""".stripMargin
  }

  /** Count-min sketch geometry: depth independent hash rows × width
    * buckets. Depth 3 / width 256 keeps the gate's collision rate real
    * (estimates visibly ≥ exact for some tokens) while the sketch stays
    * 768 cells at any corpus size.
    */
  val CmsDepth = 3
  val CmsWidth = 256

  /** Row-i bucket of a term: seeded fingerprint mod width. */
  private[graft] def cmsBucket(term: Column, i: Int): Column =
    pmod(TextAnalysis.fingerprint(concat(lit(s"$i:"), term)),
      lit(CmsWidth.toLong))

  /** [[cmsBucket]] with the row index as a COLUMN (for probe tables
    * that carry (term, h_row) rows) — renders the identical seeded
    * string, so buckets match the static variant exactly.
    */
  private[graft] def cmsBucketDyn(term: Column, row: Column): Column =
    pmod(TextAnalysis.fingerprint(
      concat(row.cast("string"), lit(":"), term)), lit(CmsWidth.toLong))

  /** Heavy hitters with count-min estimates: build the sketch over all
    * token occurrences, take the exact top-k tokens (count desc, term
    * asc), and report each token's CMS point estimate (min over depth
    * rows) next to its exact count. `cms_estimate >= n_exact` always —
    * the sketch errs high by construction.
    * Output: (term, n_exact, cms_estimate).
    */
  def cmsHeavyHitters(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    val tok = Dedup.rebalance(docs)
      .select(explode(TextAnalysis.tokens(col(textCol))).as("term"))
    val buckets = (0 until CmsDepth).map(i => cmsBucket(col("term"), i))
    val cells = tok
      .select(posexplode(array(buckets: _*)).as(Seq("h_row", "bucket")))
      .groupBy("h_row", "bucket").agg(count(lit(1)).as("cell_n"))
    val top = tok.groupBy("term").agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("term").asc).limit(k)
    top
      .select(col("term"), col("n_exact"),
        posexplode(array(buckets: _*)).as(Seq("h_row", "bucket")))
      .join(broadcast(cells), Seq("h_row", "bucket"))
      .groupBy("term", "n_exact").agg(min(col("cell_n")).as("cms_estimate"))
      .select("term", "n_exact", "cms_estimate")
  }

  /** JOIN-CARDINALITY estimation via count-min inner product: the size
    * of `A ⋈ B` on a key is exactly  Σ_key c_A(key)·c_B(key), and the
    * inner product of the two sides' CMS rows OVER-estimates it (every
    * colliding key pair adds a non-negative term), with the min across
    * the depth independent rows as the reported estimate (AMS/CM
    * sketch inner-product estimator, Cormode & Muthukrishnan '05).
    *
    * This is the planner question "will this join explode?" answered
    * WITHOUT running the join: each side is one map-side-combined
    * 768-cell aggregate (mergeable, shippable per shard — reusable
    * across many candidate joins), and the estimate itself is a
    * broadcast-joined 768-row product. The exact count is computed
    * alongside from the per-key group counts (never by materializing
    * the join) as the gate's audit twin — at 100 TB a caller runs the
    * sketch only.
    *
    * Output: one row (n_exact, cms_estimate), estimate ≥ exact always.
    */
  def cmsJoinCardinality(a: DataFrame, keyA: String,
                         b: DataFrame, keyB: String): DataFrame = {
    def cells(df: DataFrame, key: String, out: String) = {
      val buckets = (0 until CmsDepth).map(i => cmsBucket(col(key).cast("string"), i))
      df.select(posexplode(array(buckets: _*)).as(Seq("h_row", "bucket")))
        .groupBy("h_row", "bucket").agg(count(lit(1)).as(out))
    }
    val est = cells(a, keyA, "ca")
      .join(broadcast(cells(b, keyB, "cb")), Seq("h_row", "bucket"))
      .groupBy("h_row").agg(sum(col("ca") * col("cb")).as("ip"))
      .agg(min(col("ip")).as("cms_estimate"))
    val exact = a.groupBy(col(keyA).as("_k")).agg(count(lit(1)).as("na"))
      // audit-twin join over GROUPED counts (key-cardinality-sized);
      // the hint spares the larger side's counts a sort-merge exchange
      .join(broadcast(b.groupBy(col(keyB).as("_k")).agg(count(lit(1)).as("nb"))), "_k")
      .agg(coalesce(sum(col("na") * col("nb")), lit(0L)).as("n_exact"))
    exact.crossJoin(broadcast(est)).select(col("n_exact"), col("cms_estimate"))
  }

  /** DuckDB oracle twin of [[cmsJoinCardinality]]. */
  def duckCmsJoinCardinality(tblA: String, keyA: String,
                             tblB: String, keyB: String): String = {
    def cellRows(tbl: String, key: String): String =
      (0 until CmsDepth).map { i =>
        val b = s"(${TextAnalysis.duckFingerprint(s"'$i:' || CAST($key AS VARCHAR)")}) % $CmsWidth"
        s"SELECT $i AS h_row, $b AS bucket FROM $tbl"
      }.mkString(" UNION ALL ")
    s"""WITH ca AS (SELECT h_row, bucket, count(*) AS ca
       |            FROM (${cellRows(tblA, keyA)}) GROUP BY 1, 2),
       |cb AS (SELECT h_row, bucket, count(*) AS cb
       |       FROM (${cellRows(tblB, keyB)}) GROUP BY 1, 2),
       |est AS (SELECT CAST(min(ip) AS BIGINT) AS cms_estimate
       |        FROM (SELECT h_row, sum(ca * cb) AS ip
       |              FROM ca JOIN cb USING (h_row, bucket) GROUP BY 1)),
       |ga AS (SELECT $keyA AS k, count(*) AS na FROM $tblA GROUP BY 1),
       |gb AS (SELECT $keyB AS k, count(*) AS nb FROM $tblB GROUP BY 1),
       |ex AS (SELECT CAST(coalesce(sum(na * nb), 0) AS BIGINT) AS n_exact
       |       FROM ga JOIN gb USING (k))
       |SELECT ex.n_exact, est.cms_estimate FROM ex, est""".stripMargin
  }

  /** KMV sketch size (bottom-k minimum hash values). 128 against the
    * fixtures' ~1.1–1.5k distinct shingles per source keeps the gate's
    * estimates genuinely approximate (the sketch is ~10% of the set).
    */
  val KmvK = 128

  /** Cross-source set-overlap estimation via KMV (k-minimum-values /
    * bottom-k) sketches over word n-gram shingle sets — "how much does
    * crawl snapshot A overlap crawl snapshot B" without ever joining
    * the full shingle sets. For each source keep the k smallest shingle
    * hashes; for a pair of sources, the bottom-k of the MERGED sketch
    * is a uniform sample of A∪B, so the fraction of it present in both
    * sketches estimates Jaccard(A, B) (Beyer et al., SIGMOD'07).
    *
    * Scale shape: the only corpus-sized exchange is the distinct on
    * (source, hash); per-source bottom-k is a rank-1..k filter that
    * Spark rewrites to WindowGroupLimit (partial top-k on the map side,
    * never a full per-source sort); everything after operates on
    * k·|sources| rows. The sketches are trivially mergeable (bottom-k
    * of a union of bottom-k's), i.e. shippable as a per-shard artifact.
    * SKETCH-ONLY: the exact-intersection audit lives in
    * [[exactSourceOverlap]] (a shingle-hash self-join, quadratic in
    * overlap) so a caller of the production estimator never pays it —
    * the estimator and the audit are separate queries, like
    * q_dedup_minhash_lsh vs q_dedup_ngram_jaccard.
    *
    * Output: (src_a, src_b, n_a, n_b, inter_kmv, j_kmv) for every
    * unordered source pair.
    */
  def kmvSourceJaccard(docs: DataFrame, textCol: String, srcCol: String,
                       n: Int = 3, k: Int = KmvK): DataFrame = {
    val (ranked, cnt) = kmvUnionSample(docs, textCol, srcCol, n, k)
    val est = ranked
      .groupBy("sa", "sb")
      .agg(count(lit(1)).as("nm"), sum(col("ina") * col("inb")).as("inter_kmv"))
    // est already carries every valid pair (both sources contribute ≥ 1
    // sketch row), so only the per-source counts need joining back.
    est
      .join(broadcast(cnt.select(col("src").as("sa"), col("n").as("n_a"))), Seq("sa"))
      .join(broadcast(cnt.select(col("src").as("sb"), col("n").as("n_b"))), Seq("sb"))
      .select(col("sa").as("src_a"), col("sb").as("src_b"),
        col("n_a"), col("n_b"),
        col("inter_kmv"),
        round(col("inter_kmv").cast("double") / col("nm").cast("double"), 6)
          .as("j_kmv"))
  }

  /** Shared KMV machinery: per-source bottom-k shingle-hash sketches,
    * tagged and merged per source pair, ranked to the pair's bottom-k
    * union sample. Returns (ranked union-sample rows
    * (sa, sb, ina, inb), per-source distinct counts (src, n)).
    */
  private def kmvUnionSample(docs: DataFrame, textCol: String, srcCol: String,
                             n: Int, k: Int): (DataFrame, DataFrame) = {
    // Hashed-shingle explode (r14): ShingleFingerprints emits the
    // per-shingle fingerprints directly — the shingle strings are never
    // materialized, and the distinct on (src, h) sees the identical set
    // (the duck twin hashes the same way).
    val st = Dedup.rebalance(docs)
      .select(col(srcCol).as("src"),
        explode(Dedup.shingleFps(col(textCol), n)).as("h"))
      .distinct()
    val sk = st
      .withColumn("_rk", row_number().over(Window.partitionBy("src").orderBy("h")))
      .filter(col("_rk") <= k).drop("_rk")
    val cnt = st.groupBy("src").agg(count(lit(1)).as("n"))
    // Pin: the pair frame must REFERENCE the count column, else column
    // pruning rewrites its subtree to a cheaper distinct(src)-only scan
    // that can no longer reuse cnt's stage — the CPU-heavy shingle
    // explode then runs twice (the Dedup.withSigGroups lesson).
    val prPin = cnt.filter(col("n") >= 0L)
    val pr = prPin.select(col("src").as("sa"))
      .join(prPin.select(col("src").as("sb")), col("sa") < col("sb"))
    // Tag each sketch hash with which side(s) of the pair hold it, then
    // rank the merged hash set: rows 1..k are the pair's union sample.
    // Everything downstream of the sketches is |sources|²- or
    // k·|pairs|-sized — broadcast hints are declared explicitly so the
    // static planner can never fall back to a shuffle join here
    // (PlanAuditSpec gates it).
    val tagged = sk.select(col("src").as("sa"), col("h")).join(broadcast(pr), Seq("sa"))
        .select(col("sa"), col("sb"), col("h"), lit(1).as("ina"), lit(0).as("inb"))
      .unionByName(
        sk.select(col("src").as("sb"), col("h")).join(broadcast(pr), Seq("sb"))
          .select(col("sa"), col("sb"), col("h"), lit(0).as("ina"), lit(1).as("inb")))
    val ranked = tagged
      .groupBy("sa", "sb", "h")
      .agg(max("ina").as("ina"), max("inb").as("inb"))
      .withColumn("_rk",
        row_number().over(Window.partitionBy("sa", "sb").orderBy("h")))
      .filter(col("_rk") <= k)
    (ranked, cnt)
  }

  /** DIRECTIONAL set containment per source pair via the same KMV
    * sketches as [[kmvSourceJaccard]] — "how much of snapshot A is
    * inside snapshot B" (and vice versa), the question Jaccard blurs
    * when the two sides differ in size: a crawl fully contained in a
    * 10× larger one has J ≈ 0.09 but containment(A,B) = 1.0. The
    * decontamination / re-crawl-triage signal.
    *
    * Estimator: the pair's bottom-k union sample is uniform over A∪B,
    * so within it  #(in both)/#(in A)  estimates |A∩B|/|A| — no extra
    * pass, no new sketch, the Jaccard machinery re-grouped.
    *
    * Output: (src_a, src_b, in_a, in_b, inter_kmv, c_a_in_b, c_b_in_a)
    * for every unordered source pair.
    */
  def kmvContainment(docs: DataFrame, textCol: String, srcCol: String,
                     n: Int = 3, k: Int = KmvK): DataFrame = {
    val (ranked, _) = kmvUnionSample(docs, textCol, srcCol, n, k)
    ranked
      .groupBy("sa", "sb")
      .agg(sum(col("ina")).as("in_a"), sum(col("inb")).as("in_b"),
        sum(col("ina") * col("inb")).as("inter_kmv"))
      .select(col("sa").as("src_a"), col("sb").as("src_b"),
        col("in_a"), col("in_b"), col("inter_kmv"),
        when(col("in_a") > 0,
          round(col("inter_kmv").cast("double") / col("in_a").cast("double"), 6))
          .as("c_a_in_b"),
        when(col("in_b") > 0,
          round(col("inter_kmv").cast("double") / col("in_b").cast("double"), 6))
          .as("c_b_in_a"))
  }

  /** DuckDB oracle twin of [[kmvContainment]]. */
  def duckKmvContainment(tbl: String, textCol: String, srcCol: String,
                         n: Int = 3, k: Int = KmvK): String =
    s"""WITH ${duckKmvCtes(tbl, textCol, srcCol, n)},
       |sk AS (SELECT src, h FROM (SELECT src, h,
       |                                  row_number() OVER (PARTITION BY src ORDER BY h) AS rk
       |                           FROM st) WHERE rk <= $k),
       |pr AS (SELECT a.src AS sa, b.src AS sb FROM cnt a JOIN cnt b ON a.src < b.src),
       |tg AS (SELECT pr.sa, pr.sb, s.h, 1 AS ina, 0 AS inb
       |       FROM pr JOIN sk s ON s.src = pr.sa
       |       UNION ALL
       |       SELECT pr.sa, pr.sb, s.h, 0 AS ina, 1 AS inb
       |       FROM pr JOIN sk s ON s.src = pr.sb),
       |m AS (SELECT sa, sb, h, max(ina) AS ina, max(inb) AS inb FROM tg GROUP BY 1, 2, 3),
       |r2 AS (SELECT sa, sb, ina, inb,
       |              row_number() OVER (PARTITION BY sa, sb ORDER BY h) AS rk FROM m)
       |SELECT sa AS src_a, sb AS src_b,
       |       CAST(sum(ina) AS BIGINT) AS in_a, CAST(sum(inb) AS BIGINT) AS in_b,
       |       CAST(sum(ina * inb) AS BIGINT) AS inter_kmv,
       |       CASE WHEN sum(ina) > 0
       |            THEN round(CAST(sum(ina * inb) AS DOUBLE) / CAST(sum(ina) AS DOUBLE), 6)
       |            END AS c_a_in_b,
       |       CASE WHEN sum(inb) > 0
       |            THEN round(CAST(sum(ina * inb) AS DOUBLE) / CAST(sum(inb) AS DOUBLE), 6)
       |            END AS c_b_in_a
       |FROM r2 WHERE rk <= $k GROUP BY 1, 2""".stripMargin

  /** Exact cross-source shingle overlap — the GROUND-TRUTH twin of
    * [[kmvSourceJaccard]]'s estimate. A self-join of the distinct
    * (source, shingle-hash) stream on the hash: quadratic in overlap,
    * so callers bound the input (the q_dedup_ngram_jaccard pattern);
    * the sketch is what replaces this at 100 TB.
    * Output: (src_a, src_b, n_a, n_b, inter_exact, j_exact).
    */
  def exactSourceOverlap(docs: DataFrame, textCol: String,
                         srcCol: String, n: Int = 3): DataFrame = {
    val st = Dedup.rebalance(docs)
      .select(col(srcCol).as("src"),
        explode(Dedup.shingleFps(col(textCol), n)).as("h"))
      .distinct()
    val cnt = st.groupBy("src").agg(count(lit(1)).as("n"))
    val pr = cnt.select(col("src").as("sa"), col("n").as("n_a"))
      .join(cnt.select(col("src").as("sb"), col("n").as("n_b")),
        col("sa") < col("sb"))
    val ie = st.as("a")
      .join(st.as("b"), col("a.h") === col("b.h") && col("a.src") < col("b.src"))
      .groupBy(col("a.src").as("sa"), col("b.src").as("sb"))
      .agg(count(lit(1)).as("inter_exact"))
    pr.join(ie, Seq("sa", "sb"), "left")
      .withColumn("inter_exact", coalesce(col("inter_exact"), lit(0L)))
      .select(col("sa").as("src_a"), col("sb").as("src_b"),
        col("n_a"), col("n_b"), col("inter_exact"),
        round(col("inter_exact").cast("double")
          / (col("n_a") + col("n_b") - col("inter_exact")).cast("double"), 6)
          .as("j_exact"))
  }

  /** Shared sketch CTE prologue for the KMV duck twins. */
  private def duckKmvCtes(tbl: String, textCol: String, srcCol: String,
                          n: Int): String =
    s"""sh0 AS (SELECT src, unnest(${Dedup.duckShingles(textCol, n)}) AS sh
       |             FROM (SELECT *, $srcCol AS src,
       |                          ${TextAnalysis.duckTokensBind(textCol)} AS w FROM $tbl)),
       |st AS (SELECT DISTINCT src, (${TextAnalysis.duckFingerprint("sh")}) AS h FROM sh0),
       |cnt AS (SELECT src, count(*) AS n FROM st GROUP BY 1)""".stripMargin

  /** DuckDB oracle twin of [[kmvSourceJaccard]] — sketch-only. */
  def duckKmvSourceJaccard(tbl: String, textCol: String, srcCol: String,
                           n: Int = 3, k: Int = KmvK): String =
    s"""WITH ${duckKmvCtes(tbl, textCol, srcCol, n)},
       |sk AS (SELECT src, h FROM (SELECT src, h,
       |                                  row_number() OVER (PARTITION BY src ORDER BY h) AS rk
       |                           FROM st) WHERE rk <= $k),
       |pr AS (SELECT a.src AS sa, b.src AS sb FROM cnt a JOIN cnt b ON a.src < b.src),
       |tg AS (SELECT pr.sa, pr.sb, s.h, 1 AS ina, 0 AS inb
       |       FROM pr JOIN sk s ON s.src = pr.sa
       |       UNION ALL
       |       SELECT pr.sa, pr.sb, s.h, 0 AS ina, 1 AS inb
       |       FROM pr JOIN sk s ON s.src = pr.sb),
       |m AS (SELECT sa, sb, h, max(ina) AS ina, max(inb) AS inb FROM tg GROUP BY 1, 2, 3),
       |r2 AS (SELECT sa, sb, ina, inb,
       |              row_number() OVER (PARTITION BY sa, sb ORDER BY h) AS rk FROM m),
       |est AS (SELECT sa, sb, count(*) AS nm, CAST(sum(ina * inb) AS BIGINT) AS inter_kmv
       |        FROM r2 WHERE rk <= $k GROUP BY 1, 2)
       |SELECT pr.sa AS src_a, pr.sb AS src_b, ca.n AS n_a, cb.n AS n_b,
       |       est.inter_kmv,
       |       round(CAST(est.inter_kmv AS DOUBLE) / CAST(est.nm AS DOUBLE), 6) AS j_kmv
       |FROM pr
       |JOIN cnt ca ON ca.src = pr.sa
       |JOIN cnt cb ON cb.src = pr.sb
       |JOIN est ON est.sa = pr.sa AND est.sb = pr.sb""".stripMargin

  /** DuckDB oracle twin of [[exactSourceOverlap]]. */
  def duckExactSourceOverlap(tbl: String, textCol: String, srcCol: String,
                             n: Int = 3): String =
    s"""WITH ${duckKmvCtes(tbl, textCol, srcCol, n)},
       |pr AS (SELECT a.src AS sa, a.n AS n_a, b.src AS sb, b.n AS n_b
       |       FROM cnt a JOIN cnt b ON a.src < b.src),
       |ie AS (SELECT a.src AS sa, b.src AS sb, count(*) AS inter_exact
       |       FROM st a JOIN st b ON a.h = b.h AND a.src < b.src GROUP BY 1, 2)
       |SELECT pr.sa AS src_a, pr.sb AS src_b, pr.n_a, pr.n_b,
       |       coalesce(ie.inter_exact, 0) AS inter_exact,
       |       round(CAST(coalesce(ie.inter_exact, 0) AS DOUBLE)
       |             / CAST(pr.n_a + pr.n_b - coalesce(ie.inter_exact, 0) AS DOUBLE), 6) AS j_exact
       |FROM pr
       |LEFT JOIN ie ON ie.sa = pr.sa AND ie.sb = pr.sb""".stripMargin

  /** Quantile-sketch accuracy: Greenwald–Khanna rank error is bounded
    * by n/accuracy while the sketch state stays O(accuracy · log n) —
    * bounded and mergeable — regardless of group size. EXACTNESS
    * boundary, measured (r11): Spark's summary is rank-exact only
    * while group n ≤ accuracy/2 (its compression threshold) — at
    * accuracy 10 000, 4 905-row groups answered bitwise-exactly and
    * 5 020-row groups drifted ±2 ranks. The oracle gate slices its
    * input so every group stays under that half-bound at every driver
    * SF; at 100 TB the same plan degrades gracefully to ±0.01% rank
    * error instead of an unbounded sort.
    */
  val QuantileAccuracy = 10000

  /** Per-group streaming quantiles via Spark's GK sketch
    * (`percentile_approx`) — the bounded-memory twin of the exact
    * `percentile` profile (q_len_quantiles). One ObjectHashAggregate with
    * map-side partials; no full sort, no per-group value materialization.
    *
    * Both engines return the DISCRETE order statistic (an element of the
    * input, not an interpolation), and below the accuracy bound the rank
    * is exact, so values compare bitwise against DuckDB's
    * `quantile_disc` with no rounding step.
    */
  def quantileSketch(df: DataFrame, valueCol: String, groupCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        expr(s"percentile_approx($valueCol, array(0.25D, 0.5D, 0.9D, 0.99D), $QuantileAccuracy)")
          .as("qs"))
      .select(col(groupCol), col("n"),
        col("qs").getItem(0).as("p25"),
        col("qs").getItem(1).as("p50"),
        col("qs").getItem(2).as("p90"),
        col("qs").getItem(3).as("p99"))

  /** DuckDB oracle twin of [[quantileSketch]]: exact discrete quantiles. */
  def duckQuantileSketch(tbl: String, valueCol: String, groupCol: String): String =
    s"""SELECT $groupCol, count(*) AS n,
       |       quantile_disc($valueCol, 0.25) AS p25,
       |       quantile_disc($valueCol, 0.5)  AS p50,
       |       quantile_disc($valueCol, 0.9)  AS p90,
       |       quantile_disc($valueCol, 0.99) AS p99
       |FROM $tbl GROUP BY $groupCol""".stripMargin

  /** DuckDB oracle twin of [[cmsHeavyHitters]]. */
  def duckCmsHeavyHitters(tbl: String, textCol: String, k: Int): String = {
    def bucket(i: Int, termExpr: String): String =
      s"(${TextAnalysis.duckFingerprint(s"'$i:' || $termExpr")}) % $CmsWidth"
    val cellRows = (0 until CmsDepth).map { i =>
      s"SELECT $i AS h_row, ${bucket(i, "term")} AS bucket FROM tok"
    }.mkString(" UNION ALL ")
    val candRows = (0 until CmsDepth).map { i =>
      s"SELECT term, n_exact, $i AS h_row, ${bucket(i, "term")} AS bucket FROM top"
    }.mkString(" UNION ALL ")
    s"""WITH tok AS (SELECT unnest(w) AS term
       |             FROM (SELECT ${TextAnalysis.duckTokensBind(textCol)} AS w FROM $tbl)),
       |cells AS (SELECT h_row, bucket, count(*) AS cell_n
       |          FROM ($cellRows) GROUP BY 1, 2),
       |top AS (SELECT term, count(*) AS n_exact FROM tok GROUP BY term
       |        ORDER BY n_exact DESC, term ASC LIMIT $k),
       |cand AS ($candRows)
       |SELECT term, n_exact, min(cell_n) AS cms_estimate
       |FROM cand JOIN cells USING (h_row, bucket)
       |GROUP BY term, n_exact""".stripMargin
  }
}
