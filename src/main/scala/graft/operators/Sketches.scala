package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  private def rhoOf(h: Column): Column = {
    val x = shiftright(h, HllP).bitwiseOR(lit(HllSentinel))
    lit(1L) + log2(x.bitwiseAND(-x)).cast("long")
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
    val m2 = (HllM.toDouble * HllM).toDouble
    val zeros = (lit(HllM.toLong) - col("_nb"))
    val denom = col("_dpres") + zeros.cast("double")
    val raw = lit(HllAlpha) * lit(m2) / denom
    val est = when(raw <= lit(2.5 * HllM) && zeros > 0,
      lit(HllM.toDouble) * log(lit(HllM.toDouble) / zeros.cast("double")))
      .otherwise(raw)
    val exact = df.groupBy(col(groupCol).as("_grp"))
      .agg(countDistinct(col(valueCol)).as("n_exact"))
    sketch.join(exact, "_grp")
      .select(col("_grp").as(groupCol), col("n_exact"),
        round(est, 6).as("hll_estimate"))
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
       |       round(CASE WHEN (CAST($HllAlpha AS DOUBLE) * CAST(${(HllM.toDouble * HllM)} AS DOUBLE) / (dpres + CAST($HllM - nb AS DOUBLE))) <= CAST(${2.5 * HllM} AS DOUBLE)
       |                   AND ($HllM - nb) > 0
       |             THEN CAST(${HllM.toDouble} AS DOUBLE) * ln(CAST(${HllM.toDouble} AS DOUBLE) / CAST($HllM - nb AS DOUBLE))
       |             ELSE CAST($HllAlpha AS DOUBLE) * CAST(${(HllM.toDouble * HllM)} AS DOUBLE) / (dpres + CAST($HllM - nb AS DOUBLE))
       |             END, 6) AS hll_estimate
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
  private def cmsBucket(term: Column, i: Int): Column =
    pmod(TextAnalysis.fingerprint(concat(lit(s"$i:"), term)),
      lit(CmsWidth.toLong))

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
