package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multivariate (bivariate) Mahalanobis outlier scoring — the
  * correlation-aware tier of the robust-outlier family:
  * [[EventStats.madOutliers]] flags univariate extremes and
  * [[Profile.correlationMatrix]] measures the dependence, but a row can
  * be unremarkable on every axis and still be impossible JOINTLY (a
  * 2-unit order priced like a 200-unit one). The squared Mahalanobis
  * distance d² = (x−µ)ᵀ Σ⁻¹ (x−µ) scores exactly that, in the metric of
  * the data's own covariance.
  *
  * Bivariate is the shipped, oracle-gated case: Σ⁻¹ has a closed form
  * ((1/det)·adjugate), so BOTH engines evaluate the identical
  * operation-ordered double expression — no matrix solver whose
  * elimination order could differ in the last ulp. (The same moments +
  * broadcast pattern extends to general d with a driver-side inversion
  * of the d×d Gram — see [[Pca]], which already does exactly that for
  * eigenvectors; kept out of the gate because a generic solver is not
  * bit-mirrorable in SQL.)
  *
  * Exactness discipline: both coordinates are µ-quantized once and the
  * five moments (Σx, Σy, Σx², Σy², Σxy) are EXACT integer sums —
  * partial-agg order irrelevant; means/variances/covariance and the
  * per-row d² are doubles in one mirrored expression; the top-k order
  * key is the µ-quantized d² with the id as tie-break. Since r14 the
  * exact sums are salted long LIMB sums (see [[mahalanobis2]]) — the
  * same integers the previous decimal(38,0) formulation produced
  * (RehearseMahalanobis pins the equality bitwise), with zero per-row
  * Decimal work.
  *
  * Scale shape: ONE map-side-combinable moment aggregate (partition-
  * local salt groups of ≤ 2^24 rows each, then a 6-number decimal
  * combine broadcast back via crossJoin — no driver round-trip), then a
  * narrow codegen scoring projection and a TakeOrdered top-k. Nothing
  * shuffles corpus-sized data.
  *
  * Output: top-k rows (idCol, xCol, yCol, md2), md2 DESC.
  */
object Outliers {

  /** Limb-split shift for the exact long-arithmetic moment sums: µ-
    * quantized |x| < 2^37 (TPC-H price·1e6 tops out ~1e11) splits as
    * x = a·2^19 + b with every per-row limb product < 2^38 — pure
    * primitive-long codegen per row, no Decimal anywhere on the scan.
    */
  private val LimbShift = 19

  /** Rows-per-salt-group bound as a shift of the within-partition row
    * index: `monotonically_increasing_id()` is `partitionId·2^33 +
    * rowIdxInPartition`, so `mid >> GroupShift` buckets AT MOST
    * 2^24 rows per group, each group wholly inside one partition
    * (map-side combine emits one row per group, the shuffle moves only
    * group rows). The bound is structural — no id-distribution or
    * corpus-size assumption — and group count grows with the data, so
    * there is no scale ceiling (r15, ADVICE: the previous fixed
    * pmod(id,1024) salt capped safe capacity at ~3.4e10 rows total and
    * less under id skew).
    */
  private val GroupShift = 24

  def mahalanobis2(df: DataFrame, idCol: String, xCol: String,
                   yCol: String, topK: Int): DataFrame = {
    // floor(x+0.5) == round-half-away for every non-tie double (the
    // repo-wide measure-zero tie assumption) and skips Spark round()'s
    // per-row BigDecimal — measured 5x cheaper on the 600k-row scan;
    // the oracle uses the IDENTICAL floor form.
    //
    // r14 (VERDICT r13 #2): per-row values stay LONG end-to-end. The
    // previous shape quantized to decimal(38,0) and summed decimals —
    // once Σx² left the compact-long range every partial-agg add ran
    // on boxed BigDecimals, the operator's one interpreted hot loop
    // (and its sticky-JIT episode surface; RehearseMahalanobis A/B).
    // The exact moments now come from SALTED LIMB SUMS: per salt group
    // (mid >> 24 — see GroupShift) eleven long sums of the 2^19-limb
    // products. Capacity (r15, corrected): with |x| < 2^37 the worst
    // per-row limb term (xb², |xa·yb + xb·ya|) is < 2^38, so a group of
    // ≤ 2^24 rows keeps every long sum < 2^62 — 2x headroom under
    // ANSI-checked arithmetic (which would throw, never corrupt) — and
    // the 2^24 bound holds structurally for ANY corpus size or id
    // distribution. Then ONE decimal combine over the group rows
    // (~1 per 16.7M rows, plus one per partition) reconstructs
    // Σx², Σy², Σxy exactly.
    // RehearseMahalanobis pins the reconstruction bitwise against the
    // decimal formulation at sf0.1, so the oracle is unchanged.
    def mu(c: String) =
      floor(col(c).cast("double") * 1e6 + 0.5).cast("long")
    val base = df.select(col(idCol).cast("long").as("_id"),
      mu(xCol).as("_x"), mu(yCol).as("_y"))
    val s = LimbShift
    val mask = (1L << s) - 1L
    val grouped = base
      .withColumn("_g", shiftright(monotonically_increasing_id(), GroupShift))
      .withColumn("_xa", shiftright(col("_x"), s))
      .withColumn("_xb", col("_x").bitwiseAND(mask))
      .withColumn("_ya", shiftright(col("_y"), s))
      .withColumn("_yb", col("_y").bitwiseAND(mask))
      .groupBy("_g").agg(
        count(lit(1L)).as("n"),
        sum(col("_x")).as("sx"), sum(col("_y")).as("sy"),
        sum(col("_xa") * col("_xa")).as("xaa"),
        sum(col("_xa") * col("_xb")).as("xab"),
        sum(col("_xb") * col("_xb")).as("xbb"),
        sum(col("_ya") * col("_ya")).as("yaa"),
        sum(col("_ya") * col("_yb")).as("yab"),
        sum(col("_yb") * col("_yb")).as("ybb"),
        sum(col("_xa") * col("_ya")).as("paa"),
        sum(col("_xa") * col("_yb") + col("_xb") * col("_ya")).as("pab"),
        sum(col("_xb") * col("_yb")).as("pbb"))
    def dec(c: String) = col(c).cast("decimal(38,0)")
    val two = lit(2L).cast("decimal(38,0)")
    val sq = lit(1L << (2 * s)).cast("decimal(38,0)")
    val hf = lit(1L << s).cast("decimal(38,0)")
    val moments = grouped.agg(
      sum(col("n")).as("_n"),
      sum(dec("sx")).as("_sx"), sum(dec("sy")).as("_sy"),
      sum(dec("xaa") * sq + two * dec("xab") * hf + dec("xbb")).as("_sxx"),
      sum(dec("yaa") * sq + two * dec("yab") * hf + dec("ybb")).as("_syy"),
      sum(dec("paa") * sq + dec("pab") * hf + dec("pbb")).as("_sxy"))
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val scored = base.crossJoin(broadcast(moments))
    val nD = d(col("_n"))
    // population covariance in µ² units; d² is scale-invariant, so the
    // µ scale cancels and no unit back-conversion is needed
    val mx = d(col("_sx")) / nD
    val my = d(col("_sy")) / nD
    val vx = d(col("_sxx")) / nD - mx * mx
    val vy = d(col("_syy")) / nD - my * my
    val cxy = d(col("_sxy")) / nD - mx * my
    val det = vx * vy - cxy * cxy
    val dx = d(col("_x")) - mx
    val dy = d(col("_y")) - my
    val md2 = (dx * (vy * dx - cxy * dy) + dy * (vx * dy - cxy * dx)) / det
    scored
      .select(col("_id"), col("_x"), col("_y"),
        when(det <= 0.0, lit(null).cast("long"))
          .otherwise(floor(md2 * 1e6 + 0.5).cast("long")).as("_m"))
      .orderBy(col("_m").desc_nulls_last, col("_id").asc)
      .limit(topK)
      .select(col("_id").as(idCol),
        round(d(col("_x")) / 1e6, 6).as(xCol),
        round(d(col("_y")) / 1e6, 6).as(yCol),
        round(d(col("_m")) / 1e6, 6).as("md2"))
  }

  /** GENERAL-d Mahalanobis scoring over a vector column (r16, VERDICT
    * r15 #8) — the d-dimensional member the bivariate gate documents:
    * d² = (v−µ)ᵀ Σ⁻¹ (v−µ) over an `array<float/double>` embedding
    * column, top-k by score.
    *
    * Shape ([[Pca]]'s posture exactly): ONE scan accumulates the d mean
    * sums and the d(d+1)/2 upper-triangle second-moment sums — each
    * row renders them as one array (nested HOF lambdas, O(1) plan size
    * in d), posexplode + position-keyed exact long sums of 1e-9-quantum
    * integers (order-independent, so the moments are bit-identical
    * under ANY partitioning); the driver inverts the d×d covariance
    * (Gauss–Jordan with partial pivoting — metadata-scale, like the
    * power iteration); Σ⁻¹ and µ broadcast back as plan-time literals
    * and scoring is a narrow O(d²)-per-row projection + TakeOrdered.
    * Nothing corpus-sized shuffles.
    *
    * Why no DuckDB gate: a pivoting SOLVER is not bit-mirrorable in
    * SQL (elimination order decides last-ulp bits), unlike the
    * adjugate closed form of [[mahalanobis2]]. The correctness
    * contract is therefore (OutliersSpec): exact-integer moments ⇒
    * PARTITIONING-INVARIANT output (a determinism property DuckDB
    * could not witness anyway), plus d=2 equivalence to the
    * closed-form bivariate path within rounding.
    *
    * Overflow bound (the Pca bound): per-row quanta ≤ Q·max|vᵢvⱼ|, so
    * unit-normalized embeddings keep every position's long sum safe to
    * ~9e9 rows; ANSI mode throws (never corrupts) beyond — shrink the
    * quantum or pre-aggregate per partition past that.
    *
    * Output: top-k (idCol, md2 to 6 dp), md2 DESC, id ASC tie-break.
    */
  def mahalanobisD(df: DataFrame, vecCol: String, idCol: String,
                   dim: Int, topK: Int): DataFrame = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    val Q = 1.0e9
    val e = col("_e")
    val meanPart = transform(sequence(lit(0), lit(dim - 1)), i =>
      floor(get(e, i) * Q + 0.5).cast("long"))
    val tri = flatten(transform(sequence(lit(0), lit(dim - 1)), i =>
      transform(sequence(i, lit(dim - 1)), j =>
        floor(get(e, i) * get(e, j) * Q + 0.5).cast("long"))))
    val vd = transform(col(vecCol), _.cast("double"))
    val sums = df
      .select(vd.as("_e"))
      .filter(e.isNotNull && size(e) === dim)
      .select(posexplode_outer(concat(meanPart, tri)).as(Seq("_i", "_q")))
      .filter(col("_q").isNotNull)
      .groupBy(col("_i")).agg(count(lit(1)).as("_n"), sum(col("_q")).as("_s"))
      .collect()
    require(sums.nonEmpty, "mahalanobisD: no complete vectors to score")
    val nRows = sums.map(_.getLong(1)).max
    val flat = new Array[Long](dim + dim * (dim + 1) / 2)
    sums.foreach(r => flat(r.getInt(0)) = r.getLong(2))
    val mu = Array.tabulate(dim)(i => flat(i) / Q / nRows)
    val cov = Array.ofDim[Double](dim, dim)
    var idx = dim
    for (i <- 0 until dim; j <- i until dim) {
      val m2 = flat(idx) / Q / nRows
      val c = m2 - mu(i) * mu(j)
      cov(i)(j) = c
      cov(j)(i) = c
      idx += 1
    }
    val ainv = invert(cov)
    val muLit = array(mu.toIndexedSeq.map(lit(_)): _*)
    val aLit = array(ainv.toIndexedSeq.map(row =>
      array(row.toIndexedSeq.map(lit(_)): _*)): _*)
    val dIdx = sequence(lit(0), lit(dim - 1))
    val diff = col("_diff")
    val md2 = aggregate(dIdx, lit(0.0), (acc, i) =>
      acc + get(diff, i) * aggregate(dIdx, lit(0.0), (a2, j) =>
        a2 + get(get(aLit, i), j) * get(diff, j)))
    df.select(col(idCol).cast("long").as("_id"), vd.as("_e"))
      .filter(e.isNotNull && size(e) === dim)
      .withColumn("_diff", zip_with(e, muLit, (x, m) => x - m))
      .withColumn("_m", floor(md2 * 1e6 + 0.5).cast("long"))
      .orderBy(col("_m").desc_nulls_last, col("_id").asc)
      .limit(topK)
      .select(col("_id").as(idCol),
        round(col("_m").cast("double") / 1e6, 6).as("md2"))
  }

  /** Driver-side Gauss–Jordan inversion with partial pivoting —
    * metadata-scale (d×d). Throws on a (near-)singular covariance: a
    * constant or linearly dependent dimension has no Mahalanobis
    * metric; callers drop the dimension or regularize explicitly
    * (silent ridge-regularization would change scores invisibly).
    */
  private[operators] def invert(m0: Array[Array[Double]]): Array[Array[Double]] = {
    val d = m0.length
    val a = Array.tabulate(d, d)((i, j) => m0(i)(j))
    val inv = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    val scale = math.max(a.map(_.map(math.abs).max).max, java.lang.Double.MIN_NORMAL)
    for (c <- 0 until d) {
      val p = (c until d).maxBy(r => math.abs(a(r)(c)))
      require(math.abs(a(p)(c)) > 1e-12 * scale,
        s"covariance is singular at dimension $c (constant or linearly dependent); drop the dimension or regularize")
      if (p != c) {
        val t = a(p); a(p) = a(c); a(c) = t
        val u = inv(p); inv(p) = inv(c); inv(c) = u
      }
      val piv = a(c)(c)
      var j = 0
      while (j < d) { a(c)(j) /= piv; inv(c)(j) /= piv; j += 1 }
      for (r <- 0 until d if r != c) {
        val f = a(r)(c)
        if (f != 0.0) {
          var k = 0
          while (k < d) { a(r)(k) -= f * a(c)(k); inv(r)(k) -= f * inv(c)(k); k += 1 }
        }
      }
    }
    inv
  }

  /** DuckDB oracle twin of [[mahalanobis2]] — same exact moments, same
    * mirrored closed-form expression, same µ-quantized order key.
    */
  def duckMahalanobis2(rel: String, idCol: String, xCol: String,
                       yCol: String, topK: Int): String =
    s"""WITH base AS (
       |  SELECT CAST($idCol AS BIGINT) AS id,
       |         CAST(floor(CAST($xCol AS DOUBLE) * 1000000.0 + 0.5) AS HUGEINT) AS x,
       |         CAST(floor(CAST($yCol AS DOUBLE) * 1000000.0 + 0.5) AS HUGEINT) AS y
       |  FROM $rel),
       |mo AS (
       |  SELECT CAST(count(*) AS DOUBLE) AS n,
       |         CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
       |         CAST(sum(x * x) AS DOUBLE) AS sxx,
       |         CAST(sum(y * y) AS DOUBLE) AS syy,
       |         CAST(sum(x * y) AS DOUBLE) AS sxy
       |  FROM base),
       |st AS (
       |  SELECT n, sx / n AS mx, sy / n AS my,
       |         sxx / n - (sx / n) * (sx / n) AS vx,
       |         syy / n - (sy / n) * (sy / n) AS vy,
       |         sxy / n - (sx / n) * (sy / n) AS cxy
       |  FROM mo),
       |sc AS (
       |  SELECT id, x, y,
       |         CASE WHEN (vx * vy - cxy * cxy) <= 0.0 THEN NULL
       |              ELSE CAST(floor(
       |                ((CAST(x AS DOUBLE) - mx)
       |                   * (vy * (CAST(x AS DOUBLE) - mx)
       |                      - cxy * (CAST(y AS DOUBLE) - my))
       |                 + (CAST(y AS DOUBLE) - my)
       |                   * (vx * (CAST(y AS DOUBLE) - my)
       |                      - cxy * (CAST(x AS DOUBLE) - mx)))
       |                / (vx * vy - cxy * cxy) * 1000000.0 + 0.5) AS BIGINT) END AS m
       |  FROM base CROSS JOIN st)
       |SELECT id AS $idCol,
       |       round(CAST(x AS DOUBLE) / 1e6, 6) AS $xCol,
       |       round(CAST(y AS DOUBLE) / 1e6, 6) AS $yCol,
       |       round(CAST(m AS DOUBLE) / 1e6, 6) AS md2
       |FROM sc
       |ORDER BY m DESC NULLS LAST, id ASC
       |LIMIT $topK""".stripMargin
}
