package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed PCA (top principal component) over an embedding column,
  * shaped for one pass at 100 TB:
  *
  *   1. ONE scan accumulates the d(d+1)/2 upper-triangle entries of the
  *      second-moment (Gram) matrix Σ vvᵀ — each row renders its upper
  *      triangle as one array (nested HOF lambdas, O(1) plan size in d)
  *      and a position-keyed partial-agg sum folds them; no
  *      per-iteration rescan.
  *   2. The driver power-iterates on the collected d×d matrix — 32 KB
  *      of metadata, same posture as the k-means centroid collect
  *      (Similarity.kmeansCells).
  *   3. The unit eigenvector is broadcast back as plan-time literals;
  *      scoring is a narrow codegen'd dot-product projection.
  *
  * Cross-engine determinism is the interesting part: float sums are
  * order-dependent, and aggregation order is not reproducible, so each
  * row's contribution eᵢ·eⱼ is QUANTIZED to an integer number of
  * 1e-9 quanta and summed as exact BIGINTs (the EventStats integral-
  * variance trick). Both engines then run bitwise-identical IEEE double
  * arithmetic from identical integer sums, so the oracle reproduces the
  * whole 8-iteration power method to the last ulp. |eᵢeⱼ|·1e9 ≤ 1e9
  * per row bounds the sum at ~9e9 rows per partition-tree before Long
  * overflow — beyond that, shrink the quantum or pre-aggregate per
  * partition.
  *
  * Mean-centering is deliberately skipped: on (near-)normalized
  * embeddings this is the top eigenvector of the second-moment matrix
  * (the LSA convention), and it keeps the pass single-output.
  */
object Pca {

  /** Quantization: 1e-9 quanta, round-half-up via floor(x·Q + 0.5). */
  val Quantum = 1.0e9

  private def asDouble(vec: Column): Column = transform(vec, _.cast("double"))

  /** The quantized upper-triangle Gram sums, planning-cost O(1) in d.
    *
    * The first cut spelled this as d(d+1)/2 NAMED aggregate columns —
    * constant in data size but quadratic in dimension at PLANNING time
    * (d=64 → 2080 aggregate expressions ≈ 7 s of pure Catalyst work;
    * d=256 would be ~33k and wall). Instead each row renders its
    * upper triangle as ONE array via nested codegen'd HOF lambdas
    * (i-major, matching the c_{i}_{j} order), posexplodes it, and sums
    * per position — a fixed-width plan whatever d is. The exchange
    * carries ≤ d(d+1)/2 rows per map partition (map-side combine), and
    * the integer quanta keep the sums order-independent, so the DuckDB
    * oracle's wide-aggregate spelling produces bitwise-identical longs.
    *
    * posexplode_OUTER + isNotNull, not plain posexplode: the plain form
    * makes Catalyst synthesize a size(...)>0 filter below the projection
    * with the whole product-array chain inlined into the predicate
    * (the [[DupSpan.positioned]] regression), doubling the per-row work.
    */
  private def gramSums(df: DataFrame, vecCol: String, d: Int): Array[Long] = {
    val e = col("_e")
    val tri = flatten(transform(sequence(lit(0), lit(d - 1)), i =>
      transform(sequence(i, lit(d - 1)), j =>
        floor(get(e, i) * get(e, j) * Quantum + 0.5).cast("long"))))
    val rows = df.select(asDouble(col(vecCol)).as("_e"))
      .select(posexplode_outer(tri).as(Seq("_i", "_q")))
      .filter(col("_q").isNotNull)
      .groupBy(col("_i")).agg(sum(col("_q")).as("_s"))
      .collect()
    val out = new Array[Long](d * (d + 1) / 2)
    rows.foreach(r => out(r.getInt(0)) = r.getLong(1))
    out
  }

  /** Power iteration in driver doubles. The fold shapes (reduceLeft for
    * the matrix-vector dot, foldLeft over squares for the norm) are the
    * contract the DuckDB renderer mirrors token-for-token — change one
    * and the oracle diverges in the last ulp.
    */
  private[graft] def powerIterate(c: Array[Array[Double]], d: Int,
                                  iters: Int): Array[Double] = {
    var x = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    for (_ <- 0 until iters) {
      val y = Array.tabulate(d) { i =>
        (0 until d).map(j => c(i)(j) * x(j)).reduceLeft(_ + _)
      }
      val norm = math.sqrt(y.foldLeft(0.0)((acc, v) => acc + v * v))
      x = y.map(_ / norm)
    }
    x
  }

  /** The unit top-eigenvector estimate after `iters` power steps. */
  def topComponent(df: DataFrame, vecCol: String, d: Int, iters: Int): Array[Double] = {
    val s = gramSums(df, vecCol, d)
    val c = Array.ofDim[Double](d, d)
    var idx = 0
    for (i <- 0 until d; j <- i until d) {
      val v = s(idx) / Quantum
      c(i)(j) = v
      c(j)(i) = v
      idx += 1
    }
    powerIterate(c, d, iters)
  }

  /** Per-row principal-component score: (idCol, pc1 = ⟨e, x⟩ to 6 dp).
    * Sign convention: power iteration's sign is arbitrary, so the
    * component is flipped iff x₀ < 0 — the exact rule the oracle
    * renders (x₀ = 0.0 exactly has measure zero on real data).
    */
  def scores(df: DataFrame, vecCol: String, idCol: String,
             d: Int, iters: Int): DataFrame = {
    val x0 = topComponent(df, vecCol, d, iters)
    val x = if (x0(0) < 0) x0.map(v => -v) else x0
    val dot = (0 until d).map(i =>
      element_at(col("_e"), i + 1) * lit(x(i))).reduceLeft(_ + _)
    df.select(col(idCol), asDouble(col(vecCol)).as("_e"))
      .select(col(idCol), round(dot, 6).as("pc1"))
  }

  // --------------------------------------------------- DuckDB oracle SQL

  /** DuckDB mirror of [[scores]]: the same quantized BIGINT Gram sums,
    * then the 8-step power method UNROLLED as CTE pairs running the
    * identical double arithmetic (left-associated term order, foldLeft
    * norm, sqrt is correctly rounded in both engines), the same
    * first-nonzero-positive sign flip, the same final rounded dot.
    */
  def duckScores(tbl: String, vecCol: String, idCol: String,
                 d: Int, iters: Int): String = {
    val q = Quantum.toLong // 1000000000
    def cName(i: Int, j: Int) = if (i <= j) s"c_${i}_$j" else s"c_${j}_$i"
    val gram = (for (i <- 0 until d; j <- i until d) yield
      s"sum(CAST(floor(e[${i + 1}] * e[${j + 1}] * $q.0 + 0.5) AS BIGINT)) AS c_${i}_$j")
      .mkString(",\n         ")
    val x0 = (0 until d).map(i => s"${1.0 / math.sqrt(d.toDouble)} AS x_$i")
      .mkString(", ")
    val iterCtes = (1 to iters).map { t =>
      val p = if (t == 1) "i0" else s"i${t - 1}"
      val ys = (0 until d).map { i =>
        (0 until d).map(j =>
          s"CAST(${cName(i, j)} AS DOUBLE) / $q.0 * x_$j").mkString(" + ") + s" AS y_$i"
      }.mkString(",\n         ")
      val normSq = (0 until d).map(i => s"y_$i * y_$i")
        .foldLeft("0.0")((acc, t2) => s"$acc + $t2")
      val xs = (0 until d).map(i => s"y_$i / nrm AS x_$i").mkString(", ")
      s"""y$t AS (SELECT $ys FROM g CROSS JOIN $p),
         |n$t AS (SELECT *, sqrt($normSq) AS nrm FROM y$t),
         |i$t AS (SELECT $xs FROM n$t)""".stripMargin
    }.mkString(",\n")
    // Sign flip on x_0 < 0 — the identical rule scores() applies.
    val dot = (0 until d).map(i => s"e[${i + 1}] * xs_$i").mkString(" + ")
    val sgn = (0 until d).map(i =>
      s"CASE WHEN flip THEN -x_$i ELSE x_$i END AS xs_$i").mkString(", ")
    s"""WITH v AS (SELECT $idCol, CAST($vecCol AS DOUBLE[]) AS e FROM $tbl),
       |g AS (SELECT $gram FROM v),
       |i0 AS (SELECT $x0),
       |$iterCtes,
       |sf AS (SELECT *, x_0 < 0.0 AS flip FROM i$iters),
       |sx AS (SELECT $sgn FROM sf)
       |SELECT $idCol, round($dot, 6) AS pc1
       |FROM v CROSS JOIN sx""".stripMargin
  }
}
