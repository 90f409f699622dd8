package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding storage/compression operators for the vector side of a
  * training-data pipeline. The headline one is symmetric int8
  * quantization — the standard 4× shrink applied before shipping or
  * indexing 100 TB of float vectors:
  *
  *   scale = max(|x|) / 127 ;  q_i = floor(x_i / scale + 0.5)
  *
  * Everything is built-in higher-order functions over the array column —
  * one narrow codegen'd projection per row, no UDFs, no shuffle — and
  * every formula has a DuckDB twin (left-fold reductions, identical IEEE
  * double arithmetic) so the gate checks values bitwise.
  */
object Embeddings {

  /** Modulus for the quantized-vector digest (same prime family as
    * [[TextAnalysis.fingerprint]]): keeps the rolling hash inside a Long
    * under ANSI overflow checking.
    */
  val DigestMod = 1000000007L

  private def asDouble(vec: Column): Column = transform(vec, _.cast("double"))

  /** max(|x_i|) via one left fold. */
  def maxAbs(vec: Column): Column =
    aggregate(asDouble(vec), lit(0.0), (acc, x) => greatest(acc, abs(x)))

  /** Symmetric int8 quantization of `vecCol`, emitted as audit scalars:
    * the scale, a rolling-hash digest pinning every quantized value, and
    * the reconstruction MSE. A production variant would emit the
    * `array<tinyint>` itself; scalars keep the gate's hash compare
    * engine-portable while proving the identical quantization math.
    */
  def quantizeInt8(df: DataFrame, vecCol: String, idCol: String): DataFrame =
    df.select(col(idCol), asDouble(col(vecCol)).as("_e"))
      .withColumn("_scale", maxAbs(col("_e")) / 127.0)
      // All-zero vectors quantize to zeros (scale 0 guard).
      .withColumn("_q", transform(col("_e"), x =>
        when(col("_scale") === 0.0, lit(0L))
          .otherwise(floor(x / col("_scale") + 0.5))))
      .select(
        col(idCol),
        round(col("_scale"), 9).as("scale"),
        aggregate(col("_q"), lit(0L),
          (acc, v) => (acc * 31L + v) % DigestMod).as("q_digest"),
        // Empty vector ⇒ mse 0 by definition (the 0/0 division would be
        // NaN in Spark but engine-dependent in DuckDB).
        round(
          when(size(col("_e")) === 0, lit(0.0)).otherwise(
            aggregate(zip_with(col("_e"), col("_q"),
                (x, q) => (x - q * col("_scale")) * (x - q * col("_scale"))),
              lit(0.0), _ + _) / size(col("_e")).cast("double")),
          9).as("mse"))

  /** DuckDB oracle for [[quantizeInt8]] over table `tbl`. */
  def duckQuantizeInt8(tbl: String, vecCol: String, idCol: String): String =
    s"""WITH v AS (
       |  SELECT $idCol, CAST($vecCol AS DOUBLE[]) AS e FROM $tbl),
       |s AS (
       |  SELECT $idCol, e,
       |         list_reduce(list_prepend(0.0, list_transform(e, x -> abs(x))),
       |                     (acc, x) -> greatest(acc, x)) / 127.0 AS sc
       |  FROM v),
       |q AS (
       |  SELECT $idCol, e, sc,
       |         list_transform(e, x -> CASE WHEN sc = 0.0 THEN CAST(0 AS BIGINT)
       |           ELSE CAST(floor(x / sc + 0.5) AS BIGINT) END) AS qv
       |  FROM s)
       |SELECT $idCol,
       |       round(sc, 9) AS scale,
       |       list_reduce(list_prepend(CAST(0 AS BIGINT), qv),
       |                   (acc, x) -> (acc * 31 + x) % $DigestMod) AS q_digest,
       |       round(CASE WHEN len(e) = 0 THEN 0.0
       |             ELSE list_reduce(list_prepend(0.0,
       |               [(e[i] - qv[i] * sc) * (e[i] - qv[i] * sc)
       |                for i in range(1, len(e) + 1)]),
       |             (acc, x) -> acc + x) / CAST(len(e) AS DOUBLE) END, 9) AS mse
       |FROM q""".stripMargin

  // ------------------------------------- Johnson–Lindenstrauss projection

  /** Deterministic ±1 entry (i, j) of the JL projection matrix (Achlioptas
    * 2001: ±1 entries satisfy the JL lemma — no Gaussians needed):
    * squared-LCG parity, `((i·A + j·B + C)² mod P) even → +1`. The square
    * breaks the linear parity pattern a plain `(i·A+j·B) mod 2` would
    * have; everything stays below 2⁶³ (s₀ < P ≈ 10⁹, s₀² < 10¹⁸).
    */
  def jlSign(i: Int, j: Int): Double = {
    val s0 = (i.toLong * 2654435761L + j.toLong * 40503L + 12345L) % DigestMod
    if (((s0 * s0) % DigestMod) % 2 == 0) 1.0 else -1.0
  }

  /** JL random projection `srcDim → outDim`: yⱼ = (Σᵢ ±vᵢ) / √outDim,
    * emitted as `outDim` columns `p00..` rounded to 6 dp.
    *
    * The sign matrix is resolved AT PLAN TIME ([[jlSign]] is pure
    * Scala), so each output is a literal-sign fused add chain — one
    * narrow whole-stage-codegen projection, no per-row hashing, no
    * shuffle, no UDF. Term order is the reduceLeft chain i = 0,1,…;
    * the DuckDB twin renders the same left-associated chain, so the
    * IEEE double results match bitwise before the final round.
    */
  /** The signed sum Σᵢ ±vᵢ for output dim `j` over the bound `_e`. */
  private def jlSum(j: Int, srcDim: Int): Column =
    (0 until srcDim).map { i =>
      val x = element_at(col("_e"), i + 1)
      if (jlSign(i, j) > 0) x else -x
    }.reduceLeft(_ + _)

  def randProject(df: DataFrame, vecCol: String, idCol: String,
                  srcDim: Int, outDim: Int): DataFrame = {
    val scale = 1.0 / math.sqrt(outDim.toDouble)
    val projected = (0 until outDim).map { j =>
      round(jlSum(j, srcDim) * scale, 6).as(f"p$j%02d")
    }
    df.select(col(idCol), asDouble(col(vecCol)).as("_e"))
      .select(col(idCol) +: projected: _*)
  }

  /** [[randProject]] packed as an `array<float>` column (unrounded —
    * a float cast of bitwise-equal doubles is bitwise-equal), the shape
    * the similarity operators consume: project once, search in 16 dims.
    */
  def randProjectVec(df: DataFrame, vecCol: String, idCol: String,
                     srcDim: Int, outDim: Int, as: String): DataFrame = {
    val scale = 1.0 / math.sqrt(outDim.toDouble)
    val proj = array((0 until outDim).map(j =>
      (jlSum(j, srcDim) * scale).cast("float")): _*)
    df.select(col(idCol), asDouble(col(vecCol)).as("_e"))
      .select(col(idCol), proj.as(as))
  }

  /** DuckDB oracle for [[randProject]] — same literal signs, same
    * left-associated summation, same scale and rounding. `scaleSql`
    * must be the exact decimal of 1/√outDim (0.25 for outDim 16).
    */
  /** SQL twin of [[jlSum]]: the left-associated signed chain over a
    * bound `e`.
    */
  private def jlChainSql(j: Int, srcDim: Int): String =
    (0 until srcDim).map { i =>
      val sgn = if (jlSign(i, j) > 0) "+" else "-"
      s"$sgn e[${i + 1}]"
    }.mkString(" ")

  def duckRandProject(tbl: String, vecCol: String, idCol: String,
                      srcDim: Int, outDim: Int, scaleSql: String): String = {
    val colSql = (0 until outDim).map { j =>
      f"round((${jlChainSql(j, srcDim)}) * $scaleSql, 6) AS p$j%02d"
    }.mkString(",\n       ")
    s"""WITH v AS (SELECT $idCol, CAST($vecCol AS DOUBLE[]) AS e FROM $tbl)
       |SELECT $idCol,
       |       $colSql
       |FROM v""".stripMargin
  }

  /** SQL twin of [[randProjectVec]]'s array (bound `e`): REAL[] of the
    * unrounded scaled chains.
    */
  def duckRandProjectVec(srcDim: Int, outDim: Int, scaleSql: String): String =
    "CAST([" + (0 until outDim).map(j =>
      s"(${jlChainSql(j, srcDim)}) * $scaleSql").mkString(", ") + "] AS REAL[])"
}
