package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Zipf-law fit of the corpus term distribution — the corpus-profiling
  * diagnostic (a healthy natural-language corpus has log(freq) ≈
  * c − α·log(rank) with α ≈ 1; a bot-generated or template-heavy crawl
  * shows up as a visibly different exponent or a poor fit).
  *
  * OLS of y = ln(freq) on x = ln(rank) over the TOP `topN` terms:
  *   slope = (N·Σxy − Σx·Σy) / (N·Σxx − Σx²),  α = −slope,
  *   c = (Σy − slope·Σx) / N.
  *
  * Determinism across engines: ranks are (count DESC, term ASC)
  * tie-broken, and every fp sum is a LEFT FOLD over the rank-sorted
  * list (the [[Idf]] convention) — so both engines add identical IEEE
  * doubles in identical order and the 6 dp outputs match exactly.
  *
  * Scale shape: one token-key exchange to term counts (vocab-sized
  * output), a TakeOrdered top-N (per-partition heaps — never a global
  * sort of the vocabulary), then all remaining work happens on ≤ topN
  * rows collapsed to ONE list row. The head of the distribution is
  * statistically where a Zipf fit is meaningful anyway — the tail is
  * dominated by hapax noise.
  */
object Zipf {

  /** One-row fit: (n_terms, alpha, intercept). */
  def fit(docs: DataFrame, textCol: String, topN: Int): DataFrame = {
    val counts = Dedup.rebalance(docs)
      .select(explode(TextAnalysis.tokens(col(textCol))).as("_t"))
      .groupBy(col("_t")).agg(count(lit(1)).as("_n"))
    val top = counts.orderBy(col("_n").desc, col("_t").asc).limit(topN)
    // topN rows: the rank window is over the already-bounded head.
    val ranked = top.withColumn("_r",
      row_number().over(Window.orderBy(col("_n").desc, col("_t").asc)))
    def fold(l: Column, f: Column => Column): Column =
      aggregate(l, lit(0.0), (acc, s) => acc + f(s))
    ranked
      .agg(sort_array(collect_list(struct(col("_r"), col("_n")))).as("_l"),
        count(lit(1)).as("n_terms"))
      .select(col("n_terms"), col("_l"))
      .withColumn("_sx", fold(col("_l"), s => log(s.getField("_r").cast("double"))))
      .withColumn("_sy", fold(col("_l"), s => log(s.getField("_n").cast("double"))))
      .withColumn("_sxx", fold(col("_l"),
        s => log(s.getField("_r").cast("double")) * log(s.getField("_r").cast("double"))))
      .withColumn("_sxy", fold(col("_l"),
        s => log(s.getField("_r").cast("double")) * log(s.getField("_n").cast("double"))))
      .withColumn("_nd", col("n_terms").cast("double"))
      .withColumn("_slope",
        (col("_nd") * col("_sxy") - col("_sx") * col("_sy")) /
          (col("_nd") * col("_sxx") - col("_sx") * col("_sx")))
      .select(col("n_terms"),
        round(-col("_slope"), 6).as("alpha"),
        round((col("_sy") - col("_slope") * col("_sx")) / col("_nd"), 6)
          .as("intercept"))
  }

  /** DuckDB oracle for [[fit]] — same ranks, same rank-sorted left
    * folds, same final arithmetic.
    */
  def duckFit(tbl: String, textCol: String, topN: Int): String = {
    def fold(expr: String): String =
      s"""list_reduce(list_prepend(0.0, list($expr ORDER BY r)),
         |            (acc, x) -> acc + x)""".stripMargin
    s"""WITH d AS (SELECT ${TextAnalysis.duckTokensBind(textCol)} AS w FROM $tbl),
       |c AS (SELECT t, count(*) AS n
       |      FROM (SELECT unnest(w) AS t FROM d) GROUP BY t
       |      ORDER BY n DESC, t ASC LIMIT $topN),
       |r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY n DESC, t ASC) AS r FROM c),
       |s AS (SELECT count(*) AS n_terms,
       |             ${fold("ln(CAST(r AS DOUBLE))")} AS sx,
       |             ${fold("ln(CAST(n AS DOUBLE))")} AS sy,
       |             ${fold("ln(CAST(r AS DOUBLE)) * ln(CAST(r AS DOUBLE))")} AS sxx,
       |             ${fold("ln(CAST(r AS DOUBLE)) * ln(CAST(n AS DOUBLE))")} AS sxy
       |      FROM r)
       |SELECT n_terms,
       |       round(-((CAST(n_terms AS DOUBLE) * sxy - sx * sy)
       |               / (CAST(n_terms AS DOUBLE) * sxx - sx * sx)), 6) AS alpha,
       |       round((sy - ((CAST(n_terms AS DOUBLE) * sxy - sx * sy)
       |                    / (CAST(n_terms AS DOUBLE) * sxx - sx * sx)) * sx)
       |             / CAST(n_terms AS DOUBLE), 6) AS intercept
       |FROM s""".stripMargin
  }
}
