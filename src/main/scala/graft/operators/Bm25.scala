package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** BM25 relevance scoring of every document against a fixed query-term
  * set — the classic retrieval scorer used to mine "relevant to topic X"
  * slices out of a pre-training corpus (quality-targeted data selection;
  * the reference exports tables verbatim, this is a scale extension).
  *
  * score(d) = Σ_t idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1−b+b·|d|/avgdl))
  * idf(t)   = ln((N − df(t) + 0.5) / (df(t) + 0.5) + 1)       (BM25+-style
  * non-negative idf, Robertson–Spärck Jones with the +1 floor).
  *
  * Scale shape: the query-term set is a handful of LITERALS, so per-doc
  * term frequencies are a narrow codegen projection over the scan — no
  * explode, no per-term shuffle. Corpus constants (N, Σ|d|, df per term)
  * reduce in ONE map-side-combined aggregate to a single row that is
  * broadcast back; the score itself is another narrow projection. Total
  * cost at any scale: one scan + one 1-row broadcast — the same shape
  * 1000 executors want at 100 TB.
  *
  * Float parity: every count stays integral until the score expression;
  * the per-term score terms are summed in QUERY-TERM DECLARATION ORDER
  * (a fixed left-to-right `+` chain in both engines — not a fold over
  * data-dependent order), with one `round(·, 6)` at the end.
  */
object Bm25 {

  val K1 = 1.2
  val B = 0.75

  /** Per-document BM25 score for `terms` (lowercase whitespace tokens).
    * Output: (idCol, dl, score ordered columns) — dl is the doc token
    * length the score used (audit column).
    */
  def score(docs: DataFrame, textCol: String, idCol: String,
            terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty && terms == terms.distinct,
      "query terms must be non-empty and distinct")
    // Locale.ROOT: the engines fold documents with SQL lower() (locale-
    // insensitive); a default-locale toLowerCase here (e.g. Turkish
    // dotted-I) could reject terms the engines would fold fine.
    require(terms == terms.map(_.toLowerCase(java.util.Locale.ROOT)),
      "query terms must be lowercase (documents are lowercased before matching)")
    val base = Dedup.rebalance(docs)
      .withColumn("_w", TextAnalysis.tokens(lower(col(textCol))))
      .withColumn("_dl", size(col("_w")).cast("long"))
    val withTf = terms.zipWithIndex.foldLeft(base) { case (df, (t, i)) =>
      df.withColumn(s"_tf$i", TextAnalysis.wordCountOf(col("_w"), t))
    }
    // ONE tiny aggregate: N, Σ|d|, df per query term.
    val statAggs = Seq(count(lit(1)).as("_n"), sum(col("_dl")).as("_sumdl")) ++
      terms.indices.map(i =>
        sum((col(s"_tf$i") > 0).cast("long")).as(s"_df$i"))
    val stats = withTf.agg(statAggs.head, statAggs.tail: _*)
    val scored = withTf.crossJoin(broadcast(stats))
    val avgdl = col("_sumdl").cast("double") / col("_n").cast("double")
    val termScores = terms.indices.map { i =>
      val tf = col(s"_tf$i").cast("double")
      val idf = log(
        (col("_n").cast("double") - col(s"_df$i").cast("double") + 0.5) /
          (col(s"_df$i").cast("double") + 0.5) + 1.0)
      idf * (tf * (K1 + 1.0)) /
        (tf + lit(K1) * (lit(1.0) - B + lit(B) * col("_dl").cast("double") / avgdl))
    }
    scored.select(col(idCol), col("_dl").as("dl"),
      round(termScores.reduce(_ + _), 6).as("bm25"))
  }

  /** DuckDB oracle twin of [[score]] — identical formula, identical
    * term-order `+` chain.
    */
  def duckScore(tbl: String, textCol: String, idCol: String,
                terms: Seq[String]): String = {
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      s"CAST(len(list_filter(w, x -> x = '${t.replace("'", "''")}')) AS BIGINT) AS tf$i"
    }.mkString(", ")
    val dfCols = terms.indices.map(i =>
      s"CAST(sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df$i").mkString(", ")
    val termScores = terms.indices.map { i =>
      s"""(ln((CAST(n AS DOUBLE) - CAST(df$i AS DOUBLE) + 0.5) /
         |     (CAST(df$i AS DOUBLE) + 0.5) + 1.0) *
         |  (CAST(tf$i AS DOUBLE) * (${K1} + 1.0)) /
         |  (CAST(tf$i AS DOUBLE) + ${K1} * (1.0 - ${B} + ${B} * CAST(dl AS DOUBLE) /
         |     (CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE)))))""".stripMargin
    }.mkString(" + ")
    s"""WITH d AS (SELECT $idCol, ${TextAnalysis.duckTokensBind(s"lower($textCol)")} AS w FROM $tbl),
       |tf AS (SELECT $idCol, CAST(len(w) AS BIGINT) AS dl, $tfCols FROM d),
       |st AS (SELECT count(*) AS n, CAST(sum(dl) AS BIGINT) AS sumdl, $dfCols FROM tf)
       |SELECT $idCol, dl, round($termScores, 6) AS bm25 FROM tf, st""".stripMargin
  }
}
