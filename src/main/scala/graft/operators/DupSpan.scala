package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Duplicated-span detection — the ExactSubstr signal from Lee et al.,
  * "Deduplicating Training Data Makes Language Models Better" (2022):
  * that work removes any ≥ 50-token span appearing verbatim in another
  * document; this operator computes, per document, how much of it is
  * covered by such cross-document spans and the longest one, as word
  * k-gram run lengths (a shared span of s ≥ k tokens is exactly a run
  * of s−k+1 consecutive shared k-grams).
  *
  * Scale shape, fully join-free:
  *   - gram hashing is the narrow [[Winnow]] projection;
  *   - "shared with ANOTHER document" is `min(doc) ≠ max(doc)` over a
  *     window partitioned by the gram hash — one gram-keyed exchange,
  *     no self-join, no distinct-count (within-doc repetition alone
  *     does NOT mark a gram shared);
  *   - run lengths are gaps-and-islands (`pos − row_number`) over a
  *     doc-keyed window — integer arithmetic only, so the DuckDB
  *     oracle is exact by construction.
  *
  * Output (docs with ≥ 1 shared gram): (idCol, n_grams, n_dup,
  * max_run, max_span_tokens = max_run + k − 1).
  */
object DupSpan {

  /** (idCol, n_grams, _pos, _h) gram-position rows. posexplode_OUTER is
    * deliberate: plain posexplode makes Catalyst synthesize a
    * `size(gh) > 0` filter and push it below the projections, inlining
    * the whole gram-hash chain into the predicate with the word-hash
    * transform re-expanded INSIDE each per-gram lambda — O(grams ×
    * chars) per row, measured 100× slower at sf0.1. The outer variant
    * generates no such filter; empty docs surface one null-hash row
    * dropped right after the Generate, where the predicate only
    * references Generate output and cannot be pushed down.
    */
  private def positioned(docs: DataFrame, textCol: String, idCol: String,
                         k: Int): DataFrame =
    Dedup.rebalance(docs)
      .withColumn("_wh", Winnow.wordHashes(textCol))
      .withColumn("_gh", Winnow.gramHashes(k))
      // n_grams rides along as a narrow per-row constant — joining it
      // back later would cost a doc-keyed join against the corpus.
      .select(col(idCol), size(col("_gh")).cast("long").as("n_grams"),
        posexplode_outer(col("_gh")).as(Seq("_pos", "_h")))
      .filter(col("_h").isNotNull)

  def stats(docs: DataFrame, textCol: String, idCol: String, k: Int): DataFrame = {
    val byGram = Window.partitionBy(col("_h"))
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("_pos"))
    positioned(docs, textCol, idCol, k)
      .withColumn("_shared",
        min(col(idCol)).over(byGram) =!= max(col(idCol)).over(byGram))
      .filter(col("_shared"))
      .withColumn("_grp", col("_pos") - row_number().over(byDoc))
      .groupBy(col(idCol), col("n_grams"), col("_grp"))
      .agg(count(lit(1)).as("_run"))
      .groupBy(col(idCol), col("n_grams"))
      .agg(
        sum(col("_run")).as("n_dup"),
        max(col("_run")).as("max_run"))
      .withColumn("max_span_tokens", col("max_run") + (k - 1))
  }

  /** The rewrite ExactSubstr actually performs: cut every token span
    * covered by a run of ≥ `minRun` cross-doc-shared k-grams (span
    * length ≥ minRun + k − 1 tokens) and reassemble the remainder in
    * order. Token intervals from nearby islands may overlap (islands
    * are gram-disjoint, tokens are not when the gap is < k); the
    * membership test over the interval list handles the union
    * implicitly.
    *
    * One doc-keyed exchange collects each document's cut intervals;
    * they rejoin the corpus scan by id (docs with none pass through the
    * left join uncut) and the rewrite is a narrow HOF filter over token
    * positions. Output: (idCol, clean_text, n_tokens, n_cut).
    */
  def strip(docs: DataFrame, textCol: String, idCol: String,
            k: Int, minRun: Int): DataFrame = {
    val byGram = Window.partitionBy(col("_h"))
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("_pos"))
    val intervals = positioned(docs, textCol, idCol, k)
      .withColumn("_shared",
        min(col(idCol)).over(byGram) =!= max(col(idCol)).over(byGram))
      .filter(col("_shared"))
      .withColumn("_grp", col("_pos") - row_number().over(byDoc))
      .groupBy(col(idCol), col("_grp"))
      .agg(min(col("_pos")).cast("long").as("_s"), count(lit(1)).as("_run"))
      .filter(col("_run") >= minRun)
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("_s"),
        (col("_s") + col("_run") + (k - 2)).as("_e"))).as("_iv"))
    val w = graft.functions.TextAnalysis.tokens(col(textCol))
    val cut = coalesce(col("_iv"),
      array().cast("array<struct<_s:bigint,_e:bigint>>"))
    // Empty docs: sequence(0, -1) would generate a DESCENDING range.
    val positions = when(size(col("_w")) === 0, array().cast("array<int>"))
      .otherwise(sequence(lit(0), size(col("_w")) - 1))
    val keptIdx = filter(positions, i =>
      !exists(cut, iv => i.cast("long").between(iv.getField("_s"), iv.getField("_e"))))
    docs.select(col(idCol), col(textCol)).withColumn("_w", w)
      .join(intervals, Seq(idCol), "left")
      .select(
        col(idCol),
        concat_ws(" ",
          transform(keptIdx, i => element_at(col("_w"), i + 1))).as("clean_text"),
        size(col("_w")).cast("long").as("n_tokens"),
        (size(col("_w")) - size(keptIdx)).cast("long").as("n_cut"))
  }

  /** DuckDB oracle for [[strip]] — identical islands, intervals, and
    * position-membership rewrite.
    */
  def duckStrip(tbl: String, textCol: String, idCol: String,
                k: Int, minRun: Int): String =
    s"""WITH ${Winnow.duckGramCtes(tbl, textCol, idCol, k)},
       |e AS (SELECT $idCol, i - 1 AS pos, gh[i] AS h
       |      FROM gh, unnest(range(1, len(gh) + 1)) AS t(i)),
       |f AS (SELECT *, min($idCol) OVER (PARTITION BY h)
       |                <> max($idCol) OVER (PARTITION BY h) AS shared FROM e),
       |g AS (SELECT *, pos - row_number() OVER (PARTITION BY $idCol ORDER BY pos) AS grp
       |      FROM f WHERE shared),
       |r AS (SELECT $idCol, grp, min(pos) AS s, count(*) AS run
       |      FROM g GROUP BY $idCol, grp HAVING count(*) >= $minRun),
       |iv AS (SELECT $idCol, list({'s': s, 'e': s + run + ${k - 2}}) AS ivs
       |       FROM r GROUP BY $idCol)
       |SELECT d.$idCol,
       |       coalesce(array_to_string(
       |         list_transform(
       |           list_filter(range(0, len(w)),
       |             i -> len(list_filter(coalesce(ivs, []),
       |                        x -> i BETWEEN x.s AND x.e)) = 0),
       |           i -> w[i + 1]), ' '), '') AS clean_text,
       |       CAST(len(w) AS BIGINT) AS n_tokens,
       |       CAST(len(w) - len(list_filter(range(0, len(w)),
       |             i -> len(list_filter(coalesce(ivs, []),
       |                        x -> i BETWEEN x.s AND x.e)) = 0)) AS BIGINT) AS n_cut
       |FROM d LEFT JOIN iv ON d.$idCol = iv.$idCol""".stripMargin

  /** DuckDB oracle for [[stats]] — identical gram hashes, window
    * sharing test, and islands arithmetic.
    */
  def duckStats(tbl: String, textCol: String, idCol: String, k: Int): String =
    s"""WITH ${Winnow.duckGramCtes(tbl, textCol, idCol, k)},
       |e AS (SELECT $idCol, CAST(len(gh) AS BIGINT) AS n_grams,
       |             i - 1 AS pos, gh[i] AS h
       |      FROM gh, unnest(range(1, len(gh) + 1)) AS t(i)),
       |f AS (SELECT *, min($idCol) OVER (PARTITION BY h)
       |                <> max($idCol) OVER (PARTITION BY h) AS shared FROM e),
       |g AS (SELECT *, pos - row_number() OVER (PARTITION BY $idCol ORDER BY pos) AS grp
       |      FROM f WHERE shared),
       |r AS (SELECT $idCol, n_grams, grp, count(*) AS run
       |      FROM g GROUP BY $idCol, n_grams, grp)
       |SELECT $idCol, n_grams,
       |       CAST(sum(run) AS BIGINT) AS n_dup,
       |       CAST(max(run) AS BIGINT) AS max_run,
       |       CAST(max(run) + ${k - 1} AS BIGINT) AS max_span_tokens
       |FROM r GROUP BY $idCol, n_grams""".stripMargin
}
