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

  def stats(docs: DataFrame, textCol: String, idCol: String, k: Int): DataFrame = {
    val positioned = Dedup.rebalance(docs)
      .withColumn("_wh", Winnow.wordHashes(textCol))
      .withColumn("_gh", Winnow.gramHashes(k))
      // n_grams rides along as a narrow per-row constant — joining it
      // back later would cost a doc-keyed join against the corpus.
      .select(col(idCol), size(col("_gh")).cast("long").as("n_grams"),
        posexplode(col("_gh")).as(Seq("_pos", "_h")))
    val byGram = Window.partitionBy(col("_h"))
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("_pos"))
    positioned
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
