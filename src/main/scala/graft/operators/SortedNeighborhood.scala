package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Sorted-neighborhood method (SNM) near-dup candidate generation
  * (Hernández & Stolfo 1995): sort the corpus on a domain key, slide a
  * fixed window of `w` over the sorted order, and verify only pairs
  * that fall inside a window together. The classical alternative to
  * LSH banding when near-dups share key prefixes (title-sorted record
  * linkage, boilerplate-prefixed scrapes): candidate volume is exactly
  * n·(w−1) — linear by construction, no bucket-skew failure mode at
  * all — at the price of recall limited to what the sort key co-locates
  * (quantified by [[recallAudit]], the precision side is 1.0 because
  * every emitted pair is exact-Jaccard verified).
  *
  * Scale shape: the sort is a range-partitioned global sort (Spark's
  * native orderBy — no single-partition window); contiguous ranks come
  * from `zipWithIndex` (one partition-count job + a narrow per-partition
  * index map — the one genuinely-imperative step, Spark has no
  * distributed contiguous-rank operator that avoids a 1-partition
  * window); neighbor pairing is an EQUI-join on rank+offset (offsets
  * exploded, never a rank-band nested loop). Shingle verification runs
  * once per candidate on the (w−1)-amplified stream.
  */
object SortedNeighborhood {

  /** Contiguous 0-based global rank by `sortCols` (must be a TOTAL
    * order — include a unique id as the last key). Appends `rankCol`.
    */
  def globalRank(df: DataFrame, sortCols: Seq[String],
                 rankCol: String): DataFrame = {
    val sorted = df.orderBy(sortCols.map(c => col(c).asc): _*)
    val schema = sorted.schema.add(rankCol, LongType, nullable = false)
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ i)
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** SNM sort key: the first `keyLen` chars of the lowercased text —
    * cheap, deterministic, and shared verbatim with the oracle.
    */
  private def sortKey(textCol: String, keyLen: Int) =
    substring(lower(col(textCol)), 1, keyLen)

  /** Verified SNM pairs: documents within `window` positions of each
    * other in (key, id) sorted order whose word-`n`-gram Jaccard ≥
    * `threshold`. Output: (id_a, id_b, jaccard), id_a < id_b, each
    * unordered pair at sorted distance d emitted once (at offset d).
    */
  def pairs(df: DataFrame, textCol: String, idCol: String,
            keyLen: Int, window: Int, n: Int,
            threshold: Double): DataFrame = {
    require(window >= 2, s"snm: window must be >= 2, got $window")
    // Rank carries only (key, id, text) — the shingle arrays (≈ n× the
    // text payload) are computed ONCE in a narrow projection AFTER the
    // range-partitioned sort, not shipped through it.
    val keyed = df.select(col(idCol).as("_id"), col(textCol).as("_txt"),
      sortKey(textCol, keyLen).as("_key"))
    val ranked = globalRank(keyed, Seq("_key", "_id"), "_rank")
      .select(col("_id"), Dedup.shingleFps(col("_txt"), n).as("_sh"),
        col("_rank"))
    val left = ranked.select(col("_id").as("_ida"), col("_sh").as("_sha"),
        explode(sequence(lit(1L), lit((window - 1).toLong))).as("_o"),
        col("_rank"))
      .select(col("_ida"), col("_sha"), (col("_rank") + col("_o")).as("_r2"))
    val right = ranked.select(col("_id").as("_idb"), col("_sh").as("_shb"),
      col("_rank").as("_r2"))
    left.join(right, "_r2")
      .withColumn("jaccard", round(Dedup.jaccardSorted(col("_sha"), col("_shb")), 6))
      .filter(col("jaccard") >= threshold)
      .select(least(col("_ida"), col("_idb")).as("id_a"),
        greatest(col("_ida"), col("_idb")).as("id_b"), col("jaccard"))
  }

  /** Recall audit vs the exact O(n²) ground truth on an id-bounded
    * slice (the same caller-bounded-audit posture as
    * q_dedup_ngram_jaccard): how many true near-dup pairs does the
    * (keyLen, window) configuration co-locate? One row:
    * (n_truth, n_found, recall). Precision is structurally 1.0 (every
    * SNM pair is Jaccard-verified), asserted in the spec, so it is not
    * a column.
    */
  def recallAudit(df: DataFrame, textCol: String, idCol: String,
                  keyLen: Int, window: Int, n: Int, threshold: Double,
                  maxDocId: Long): DataFrame = {
    val bounded = df.filter(col(idCol) < maxDocId)
    val truth = Dedup.ngramJaccardPairs(df, textCol, idCol, n, threshold,
      maxDocId)
    val found = pairs(bounded, textCol, idCol, keyLen, window, n, threshold)
    val nT = truth.agg(count(lit(1)).as("n_truth"))
    val nF = found.agg(count(lit(1)).as("n_found"))
    nT.crossJoin(broadcast(nF))
      .select(col("n_truth"), col("n_found"),
        when(col("n_truth") === 0L, lit(null).cast("double"))
          .otherwise(round(col("n_found").cast("double")
            / col("n_truth").cast("double"), 6)).as("recall"))
  }

  /** DuckDB CTE chain for [[pairs]] over relation `rel`: declares
    * `${p}r` (ranked), `${p}s` (shingled+ranked) and `${p}c` (verified
    * pairs) — read `SELECT id_a, id_b, jaccard FROM ${p}c`.
    */
  def duckPairCtes(rel: String, textCol: String, idCol: String,
                   keyLen: Int, window: Int, n: Int, threshold: Double,
                   p: String = ""): String =
    s"""${p}r AS (SELECT $idCol AS id, $textCol AS txt,
       |            ROW_NUMBER() OVER (ORDER BY substr(lower($textCol), 1, $keyLen), $idCol) - 1 AS rnk
       |          FROM $rel),
       |${p}s AS (SELECT id, rnk, ${Dedup.duckShingleFps("txt", n)} AS sh
       |          FROM (SELECT *, ${graft.functions.TextAnalysis.duckTokensBind("txt")} AS w FROM ${p}r)),
       |${p}c AS (SELECT least(a.id, b.id) AS id_a, greatest(a.id, b.id) AS id_b,
       |            ${Dedup.duckJaccard("a.sh", "b.sh")} AS jaccard
       |          FROM ${p}s a JOIN ${p}s b
       |            ON b.rnk BETWEEN a.rnk + 1 AND a.rnk + ${window - 1}
       |          WHERE ${Dedup.duckJaccard("a.sh", "b.sh")} >= $threshold)""".stripMargin

  /** DuckDB oracle twin of [[pairs]]. */
  def duckPairs(tbl: String, textCol: String, idCol: String,
                keyLen: Int, window: Int, n: Int,
                threshold: Double): String =
    s"""WITH ${duckPairCtes(tbl, textCol, idCol, keyLen, window, n, threshold)}
       |SELECT id_a, id_b, jaccard FROM c""".stripMargin

  /** DuckDB oracle twin of [[recallAudit]]. */
  def duckRecallAudit(tbl: String, textCol: String, idCol: String,
                      keyLen: Int, window: Int, n: Int, threshold: Double,
                      maxDocId: Long): String =
    s"""WITH b AS (SELECT * FROM $tbl WHERE $idCol < $maxDocId),
       |${Dedup.duckPairCtes("b", textCol, idCol, n, "TRUE", "t")},
       |${duckPairCtes("b", textCol, idCol, keyLen, window, n, threshold, "f")},
       |nt AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM tp
       |       WHERE jaccard >= $threshold),
       |nf AS (SELECT CAST(count(*) AS BIGINT) AS n_found FROM fc)
       |SELECT n_truth, n_found,
       |       CASE WHEN n_truth <> 0
       |            THEN round(CAST(n_found AS DOUBLE) / CAST(n_truth AS DOUBLE), 6)
       |            END AS recall
       |FROM nt, nf""".stripMargin
}
