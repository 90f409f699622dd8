package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.functions.TextAnalysis.{FpBase, FpMod}

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03
  * — the MOSS algorithm): hash every word k-gram, slide a window of
  * `w` consecutive k-gram hashes, and keep the MINIMUM hash of each
  * window. The selected set is position-robust — any shared substring
  * of at least w+k-1 words is guaranteed to contribute at least one
  * common fingerprint — at an expected density of 2/(w+1), so ~97% of
  * the gram stream is discarded before anything shuffles.
  *
  * Complements the existing near-dup stack: MinHash/SimHash estimate
  * WHOLE-document similarity; winnowing localizes SHARED PASSAGES
  * (plagiarism / quotation / template detection) and needs no banding.
  *
  * Scale shape: hashing and window-min selection are narrow per-row
  * HOFs (no explode until selection shrinks the stream 2/(w+1)-fold);
  * the only exchanges are the fingerprint distinct and the
  * fingerprint-keyed equi-join, and hot boilerplate fingerprints are
  * dropped by a document-frequency cap BEFORE the join (same skew
  * posture as the LSH bucket cap), so no key fans out more than
  * cap² pair rows.
  */
object Winnow {

  /** Rabin–Karp left fold over a BIGINT array: ((0·B+x₁)·B+x₂…) mod P.
    * acc < P and B = 31 keep `acc·B + x` < 2³⁵ — no ANSI overflow.
    */
  private[operators] def rkFold(arr: Column): Column =
    aggregate(arr, lit(0L), (acc, x) => (acc * FpBase + x) % FpMod)

  private[operators] def emptyLongs: Column = array().cast("array<bigint>")

  /** Per-word RK hashes of `textCol`'s token stream. */
  private[operators] def wordHashes(textCol: String): Column =
    transform(TextAnalysis.tokens(col(textCol)),
      word => TextAnalysis.fingerprint(word))

  /** Word k-gram hashes over the pre-bound `_wh` word-hash array. */
  private[operators] def gramHashes(k: Int): Column =
    when(size(col("_wh")) < k, emptyLongs)
      .otherwise(transform(sequence(lit(1), size(col("_wh")) - (k - 1)),
        i => rkFold(slice(col("_wh"), i, lit(k)))))

  /** DuckDB CTEs binding `w` (tokens), `wh` (word hashes), `gh` (k-gram
    * hashes) for `tbl` — the SQL twin of [[wordHashes]]/[[gramHashes]],
    * shared by every gram-hash-based oracle.
    */
  private[operators] def duckGramCtes(tbl: String, textCol: String,
                                      idCol: String, k: Int): String =
    s"""d AS (SELECT $idCol, ${TextAnalysis.duckTokensBind(textCol)} AS w FROM $tbl),
       |wh AS (SELECT $idCol, list_transform(w, word ->
       |         list_reduce(list_prepend(CAST(0 AS BIGINT),
       |           list_transform(list_filter(string_split(word, ''), c -> c <> ''),
       |                          c -> CAST(ascii(c) AS BIGINT))),
       |           (acc, ch) -> (acc * $FpBase + ch) % $FpMod)) AS wh FROM d),
       |gh AS (SELECT $idCol, CASE WHEN len(wh) < $k THEN CAST([] AS BIGINT[]) ELSE
       |         list_transform(range(1, len(wh)-$k+2), i ->
       |           list_reduce(list_prepend(CAST(0 AS BIGINT), wh[i:i+$k-1]),
       |             (acc, x) -> (acc * $FpBase + x) % $FpMod)) END AS gh FROM wh)""".stripMargin

  /** Winnowed fingerprint rows: (idCol, f), distinct per document.
    *
    * Documents shorter than k words select nothing; documents with
    * fewer than `w` k-grams collapse to one whole-document window
    * (the paper's boundary rule).
    */
  def fingerprints(docs: DataFrame, textCol: String, idCol: String,
                   k: Int, w: Int): DataFrame = {
    val selected = when(size(col("_gh")) === 0, emptyLongs)
      .when(size(col("_gh")) <= w, array(array_min(col("_gh"))))
      .otherwise(transform(sequence(lit(1), size(col("_gh")) - (w - 1)),
        i => array_min(slice(col("_gh"), i, lit(w)))))
    Dedup.rebalance(docs)
      .withColumn("_wh", wordHashes(textCol))
      .withColumn("_gh", gramHashes(k))
      .select(col(idCol), explode(selected).as("f"))
      .distinct()
  }

  /** Shared-passage pairs: documents with ≥ `minCommon` common winnowed
    * fingerprints, after dropping fingerprints present in more than
    * `maxDocFreq` documents (corpus boilerplate — they would both
    * drown the signal and fan the pairing out quadratically).
    *
    * No self-join: ONE exchange on the fingerprint key builds the
    * per-fingerprint doc set (`collect_set` both deduplicates the
    * per-doc selection AND counts document frequency), the ≤ cap²/2
    * pair expansion is a narrow HOF over the sorted set, and the only
    * other exchange is the final pair-count aggregate. A self-join
    * formulation would shuffle the fingerprint relation twice more and
    * rely on exchange reuse to claw one back.
    *
    * Output: (id_a, id_b, n_common), id_a < id_b.
    */
  def overlapPairs(docs: DataFrame, textCol: String, idCol: String,
                   k: Int, w: Int, maxDocFreq: Int, minCommon: Int): DataFrame = {
    val selected = when(size(col("_gh")) === 0, emptyLongs)
      .when(size(col("_gh")) <= w, array(array_min(col("_gh"))))
      .otherwise(transform(sequence(lit(1), size(col("_gh")) - (w - 1)),
        i => array_min(slice(col("_gh"), i, lit(w)))))
    val byFingerprint = Dedup.rebalance(docs)
      .withColumn("_wh", wordHashes(textCol))
      .withColumn("_gh", gramHashes(k))
      .select(col(idCol), explode(selected).as("f"))
      .groupBy(col("f"))
      .agg(sort_array(collect_set(col(idCol))).as("_ids"))
      .filter(size(col("_ids")).between(2, maxDocFreq))
    val n = size(col("_ids"))
    val pairs = flatten(transform(sequence(lit(0), n - 2), a =>
      transform(sequence(a + 1, n - 1), b =>
        struct(element_at(col("_ids"), a + 1).as("id_a"),
               element_at(col("_ids"), b + 1).as("id_b")))))
    byFingerprint
      .select(explode(pairs).as("_p"))
      .groupBy(col("_p.id_a"), col("_p.id_b"))
      .agg(count(lit(1)).as("n_common"))
      .filter(col("n_common") >= minCommon)
  }

  // --------------------------------------------------- DuckDB oracle SQL

  /** DuckDB mirror of [[overlapPairs]] — same word/gram hashing
    * (TextAnalysis.duckFingerprint fold), window-min selection,
    * doc-frequency cap, and pair threshold.
    */
  def duckOverlapPairs(tbl: String, textCol: String, idCol: String,
                       k: Int, w: Int, maxDocFreq: Int, minCommon: Int): String =
    s"""WITH ${duckGramCtes(tbl, textCol, idCol, k)},
       |fp AS (SELECT DISTINCT $idCol, unnest(
       |         CASE WHEN len(gh) = 0 THEN CAST([] AS BIGINT[])
       |              WHEN len(gh) <= $w THEN [list_min(gh)]
       |              ELSE list_transform(range(1, len(gh)-$w+2), i -> list_min(gh[i:i+$w-1])) END) AS f
       |       FROM gh),
       |kept AS (SELECT * FROM (SELECT *, count(*) OVER (PARTITION BY f) AS df FROM fp)
       |         WHERE df <= $maxDocFreq)
       |SELECT a.$idCol AS id_a, b.$idCol AS id_b, count(*) AS n_common
       |FROM kept a JOIN kept b USING (f)
       |WHERE a.$idCol < b.$idCol
       |GROUP BY 1, 2 HAVING count(*) >= $minCommon""".stripMargin
}
