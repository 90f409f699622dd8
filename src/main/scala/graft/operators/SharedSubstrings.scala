package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT cross-document longest-shared-substring mining — the
  * suffix-sorting method that [[DupSpan]]'s gram-window signal
  * approximates (ExactSubstr, Lee et al. 2022): every suffix key
  * (capped at `cap` chars) is bucketed by its `prefixLen`-char prefix,
  * buckets sort internally, and adjacent suffixes from DIFFERENT
  * documents report their longest common prefix. Any substring of
  * length ≥ `prefixLen` shared across two docs puts both suffixes in
  * one bucket, and the max cross-doc LCP is always attained at a
  * doc-change boundary of the sorted order (for any non-adjacent pair,
  * walking between them crosses a doc change whose adjacent LCP is at
  * least as large) — so adjacent pairs suffice for exactness above the
  * prefix length.
  *
  * Scale shape: NO global sort — the only exchange is the prefix-bucket
  * key (suffix keys are `cap` bytes, so the shuffle is cap× the corpus,
  * the honest price of the exact method vs the gram approximation), and
  * each bucket sorts independently. A corpus-hot prefix (a boilerplate
  * stop-phrase) is the skew risk: buckets above `maxBucketSize` are
  * dropped with an observed metric, the [[Dedup]] LSH bucket-cap
  * posture.
  *
  * Output: top-`k` distinct shared spans by (length DESC, span ASC)
  * with the number of boundary pairs that exhibit them.
  *
  * Cost honesty (BASELINE.md rehearsals): r9 measured 12.8× at 10×
  * and blamed the per-bucket sort; the r10 stage profile showed ~80%
  * of wall-clock was actually the interpreted LCP fold (O(cap²) char
  * scans per boundary pair). With the native byte-walk LCP the 10×
  * rehearsal runs 91 → 12.3 s (1.7× over the 1× run, which is
  * job-overhead-bound) — n·log n with honest constants. At corpus
  * scale the screen-then-exact posture still applies: run
  * [[DupSpan.stats]] (join-free gram windows) as the cheap screen and
  * this exact miner over the flagged subset, the same routing the
  * prefix similarity join uses.
  */
object SharedSubstrings {

  /** Longest-common-prefix of two string columns — the native
    * byte-walk expression ([[org.apache.spark.sql.graft
    * .LongestCommonPrefix]], whole-stage codegen). The fold-based HOF
    * formulation below is kept as the parity reference
    * (NativeExprSpec proves them identical on real adjacent-suffix
    * pairs): the fold is interpreted AND each `substr(i, 1)` walks
    * from byte 0 to the i-th char boundary — O(cap²) char scans per
    * pair, which the r10 profile measured as ~80% of the whole
    * operator's wall-clock (the r9 "per-bucket sort" diagnosis was
    * wrong). Keys are pre-capped at `cap` chars, so no explicit cap is
    * needed on the native path.
    */
  private def lcpOf(a: Column, b: Column, cap: Int): Column =
    org.apache.spark.sql.graft.LongestCommonPrefix(a, b)

  /** Interpreted HOF reference for [[lcpOf]] — capped char-by-char fold
    * with an equal-key short-circuit; NativeExprSpec's parity twin.
    */
  private[graft] def lcpOfHof(a: Column, b: Column, cap: Int): Column =
    when(a === b, least(length(a), length(b)))
      .otherwise(aggregate(sequence(lit(1), lit(cap)), lit(0), (acc, i) =>
        when(acc === i - 1 && i <= length(a) && i <= length(b) &&
          a.substr(i, lit(1)) === b.substr(i, lit(1)), i).otherwise(acc)))

  def topShared(docs: DataFrame, textCol: String, idCol: String,
                minLen: Int = 16, cap: Int = 64, prefixLen: Int = 8,
                k: Int = 10, maxBucketSize: Int = 100000): DataFrame = {
    require(prefixLen <= minLen && minLen <= cap,
      "need prefixLen <= minLen <= cap")
    val text = col(textCol)
    val n = length(text)
    val sfx = Dedup.rebalance(docs)
      .filter(n >= minLen)
      .select(col(idCol).as("_id"), text.as("_t"),
        explode(sequence(lit(1), n - minLen + 1)).as("_pos"))
      .select(col("_id"), col("_pos"),
        col("_t").substr(col("_pos"), lit(cap)).as("_key"))
      .withColumn("_bkt", col("_key").substr(1, prefixLen))
    // skew guard: drop corpus-hot prefix buckets (observed metric).
    // The count window deliberately carries the LAG window's ordering
    // with an explicit whole-partition frame: same partition key + same
    // sort order means EnsureRequirements plans ONE sort serving both
    // Window operators (the filter in between preserves ordering)
    // instead of a bucket-only sort followed by a full re-sort.
    val wB = Window.partitionBy(col("_bkt"))
      .orderBy(col("_key").asc, col("_id").asc, col("_pos").asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val capped = sfx.withColumn("_bn", count(lit(1)).over(wB))
      .observe("graft.sharedsub_bucket_drops",
        sum(when(col("_bn") > maxBucketSize, 1L).otherwise(0L)).as("dropped_rows"))
      .filter(col("_bn") <= maxBucketSize)
    val w = Window.partitionBy(col("_bkt"))
      .orderBy(col("_key").asc, col("_id").asc, col("_pos").asc)
    val adj = capped
      .withColumn("_pkey", lag(col("_key"), 1).over(w))
      .withColumn("_pid", lag(col("_id"), 1).over(w))
      .filter(col("_pid").isNotNull && col("_pid") =!= col("_id"))
      .withColumn("_lcp", lcpOf(col("_key"), col("_pkey"), cap))
      .filter(col("_lcp") >= minLen)
      .select(col("_key").substr(lit(1), col("_lcp")).as("span"))
    adj.groupBy(col("span"))
      .agg(count(lit(1)).as("n_pairs"))
      .select(col("span"), length(col("span")).cast("long").as("span_len"),
        col("n_pairs"))
      .orderBy(col("span_len").desc, col("span").asc)
      .limit(k)
  }

  /** SCREEN-THEN-EXACT shared-substring mining — the 100 TB posture the
    * operator docs prescribe, as code: the join-free [[DupSpan.stats]]
    * word-gram screen flags documents with ANY cross-document shared
    * k-gram run, and the exact suffix miner runs over that subset only.
    * On real corpora the flagged fraction is small (boilerplate and
    * template carriers), so the suffix explosion — cap× the bytes, the
    * exact method's dominant cost — pays for flagged docs instead of
    * the whole corpus; the screen itself is one narrow projection plus
    * one gram-keyed exchange.
    *
    * SEMANTICS NOTE (why this is its OWN operator, not a faster
    * [[topShared]]): dropping unscreened docs changes sort adjacency,
    * so `n_pairs` counts can differ from the full-corpus miner (a
    * removed no-share doc can sit between two sharers), and the
    * word-gram screen bounds recall — a CHARACTER span of `minLen`
    * chars that never covers `screenGrams` consecutive WORDS is not
    * flagged. Pick `screenGrams` so k words ≲ minLen chars (the
    * default pairs k=3 words with minLen=16 chars). Both engines
    * compute the identical composition, so the gate stays exact.
    */
  def topSharedScreened(docs: DataFrame, textCol: String, idCol: String,
                        minLen: Int = 16, cap: Int = 64, prefixLen: Int = 8,
                        k: Int = 10, maxBucketSize: Int = 100000,
                        screenGrams: Int = 3): DataFrame = {
    val flagged = DupSpan.stats(docs, textCol, idCol, screenGrams)
      .select(col(idCol))
    topShared(docs.join(flagged, Seq(idCol), "left_semi"), textCol, idCol,
      minLen, cap, prefixLen, k, maxBucketSize)
  }

  /** DuckDB twin of [[topSharedScreened]] — [[duckTopShared]] over the
    * [[DupSpan.duckStats]]-flagged subset.
    */
  def duckTopSharedScreened(tbl: String, textCol: String, idCol: String,
                            minLen: Int = 16, cap: Int = 64, prefixLen: Int = 8,
                            k: Int = 10, maxBucketSize: Int = 100000,
                            screenGrams: Int = 3): String = {
    val screened =
      s"""(SELECT * FROM $tbl WHERE $idCol IN
         | (SELECT $idCol FROM (${DupSpan.duckStats(tbl, textCol, idCol, screenGrams)})))""".stripMargin
    duckTopShared(screened, textCol, idCol, minLen, cap, prefixLen, k, maxBucketSize)
  }

  /** Rows the prefix-bucket cap of [[topShared]] would drop at these
    * parameters — the cap's recall cost as a QUERYABLE one-row metric
    * (suffix rows in prefix buckets above `maxBucketSize`), for
    * [[Pipeline.capDropReport]] / the health report. Same suffix
    * derivation, no sort and no LCP — a bucket-count aggregate only.
    */
  def capDropCount(docs: DataFrame, textCol: String, idCol: String,
                   minLen: Int = 16, prefixLen: Int = 8,
                   maxBucketSize: Int = 100000): DataFrame = {
    val text = col(textCol)
    val n = length(text)
    Dedup.rebalance(docs)
      .filter(n >= minLen)
      .select(explode(sequence(lit(1), n - minLen + 1)).as("_pos"), text.as("_t"))
      .select(col("_t").substr(col("_pos"), lit(prefixLen)).as("_bkt"))
      .groupBy(col("_bkt")).agg(count(lit(1)).as("_bn"))
      .agg(coalesce(sum(when(col("_bn") > maxBucketSize, col("_bn"))
        .otherwise(0L)), lit(0L)).as("dropped_rows"),
        coalesce(sum(col("_bn")), lit(0L)).as("total_rows"))
  }

  /** DuckDB twin of [[capDropCount]] — the same bucket-size census. */
  def duckCapDropCount(tbl: String, textCol: String, idCol: String,
                       minLen: Int = 16, prefixLen: Int = 8,
                       maxBucketSize: Int = 100000): String =
    s"""SELECT coalesce(CAST(sum(CASE WHEN bn > $maxBucketSize THEN bn ELSE 0 END) AS BIGINT),
       |                CAST(0 AS BIGINT)) AS dropped_rows,
       |       coalesce(CAST(sum(bn) AS BIGINT), CAST(0 AS BIGINT)) AS total_rows
       |FROM (SELECT count(*) AS bn
       |      FROM (SELECT $textCol[i : i + ${prefixLen - 1}] AS bkt
       |            FROM (SELECT $textCol,
       |                         unnest(range(1, length($textCol) - $minLen + 2)) AS i
       |                  FROM $tbl WHERE length($textCol) >= $minLen))
       |      GROUP BY bkt)""".stripMargin

  /** DuckDB oracle twin — identical suffix keys, bucket cap, total
    * order, LCP fold, and top-k tie-break.
    */
  def duckTopShared(tbl: String, textCol: String, idCol: String,
                    minLen: Int = 16, cap: Int = 64, prefixLen: Int = 8,
                    k: Int = 10, maxBucketSize: Int = 100000): String =
    s"""WITH sfx AS (
       |  SELECT $idCol AS id, i AS pos,
       |         $textCol[i : i + ${cap - 1}] AS key,
       |         $textCol[i : i + ${prefixLen - 1}] AS bkt
       |  FROM (SELECT $idCol, $textCol,
       |               unnest(range(1, length($textCol) - $minLen + 2)) AS i
       |        FROM $tbl WHERE length($textCol) >= $minLen)),
       |capped AS (
       |  SELECT * FROM (
       |    SELECT *, count(*) OVER (PARTITION BY bkt) AS bn FROM sfx)
       |  WHERE bn <= $maxBucketSize),
       |o AS (
       |  SELECT id, key,
       |         lag(key) OVER w AS pkey, lag(id) OVER w AS pid
       |  FROM capped
       |  WINDOW w AS (PARTITION BY bkt ORDER BY key ASC, id ASC, pos ASC)),
       |l AS (
       |  SELECT key, list_reduce(list_prepend(0, range(1, ${cap + 1})),
       |           (acc, i) -> CASE WHEN acc = i - 1 AND i <= length(key)
       |                                 AND i <= length(pkey)
       |                                 AND key[i:i] = pkey[i:i]
       |                            THEN i ELSE acc END) AS lcp
       |  FROM o WHERE pid IS NOT NULL AND pid <> id),
       |s AS (SELECT key[1:lcp] AS span FROM l WHERE lcp >= $minLen)
       |SELECT span, CAST(length(span) AS BIGINT) AS span_len,
       |       CAST(count(*) AS BIGINT) AS n_pairs
       |FROM s GROUP BY span
       |ORDER BY span_len DESC, span ASC LIMIT $k""".stripMargin
}
