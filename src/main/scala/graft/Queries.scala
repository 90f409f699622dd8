package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.Files

import graft.functions.{Embeddings, QualityFilters, Redaction, TextAnalysis}
import graft.operators.{AsofJoin, Attribution, BloomPrune, Bm25, Bpe, ChangeLog, ContentChunks, ChunkDedup, Collocations, Curriculum, Decontaminate, Dedup, Dsir, Entropy, Eval, EventStats, Features, Funnel, Hybrid, Hypothesis, Idf, KCore, LabelProp, LinkPred, MarketBasket, Mmr, Outliers, PageRank, Multimodal, Novelty, Packing, Perplexity, Phrase, Pipeline, Pq, Profile, RangeJoin, Retention, Rfm, Rolling, RowHash, SemDedup, Sessionize, SharedSubstrings, Similarity, SortedNeighborhood, Sketches, SkewJoin, Drift, DupSpan, Pca, Splits, Survival, Sync, SyncMode, TfidfSim, Triangles, Winnow, Zipf}
import graft.sinks.{FileSink, SinkSpec}
import graft.sources.SqlSource
import graft.streaming.StreamSync

/** Named query registry — one entry per implemented operator (SURVEY §2),
  * each paired (when SQL-expressible) with a DuckDB oracle over the same
  * parquet tables. [[SparkEntry]] exposes these to the driver.
  *
  * Conventions for oracle hash-parity (driver sorts columns by name, then
  * hashes values):
  *   - every computed column is aliased identically in Spark and SQL;
  *   - rankings always carry an explicit tie-breaker (the reference's bare
  *     `ORDER BY t DESC` is nondeterministic on ties);
  *   - money aggregates run in DECIMAL (exact) and are emitted as DOUBLE,
  *     so Spark's partial-agg summation order can't perturb low bits.
  */
object Queries {

  final case class Entry(
      name: String,
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // Fixed deterministic sync parameters (l_shipdate spans 1995‥2001,
  // events.ts spans Jan 2024).
  private val CutoffMs = 883612800000L       // 1998-01-01T00:00:00Z
  private val NowMs = 1009843200000L         // 2002-01-01T00:00:00Z
  private val DelayMs = 180L * 24 * 3600 * 1000
  private val EvCutoffMs = 1704844800000L    // 2024-01-10T00:00:00Z
  private val EvEndMs = 1705708800000L       // 2024-01-20T00:00:00Z

  /** DuckDB-side events relation: ts is TIMESTAMP_NS in the raw parquet —
    * truncate to µs to match Spark's read (see [[Tables.load]]).
    */
  private val EvOracle =
    "(SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events)"

  /** Target per-language sampling rates (hundredths) for the mixture
    * audit — English downweighted, the rest kept or lightly trimmed.
    * (Declared BEFORE `all`: object vals initialize in order.)
    */
  private val MixtureRates: Seq[(String, Int)] =
    Seq("en" -> 50, "es" -> 80, "zh" -> 25)

  /** Fixed BM25 query terms (lowercase, matching the corpus vocab with
    * distinct document frequencies) and the pivot's literal type list —
    * `error` is deliberately EXCLUDED to exercise the listed-types-only
    * `total` semantic.
    */
  private val BmTerms = Seq("spark", "hash", "window")

  /** Per-JVM artifact cache for the *_saved gates. The production
    * posture those gates measure is build/train ONCE offline, query
    * many times — so the artifact is built on first use and reused
    * for the rest of the JVM (Bench's min-of-2 then reads the second,
    * query-side-only cost; Verify builds once and correctness is
    * unaffected). Keyed by (artifact, sfDir) so mixed-SF sessions
    * never cross-read.
    */
  private val artifactCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def artifactDir(key: String)(build: String => Unit): String =
    artifactCache.computeIfAbsent(key, _ => {
      val dir = TempDirs.create("graft-artifact").toString
      build(dir)
      dir
    })

  /** Full-log SCD2 rebuild — the shared oracle for every SCD2 face
    * (batch build, incremental apply, streaming maintenance): however
    * the history is produced, it must equal replaying the whole log.
    */
  private val Scd2RebuildSql: String =
    s"""WITH st AS (
                 SELECT user_id, event_id, event_type,
                        CASE WHEN event_id % 10 < 6 THEN 'insert'
                             WHEN event_id % 10 < 8 THEN 'update_postimage'
                             WHEN event_id % 10 < 9 THEN 'update_preimage'
                             ELSE 'delete' END AS ct,
                        epoch_us(CAST(ts AS TIMESTAMP)) // 1000 AS valid_from_ms
                 FROM ${EvOracle} e),
               s2 AS (SELECT * FROM st WHERE ct <> 'update_preimage'),
               v AS (SELECT user_id, event_id, event_type, ct, valid_from_ms,
                            lead(valid_from_ms) OVER w AS valid_to_ms,
                            row_number() OVER w AS version
                     FROM s2
                     WINDOW w AS (PARTITION BY user_id
                                  ORDER BY valid_from_ms, event_id))
               SELECT user_id, event_id, event_type, valid_from_ms,
                      valid_to_ms, version,
                      CASE WHEN valid_to_ms IS NULL THEN 1 ELSE 0 END AS is_current
               FROM v WHERE ct <> 'delete'"""

  private val PivotTypes = Seq("click", "view", "purchase", "signup")

  val all: Seq[Entry] = Seq(

    // S1 + F1 + P1 — full sync with non-nullable filter (export.py:168–173)
    Entry("q_full",
      (s, d) => Sync.plan(t(s, d, "lineitem"), SyncMode.Full, Seq("l_returnflag")),
      Some("SELECT * FROM lineitem WHERE l_returnflag IS NOT NULL AND l_returnflag != ''")),

    // F2 + F3 — time-based sync with watermark + late-data bound
    // (export.py:159–167); unix_timestamp is second-precision in both.
    Entry("q_time_based",
      (s, d) => Sync.plan(t(s, d, "lineitem"),
        SyncMode.TimeBased("l_shipdate", CutoffMs, DelayMs, NowMs), Seq("l_returnflag")),
      Some(s"""SELECT * FROM lineitem
               WHERE CAST(floor(epoch(l_shipdate)) AS BIGINT)*1000 >= $CutoffMs
                 AND l_returnflag IS NOT NULL AND l_returnflag != ''
                 AND CAST(floor(epoch(l_shipdate)) AS BIGINT)*1000 <= ${NowMs - DelayMs}""")),

    // W1 + F5 + O3 — scd-latest: latest order per customer (export.py:174–188).
    // row_num (constantly 1) stays in the schema, as the reference exports it.
    Entry("q_scd_latest",
      (s, d) => Sync.plan(t(s, d, "orders"),
        SyncMode.ScdLatest("o_custkey", "o_orderdate", keepRank = true,
          tieBreakers = Seq("o_orderkey")))
        // row_number() is IntegerType in Spark, BIGINT in DuckDB — align
        // the verify schema without changing engine semantics.
        .withColumn("row_num", col("row_num").cast("long")),
      Some("""SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY o_custkey
                  ORDER BY o_orderdate DESC, o_orderkey DESC) AS row_num
                FROM orders) RankedRows
              WHERE row_num = 1""")),

    // SURVEY §4.3 — scale rewrite of scd-latest: max_by over a struct
    // (partial+final SortAggregate with map-side collapse) instead of
    // Sort+WindowGroupLimit+Exchange+Window. Same rows.
    Entry("q_scd_latest_maxby",
      (s, d) => Sync.latestByGroup(t(s, d, "orders"), "o_custkey",
        struct(col("o_orderdate"), col("o_orderkey"))),
      Some("""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                     o_orderdate, o_orderpriority
              FROM (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY o_custkey
                  ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
                FROM orders) x
              WHERE rn = 1""")),

    // W1 over the event stream: latest event per user, rank dropped.
    Entry("q_scd_latest_events",
      (s, d) => Sync.plan(t(s, d, "events"),
        SyncMode.ScdLatest("user_id", "ts", keepRank = false,
          tieBreakers = Seq("event_id"))),
      Some(s"""SELECT event_id, ts, user_id, event_type, value, props FROM (
                 SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
                 FROM $EvOracle e) x
               WHERE rn = 1""")),

    // F2 on the event stream: watermark lower bound only.
    Entry("q_time_based_events",
      (s, d) => Sync.plan(t(s, d, "events"),
        SyncMode.TimeBased("ts", EvCutoffMs)),
      Some(s"""SELECT * FROM $EvOracle e
               WHERE CAST(floor(epoch(ts)) AS BIGINT)*1000 >= $EvCutoffMs""")),

    // S2 — CDC first sync: snapshot-as-of latest commit over the change
    // log (export.py:112–114), all rows tagged INSERT. The log is
    // synthesized deterministically from events (ChangeLog.synthesize):
    // event_id%10 → 0‥5 insert, 6‥7 update_postimage, 8 update_preimage,
    // 9 delete; so the folded snapshot keeps event_id%10 < 8.
    Entry("q_cdc_first_sync",
      (s, d) => {
        val log = ChangeLog.synthesize(t(s, d, "events"), "event_id", "ts")
        ChangeLog.snapshotAsOf(log, Seq("event_id"), ChangeLog.latestCommitMs(log))
      },
      Some(s"""SELECT 'INSERT' AS _mp_change_type, event_id, ts, user_id,
                      event_type, value, props
               FROM $EvOracle e WHERE event_id % 10 < 8""")),

    // S3 + F4 + P3 — CDC incremental: table_changes in (cutoff, end] with
    // the reference's CASE mapping (export.py:115–128); +1 ms exclusive
    // start.
    Entry("q_cdc_incremental",
      (s, d) => {
        val log = ChangeLog.synthesize(t(s, d, "events"), "event_id", "ts")
        ChangeLog.tableChanges(log, EvCutoffMs + 1, EvEndMs)
      },
      Some(s"""SELECT CASE
                 WHEN _change_type = 'update_postimage' THEN 'INSERT'
                 WHEN _change_type = 'update_preimage' THEN 'DELETE'
                 WHEN _change_type = 'insert' THEN 'INSERT'
                 ELSE 'DELETE' END AS _mp_change_type,
                 event_id, ts, user_id, event_type, value, props,
                 _change_type, _commit_timestamp
               FROM (SELECT e.*,
                       CASE WHEN event_id % 10 < 6 THEN 'insert'
                            WHEN event_id % 10 < 8 THEN 'update_postimage'
                            WHEN event_id % 10 < 9 THEN 'update_preimage'
                            ELSE 'delete' END AS _change_type,
                       ts AS _commit_timestamp
                     FROM $EvOracle e) log
               WHERE epoch_us(_commit_timestamp) // 1000 >= ${EvCutoffMs + 1}
                 AND epoch_us(_commit_timestamp) // 1000 <= $EvEndMs""")),

    // S4 + O1 — DESCRIBE HISTORY LIMIT 1 → latest commit ms
    // (export.py:49–60). Millisecond precision (Delta commit timestamps
    // are ms; see ChangeLog.commitMs).
    // SCD Type-2 history: fold the change log into per-key version
    // intervals (valid_to NULL = current; deletes close without opening).
    // Keyed on user_id so version chains are real (many events per user).
    Entry("q_scd2_history",
      (s, d) => {
        val log = ChangeLog.synthesize(t(s, d, "events"), "event_id", "ts")
        ChangeLog.scd2History(log, Seq("user_id"), "event_id", Seq("event_type"))
      },
      Some(Scd2RebuildSql)),

    // INCREMENTAL SCD2 maintenance gate: build the tombstone-bearing
    // state from the first half of the log (split at the median commit),
    // splice the second half in with scd2Apply (touched keys only are
    // rewritten), and present. The oracle is q_scd2_history's FULL
    // REBUILD SQL — incremental must equal replay bit-for-bit, for any
    // split (the split point deliberately comes from a quantile probe,
    // not a constant).
    Entry("q_scd2_incremental",
      (s, d) => {
        val log = ChangeLog.synthesize(t(s, d, "events"), "event_id", "ts")
          .withColumn("_ms", expr(s"unix_micros(`${ChangeLog.CommitTs}`) div 1000"))
        val splitMs = log.stat.approxQuantile("_ms", Array(0.5), 0.01).head.toLong
        val state = ChangeLog.scd2State(log.filter(col("_ms") <= splitMs),
          Seq("user_id"), "event_id", Seq("event_type"))
        val applied = ChangeLog.scd2Apply(state, log.filter(col("_ms") > splitMs),
          Seq("user_id"), "event_id", Seq("event_type"))
        ChangeLog.scd2Present(applied)
      },
      Some(Scd2RebuildSql)),

    // STREAMING SCD2 maintenance gate: the same dimension maintained
    // through a real foreachBatch streaming query — the change log
    // arrives in three chronological micro-batches, each spliced into
    // the parquet state with scd2Apply behind a staged swap. Oracle =
    // the full-log rebuild again: batch boundaries must be invisible.
    Entry("q_stream_scd2",
      (s, d) => StreamSync.replayScd2(
        ChangeLog.synthesize(t(s, d, "events"), "event_id", "ts"),
        "user_id", "event_id", "event_type", nBatches = 3),
      Some(Scd2RebuildSql)),

    // SNAPSHOT DIFF — infer a change feed from two table states when NO
    // change log exists (the complement of the CDF emulation): one
    // full-outer key join, a narrow 0/1/2-row explode per key, Delta
    // _change_type vocabulary out. Old/new snapshots derived
    // deterministically from orders so all three change classes occur.
    Entry("q_snapshot_diff",
      (s, d) => {
        val o = t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice").cast("double").as("o_totalprice"))
        val oldSnap = o.filter(col("o_orderkey") % 7 =!= 0)
        val newSnap = o.filter(col("o_orderkey") % 5 =!= 0)
          .withColumn("o_totalprice",
            when(col("o_orderkey") % 3 === 0, col("o_totalprice") * 2)
              .otherwise(col("o_totalprice")))
        ChangeLog.inferChanges(oldSnap, newSnap, Seq("o_orderkey"))
      },
      Some("""WITH os AS (SELECT o_orderkey AS k, o_custkey AS c,
             |                   CAST(o_totalprice AS DOUBLE) AS p
             |            FROM orders WHERE o_orderkey % 7 <> 0),
             |ns AS (SELECT o_orderkey AS k, o_custkey AS c,
             |              CASE WHEN o_orderkey % 3 = 0
             |                   THEN CAST(o_totalprice AS DOUBLE) * 2
             |                   ELSE CAST(o_totalprice AS DOUBLE) END AS p
             |       FROM orders WHERE o_orderkey % 5 <> 0),
             |j AS (SELECT COALESCE(os.k, ns.k) AS k,
             |             os.k IS NOT NULL AS ino, ns.k IS NOT NULL AS inn,
             |             os.c AS oc, os.p AS op, ns.c AS nc, ns.p AS np,
             |             NOT (os.c IS NOT DISTINCT FROM ns.c
             |                  AND os.p IS NOT DISTINCT FROM ns.p) AS diff
             |      FROM os FULL JOIN ns ON os.k = ns.k)
             |SELECT k AS o_orderkey, oc AS o_custkey, op AS o_totalprice,
             |       'delete' AS _change_type FROM j WHERE ino AND NOT inn
             |UNION ALL SELECT k, nc, np, 'insert' FROM j WHERE inn AND NOT ino
             |UNION ALL SELECT k, oc, op, 'update_preimage' FROM j
             |          WHERE ino AND inn AND diff
             |UNION ALL SELECT k, nc, np, 'update_postimage' FROM j
             |          WHERE ino AND inn AND diff""".stripMargin)),

    // MERGE INTO maintenance gate: the materialized per-key snapshot
    // maintained incrementally — tombstone-bearing state from the first
    // half of the log, cdcMergeApply splices the second half (touched
    // keys re-folded, untouched pass through), present. Oracle = the
    // full-log latest-event-per-key fold with the same (ms, event_id)
    // comparator; deletes remove the key.
    Entry("q_cdc_merge",
      (s, d) => {
        val log = ChangeLog.synthesize(t(s, d, "events"), "event_id", "ts")
          .withColumn("_ms", expr(s"unix_micros(`${ChangeLog.CommitTs}`) div 1000"))
        val splitMs = log.stat.approxQuantile("_ms", Array(0.5), 0.01).head.toLong
        val state = ChangeLog.cdcMergeState(
          log.filter(col("_ms") <= splitMs).drop("_ms"), Seq("user_id"), "event_id")
        val applied = ChangeLog.cdcMergeApply(state,
          log.filter(col("_ms") > splitMs).drop("_ms"), Seq("user_id"), "event_id")
        ChangeLog.cdcMergePresent(applied)
      },
      Some(s"""WITH b AS (
                 SELECT e.*,
                        CASE WHEN event_id % 10 < 6 THEN 'insert'
                             WHEN event_id % 10 < 8 THEN 'update_postimage'
                             WHEN event_id % 10 < 9 THEN 'update_preimage'
                             ELSE 'delete' END AS ct,
                        epoch_us(CAST(ts AS TIMESTAMP)) // 1000 AS ms
                 FROM $EvOracle e),
               nb AS (SELECT * FROM b WHERE ct <> 'update_preimage'),
               r AS (SELECT *, row_number() OVER (PARTITION BY user_id
                       ORDER BY ms DESC, event_id DESC) AS rn FROM nb)
               SELECT 'INSERT' AS _mp_change_type, event_id, ts, user_id,
                      event_type, value, props
               FROM r WHERE rn = 1 AND ct <> 'delete'""")),

    // S4 + O1 — DESCRIBE HISTORY LIMIT 1 emulated as max commit ms
    // over the change log (export.py:49-60); ms-precise (ChangeLog
    // .commitMs), one max aggregate, no sort.
    Entry("q_commit_history",
      (s, d) => {
        val log = ChangeLog.synthesize(t(s, d, "events"), "event_id", "ts")
        log.agg(expr(s"unix_micros(max(`${ChangeLog.CommitTs}`)) div 1000")
          .as("latest_commit_ms"))
      },
      Some("""SELECT epoch_us(CAST(max(ts) AS TIMESTAMP)) // 1000
                     AS latest_commit_ms FROM events""")),

    // A1 — ungrouped count(*), the row-count guard's probe (export.py:38).
    Entry("q_rowcount",
      (s, d) => t(s, d, "lineitem").agg(count(lit(1)).as("row_count")),
      Some("SELECT count(*) AS row_count FROM lineitem")),

    // P4 + P5 driver gate — the computed hash column (export.py:204–214):
    // md5(to_json(struct(<name-sorted non-ignored cols>))). DuckDB has no
    // Spark-compatible to_json, so the oracle renders the SAME canonical
    // JSON by string concat: name-sorted keys, no whitespace, and the
    // ms-precision zone-suffix-free timestamp render of Spark's UTC
    // session (Engine.session sets spark.sql.session.timeZone=UTC;
    // Spark 4's JSON writer emits `yyyy-MM-dd'T'HH:mm:ss.SSS`). For
    // the long/string/timestamp columns used here the two renders are
    // byte-identical, so the md5 values gate the real to_json path — any
    // formatting drift flips every hash. o_totalprice (double) goes
    // through the P5 ignore set: float-to-text differs across engines,
    // and ignore-columns is exactly the reference's mechanism for
    // excluding volatile columns (orders has no nulls, so to_json's
    // null-field omission — spec-gated in RowHashSpec — never fires).
    Entry("q_row_hash",
      (s, d) => RowHash.withHashColumn(t(s, d, "orders"), "row_hash",
          ignoreColumns = Set("o_totalprice"))
        .select("o_orderkey", "row_hash"),
      Some("""SELECT o_orderkey,
             |  md5('{"o_custkey":' || o_custkey ||
             |      ',"o_orderdate":"' || strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S.%g') ||
             |      '","o_orderkey":' || o_orderkey ||
             |      ',"o_orderpriority":"' || o_orderpriority ||
             |      '","o_orderstatus":"' || o_orderstatus ||
             |      '"}') AS row_hash
             |FROM orders""".stripMargin)),

    // The FLAGSHIP composition (SparkEntry.entry), driver-gated: scan →
    // scd-latest window (keepRank) → non-null filter → computed hash —
    // the reference's full composed slice, previously smoke-checked
    // rows>0 only. Same deterministic-JSON oracle technique as
    // q_row_hash; events.ts has sub-ms components, which BOTH renders
    // truncate to ms identically (Spark's SSS formatter, DuckDB's %g),
    // and the props JSON-in-a-string column exercises to_json's quote
    // escaping. Unlike orders' NTZ o_orderdate (parquet ms timestamp
    // without isAdjustedToUTC → no zone suffix), events.ts loads as an
    // instant (LTZ) and Spark renders it WITH the 'Z' suffix at the UTC
    // session — the oracle appends it. `value` (double) rides through
    // the P5 ignore set —
    // float text rendering differs across engines (the flagship proper
    // hashes it; this gate proves every other moving part).
    Entry("q_entry_flagship",
      (s, d) => {
        val latest = Sync.plan(t(s, d, "events"),
          SyncMode.ScdLatest("user_id", "ts", keepRank = true,
            tieBreakers = Seq("event_id")))
        RowHash.withHashColumn(latest.filter(col("user_id").isNotNull),
          hashCol = "computed_hash", ignoreColumns = Set("value"))
      },
      Some(s"""SELECT event_id, ts, user_id, event_type, value, props,
             |       CAST(row_num AS INTEGER) AS row_num,
             |       md5('{"event_id":' || event_id ||
             |           ',"event_type":"' || event_type ||
             |           '","props":"' || replace(props, '"', '\\"') ||
             |           '","row_num":' || row_num ||
             |           ',"ts":"' || strftime(ts, '%Y-%m-%dT%H:%M:%S.%g') ||
             |           'Z","user_id":' || user_id || '}') AS computed_hash
             |FROM (SELECT *, ROW_NUMBER() OVER (
             |        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS row_num
             |      FROM $EvOracle e WHERE user_id IS NOT NULL) x
             |WHERE row_num = 1""".stripMargin)),

    // S6 + S7 — file-loaded custom SQL with Spark 4 named parameters
    // (export.py:70–100, 203): write the recurring_query.sql under the
    // workspace-style path, load it, run with :start/:end_timestamp.
    Entry("q_custom_sql",
      (s, d) => {
        Tables.registerAll(s, d)
        val p = SqlSource.queryPath("target/custom-sql", "proj", "cat", "sch",
          "orders", timeCutoffMs = CutoffMs - 1)
        Files.createDirectories(p.getParent)
        Files.writeString(p,
          """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
            |FROM orders
            |WHERE o_orderdate >= CAST(:start_timestamp AS TIMESTAMP)
            |  AND o_orderdate <= CAST(:end_timestamp AS TIMESTAMP)""".stripMargin)
        val (text, params) = SqlSource.load(p, CutoffMs - 1, NowMs)
        SqlSource.run(s, text, params)
      },
      Some(s"""SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
               FROM orders
               WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
                 AND o_orderdate <= TIMESTAMP '2002-01-01 00:00:00'""")),

    // Grouped aggregation (bench headliner; enters the engine through the
    // custom-SQL surface). Money math runs in DECIMAL (exact) and is
    // emitted as DOUBLE so partial-agg order can't perturb low bits.
    Entry("q_agg_pricing",
      (s, d) => t(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
          sum(col("l_extendedprice").cast("decimal(18,2)") *
              (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order")),
      Some("""SELECT l_returnflag, l_linestatus,
                     CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                     CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
                     CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                              (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
                     count(*) AS count_order
              FROM lineitem GROUP BY l_returnflag, l_linestatus""")),

    // Join surface: revenue per nation; the dimension side is explicitly
    // broadcast (at 100 TB the fact side shuffles on the join key, nation
    // never should).
    Entry("q_join_revenue",
      (s, d) => {
        val o = t(s, d, "orders"); val c = t(s, d, "customer"); val n = t(s, d, "nation")
        o.join(c, o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"),
               count(lit(1)).as("orders_cnt"))
      },
      Some("""SELECT n_name,
                     CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
                     count(*) AS orders_cnt
              FROM orders JOIN customer ON o_custkey = c_custkey
                          JOIN nation ON c_nationkey = n_nationkey
              GROUP BY n_name""")),

    // Global top-k (TakeOrderedAndProject — no full sort at scale).
    Entry("q_topk_orders",
      (s, d) => t(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10),
      Some("""SELECT * FROM orders
              ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""")),

    // Gap-based sessionization over the event stream (30-minute gap):
    // per-session rollups with one exchange shared by the lag window,
    // the running-sum window, and the final agg.
    Entry("q_sessionize",
      (s, d) => Sessionize.sessions(t(s, d, "events"),
        "user_id", "ts", "event_id", "value", gapMs = 30L * 60 * 1000),
      Some(Sessionize.duckSessions(EvOracle + " e",
        "user_id", "ts", "event_id", "value", gapMs = 30L * 60 * 1000))),

    // Ordered funnel: earliest view → click → purchase per user, step
    // conversion counts (the product-analytics companion to the event
    // exports).
    Entry("q_funnel",
      (s, d) => Funnel.stepCounts(t(s, d, "events"),
        "user_id", "ts", "event_type", Seq("view", "click", "purchase")),
      Some(Funnel.duckStepCounts3(EvOracle, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase")))),

    // Weekly cohort retention: users cohorted by first-event week,
    // counted per (cohort, week offset).
    Entry("q_retention",
      (s, d) => Retention.weeklyCohorts(t(s, d, "events"), "user_id", "ts"),
      Some(Retention.duckWeeklyCohorts(EvOracle, "user_id", "ts"))),

    // Corpus term frequency: explode whitespace tokens, top-20 terms by
    // total occurrences with lexicographic tie-break
    // (TakeOrderedAndProject — no global sort).
    Entry("q_term_freq",
      (s, d) => Dedup.rebalance(t(s, d, "documents"))
        .select(explode(TextAnalysis.tokens(col("text"))).as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("term").asc)
        .limit(20),
      Some(s"""SELECT term, count(*) AS n
               FROM (SELECT unnest(${TextAnalysis.duckTokensBind("text")}) AS term
                     FROM documents) x
               GROUP BY term ORDER BY n DESC, term ASC LIMIT 20""")),

    // ------------------------------------------------------------------
    // LLM-data-pipeline extensions (SURVEY §7.5) over documents /
    // embeddings. Oracle SQL is rendered from the same constants as the
    // Spark plans (TextAnalysis/Dedup/Similarity/Multimodal duck*
    // builders) so both engines execute the identical formula.
    // ------------------------------------------------------------------

    // Text analysis: whitespace + BPE-ish token counts, stopword count,
    // quality score — all built-in-function columns, no UDFs. (The
    // rebalance spreads the regex-heavy projection across cores; a
    // multi-split 100 TB scan skips it.)
    Entry("q_text_stats",
      (s, d) => Dedup.rebalance(t(s, d, "documents"))
        .withColumn("_w", TextAnalysis.tokens(col("text"))) // bind the split once
        .select(
          col("doc_id"),
          TextAnalysis.tokenCountOf(col("_w")).as("n_tokens"),
          TextAnalysis.bpeTokenCount(col("text")).as("n_bpe_tokens"),
          TextAnalysis.stopwordCountOf(col("_w")).as("n_stopwords"),
          TextAnalysis.qualityScoreOf(col("text"), col("_w")).as("quality")),
      Some(s"""SELECT doc_id,
                      ${TextAnalysis.duckTokenCount} AS n_tokens,
                      ${TextAnalysis.duckBpeTokenCount("text")} AS n_bpe_tokens,
                      ${TextAnalysis.duckStopwordCount} AS n_stopwords,
                      ${TextAnalysis.duckQualityScore("text")} AS quality
               FROM (SELECT *, ${TextAnalysis.duckTokensBind("text")} AS w
                     FROM documents) d""")),

    // Language-ID heuristic (marker-word scoring, deterministic
    // first-match tie-break) next to the labeled lang column.
    Entry("q_lang_id",
      (s, d) => Dedup.rebalance(t(s, d, "documents"))
        .withColumn("_w", TextAnalysis.tokens(col("text"))) // bind the split once
        .select(
          col("doc_id"), col("lang"),
          TextAnalysis.langIdOf(col("_w")).as("lang_pred"),
          TextAnalysis.langScoreOf(col("_w"), "en").as("score_en")),
      Some(s"""SELECT doc_id, lang,
                      ${TextAnalysis.duckLangId} AS lang_pred,
                      ${TextAnalysis.duckLangScore("en")} AS score_en
               FROM (SELECT *, ${TextAnalysis.duckTokensBind("text")} AS w
                     FROM documents) d""")),

    // Rolling-hash document fingerprint (Rabin–Karp left fold).
    Entry("q_fingerprint",
      (s, d) => Dedup.rebalance(t(s, d, "documents")).select(
        col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fingerprint")),
      Some(s"""SELECT doc_id, ${TextAnalysis.duckFingerprint("text")} AS fingerprint
               FROM documents""")),

    // Distributed BPE merge learning (tokenizer training): 6 merge
    // rounds over the word-TYPE table — statistics are vocabulary-sized
    // aggregates, the winning pair per round is 1 row of driver
    // metadata, and the merge application is a narrow HOF fold. HARD
    // oracle: all 6 rounds unrolled as CTE chains with the identical
    // left-fold render and (count DESC, pair ASC) tie-break.
    Entry("q_bpe_merges",
      (s, d) => Bpe.learnMerges(t(s, d, "documents"), "text",
        k = 6, maxWordLen = 20),
      Some(Bpe.duckLearnMerges("documents", "text", k = 6, maxWordLen = 20))),

    // EXACT longest-shared-substring mining (the suffix method DupSpan's
    // gram windows approximate): suffix keys capped at 64 chars, bucket
    // by 8-char prefix (no global sort — the only exchange), adjacent
    // cross-doc LCP at doc-change boundaries, top-10 distinct spans.
    Entry("q_shared_substrings",
      (s, d) => SharedSubstrings.topShared(t(s, d, "documents"), "text", "doc_id"),
      Some(SharedSubstrings.duckTopShared("documents", "text", "doc_id"))),

    // Screen-then-exact shared-substring mining — the 100 TB posture as
    // a first-class gate: the DupSpan word-gram screen flags the docs,
    // the exact suffix miner runs on the flagged subset only. Both
    // engines compute the identical composition (screen recall bounds
    // and adjacency semantics documented on the operator).
    Entry("q_shared_screened",
      (s, d) => SharedSubstrings.topSharedScreened(
        t(s, d, "documents"), "text", "doc_id"),
      Some(SharedSubstrings.duckTopSharedScreened("documents", "text", "doc_id"))),

    // Content-defined chunking (Rabin-boundary CDC): chunk breaks where
    // the rolling 8-char hash ≡ 0 (mod 32) — boundaries follow CONTENT,
    // so an inserted byte realigns after the first boundary instead of
    // shifting every chunk (spec-pinned). Narrow O(n·w) boundary work,
    // one chunk-key exchange for the cross-doc dup accounting.
    Entry("q_content_chunks",
      (s, d) => ContentChunks.stats(t(s, d, "documents"), "text", "doc_id",
        w = 8, divisor = 32),
      Some(ContentChunks.duckStats("documents", "text", "doc_id",
        w = 8, divisor = 32))),

    // Tokenize the corpus WITH its own learned merges: per-doc word and
    // BPE-token counts — the training-token budget question, and the
    // compression audit (n_bpe_tokens < chars). Merges apply to the
    // DISTINCT word-type table; the corpus pays one word-keyed join.
    Entry("q_bpe_tokenize",
      (s, d) => Bpe.tokenCounts(t(s, d, "documents"), "text", "doc_id",
        k = 6, maxWordLen = 20),
      Some(Bpe.duckTokenCounts("documents", "text", "doc_id",
        k = 6, maxWordLen = 20))),

    // Tokenizer FERTILITY per language (BPE tokens per word) — the
    // multilingual-equity metric: which languages pay more context
    // window per sentence under this tokenizer. Reuses the per-JVM
    // persisted merge artifact (the q_bpe_saved path), so the gate
    // measures the apply+aggregate cost only.
    Entry("q_fertility",
      (s, d) => {
        val dir = artifactDir(s"bpe|$d|k=6") { dir =>
          Bpe.saveMerges(
            Bpe.learnMerges(t(s, d, "documents"), "text", k = 6, maxWordLen = 20), dir)
        }
        Bpe.fertilityByGroup(t(s, d, "documents"), "text", "doc_id",
          "lang", Bpe.loadMerges(s, dir))
      },
      Some(Bpe.duckFertilityByGroup("documents", "text", "doc_id", "lang",
        k = 6, maxWordLen = 20))),

    // BPE tokenization from PERSISTED merges — the amortized tokenizer
    // path (learn once offline, tokenize every batch): merges learned
    // + saved once per JVM (artifactCache), then loaded from parquet
    // in rank order and applied. Same oracle as q_bpe_tokenize — the
    // disk round trip of the tokenizer artifact must be invisible.
    Entry("q_bpe_saved",
      (s, d) => {
        val dir = artifactDir(s"bpe|$d|k=6") { dir =>
          Bpe.saveMerges(
            Bpe.learnMerges(t(s, d, "documents"), "text", k = 6, maxWordLen = 20), dir)
        }
        Bpe.tokenCountsWithMerges(t(s, d, "documents"), "text", "doc_id",
          Bpe.loadMerges(s, dir))
      },
      Some(Bpe.duckTokenCounts("documents", "text", "doc_id",
        k = 6, maxWordLen = 20))),

    // Text canonicalization + canonical-form dup groups (the CCNet/Dolma
    // "fuzzy exact" tier): lowercase / punctuation→space / whitespace
    // collapse, then group by a rolling-hash fingerprint of the
    // canonical form — min-id keeps. The canonical render is narrow
    // codegen regex work; the grouping is ONE fingerprint-keyed window
    // exchange (no join-back), so the operator costs one shuffle of
    // (id, fp) regardless of corpus size.
    Entry("q_text_normalize",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val canon = Dedup.rebalance(t(s, d, "documents")).select(
            col("doc_id"),
            TextAnalysis.canonicalText(col("text")).as("_canon"))
          .select(col("doc_id"),
            TextAnalysis.fingerprint(col("_canon")).as("canon_fp"),
            TextAnalysis.tokenCount(col("_canon")).as("n_canon_tokens"))
        val w = Window.partitionBy(col("canon_fp"))
        canon
          .withColumn("group_size", count(lit(1)).over(w))
          .withColumn("keep",
            when(col("doc_id") === min(col("doc_id")).over(w), 1).otherwise(0))
      },
      Some {
        val canon = TextAnalysis.duckCanonicalText("text")
        s"""WITH c AS (SELECT doc_id, $canon AS canon FROM documents),
           |f AS (SELECT doc_id,
           |             ${TextAnalysis.duckFingerprint("canon")} AS canon_fp,
           |             CAST(len(${TextAnalysis.duckTokensBind("canon")}) AS BIGINT) AS n_canon_tokens
           |      FROM c)
           |SELECT doc_id, canon_fp, n_canon_tokens,
           |       count(*) OVER (PARTITION BY canon_fp) AS group_size,
           |       CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY canon_fp)
           |            THEN 1 ELSE 0 END AS keep
           |FROM f""".stripMargin
      }),

    // Exact dedup: one hash partial-agg on md5(text), min-id keeper.
    Entry("q_dedup_exact",
      (s, d) => Dedup.exact(t(s, d, "documents"), "text", "doc_id"),
      Some("""SELECT * FROM documents
              WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)""")),

    // SoftDeDup: keep every duplicate but split each exact-dup cluster's
    // sampling mass across its members (1/n and the tempered 1/√n) —
    // one partition-only count window on md5(text), no join-back.
    Entry("q_dedup_soft",
      (s, d) => Dedup.softWeights(t(s, d, "documents"), "text", "doc_id"),
      Some(Dedup.duckSoftWeights("documents", "text", "doc_id"))),

    // Ground-truth near-dup pairs: exact word-3-gram Jaccard ≥ 0.5,
    // bounded to doc_id < 1000 (the O(n²) oracle twin of the LSH path).
    Entry("q_dedup_ngram_jaccard",
      (s, d) => Dedup.ngramJaccardPairs(t(s, d, "documents"), "text", "doc_id",
        n = 3, threshold = 0.5, maxDocId = 1000),
      Some(Dedup.duckNgramJaccardPairs("documents", "text", "doc_id",
        n = 3, threshold = 0.5, maxDocId = 1000))),

    // Prefix-filtering exact similarity join (PPJoin/AllPairs family):
    // the EXACT near-dup route with no quadratic stage — rarest-first
    // prefix postings + size filter + verify. Lossless by construction,
    // so the oracle is the same ground-truth pair set the O(n²) scan
    // gate uses: equality, not a recall bound. (The gate bound exists
    // for the ORACLE's quadratic CTE, not the operator.) Routed through
    // the AUTO variant: the gate additionally proves the measured
    // candidate statistic picks the exact path on a natural vocabulary
    // (DedupSpec pins the closed-vocabulary → LSH fallback).
    Entry("q_dedup_prefix",
      (s, d) => Dedup.prefixJaccardPairsAuto(
        t(s, d, "documents").filter(col("doc_id") < 2000), "text", "doc_id",
        n = 3, threshold = 0.5),
      Some(Dedup.duckNgramJaccardPairs("documents", "text", "doc_id",
        n = 3, threshold = 0.5, maxDocId = 2000))),

    // Pair resolution: near-dup pairs → connected components → keep the
    // min-id representative per cluster (the actual dedup). Oracle is a
    // recursive-CTE transitive closure over the same exact pairs.
    // Near-dup cluster-size histogram on the q_dedup_resolve scope —
    // the aggressiveness audit: how much cluster mass resolution is
    // about to collapse (singletons included, so Σ size·n = corpus).
    Entry("q_dedup_hist_sizes",
      (s, d) => {
        val docs = t(s, d, "documents")
        val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
          n = 3, threshold = 0.5, maxDocId = 500)
        Dedup.clusterSizeHistogram(docs.filter(col("doc_id") < 500),
          pairs, "doc_id")
      },
      Some(Dedup.duckClusterSizeHistogram(
        "(SELECT * FROM documents WHERE doc_id < 500)", "text", "doc_id",
        n = 3, threshold = 0.5, maxDocId = 500))),

    // Near-dup RESOLUTION: exact n-gram Jaccard pairs fed into the
    // large-star/small-star connected-components loop (O(log n) rounds,
    // checkpointed) -> one representative per duplicate cluster. Oracle
    // = recursive-CTE closure over the same pairs.
    Entry("q_dedup_resolve",
      (s, d) => {
        val docs = t(s, d, "documents")
        // Bounded tighter than q_dedup_ngram_jaccard: this query pays the
        // O(n²) pair search AND the clustering loop; the production route
        // feeds resolvePairs from minhashLshPairs instead.
        val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
          n = 3, threshold = 0.5, maxDocId = 500)
        Dedup.resolvePairs(docs, pairs, "doc_id")
      },
      Some(Dedup.duckResolveNgramPairs("documents", "text", "doc_id",
        n = 3, threshold = 0.5, maxDocId = 500))),

    // Cluster resolution with the KEEP-BEST policy: within each near-dup
    // cluster survive the member with the highest model quality score
    // (id tie-break) instead of the lowest id — the policy cleaning
    // pipelines actually want. One cluster-keyed max_by after the same
    // CC loop; oracle = recursive closure + ROW_NUMBER argmax.
    Entry("q_dedup_keepbest",
      (s, d) => {
        val scored = t(s, d, "documents").filter(col("doc_id") < 500)
          .withColumn("_w", TextAnalysis.tokens(col("text")))
          .select(col("doc_id"), col("text"),
            QualityFilters.classifierScoreOf(col("_w")).as("q_score"))
        val pairs = Dedup.ngramJaccardPairs(scored, "text", "doc_id",
          n = 3, threshold = 0.5, maxDocId = 500)
        Dedup.resolvePairsKeepBest(scored, pairs, "doc_id", "q_score")
          .select(col("doc_id"), col("q_score"))
      },
      Some {
        val rel = "(SELECT doc_id, text, " +
          s"${QualityFilters.duckClassifierScore} AS q_score " +
          s"FROM (SELECT *, ${TextAnalysis.duckTokensBind("text")} AS w " +
          "FROM documents WHERE doc_id < 500) dd)"
        Dedup.duckResolveKeepBestNgram(rel, "text", "doc_id", "q_score",
          n = 3, threshold = 0.5, maxDocId = 500)
      }),

    // Keep-best through the PRODUCTION pair route: LSH candidates
    // instead of the O(n²) search, same keep-best policy. The oracle is
    // the exact-pair closure (recall equivalence on the bounded scope
    // is gated by q_dedup_minhash_lsh), so this row proves the policy
    // composes with the scale path end-to-end.
    Entry("q_dedup_keepbest_lsh",
      (s, d) => {
        val scored = t(s, d, "documents").filter(col("doc_id") < 1000)
          .withColumn("_w", TextAnalysis.tokens(col("text")))
          .select(col("doc_id"), col("text"),
            QualityFilters.classifierScoreOf(col("_w")).as("q_score"))
        val pairs = Dedup.minhashLshPairs(scored, "text", "doc_id",
          n = 3, bands = 42, rowsPerBand = 3, threshold = 0.5)
        Dedup.resolvePairsKeepBest(scored, pairs, "doc_id", "q_score")
          .select(col("doc_id"), col("q_score"))
      },
      Some {
        val rel = "(SELECT doc_id, text, " +
          s"${QualityFilters.duckClassifierScore} AS q_score " +
          s"FROM (SELECT *, ${TextAnalysis.duckTokensBind("text")} AS w " +
          "FROM documents WHERE doc_id < 1000) dd)"
        Dedup.duckResolveKeepBestNgram(rel, "text", "doc_id", "q_score",
          n = 3, threshold = 0.5, maxDocId = 1000)
      }),

    // The PRODUCTION dedup route end-to-end: MinHash+LSH pair finding →
    // connected components → representative-only corpus. Oracle is the
    // recursive-CTE closure over the exact pair set (equal to the LSH
    // pair set on the bounded scope — recall-checked by
    // q_dedup_minhash_lsh), so this gates the whole pipeline a user
    // would actually run at scale.
    Entry("q_dedup_resolve_lsh",
      (s, d) => {
        val docs = t(s, d, "documents").filter(col("doc_id") < 1000)
        val pairs = Dedup.minhashLshPairs(docs, "text", "doc_id",
          n = 3, bands = 42, rowsPerBand = 3, threshold = 0.5)
        Dedup.resolvePairs(t(s, d, "documents"), pairs, "doc_id")
      },
      Some(Dedup.duckResolveNgramPairs("documents", "text", "doc_id",
        n = 3, threshold = 0.5, maxDocId = 1000))),

    // MinHash+LSH near-dup detection: 126 hashes, 42 bands × 3 rows
    // (≈99.7% per-pair detection at j=0.5), signature-group collapse +
    // bucket cap (skew guard), exact-Jaccard verification. HARD oracle:
    // on the bounded fixture scope the LSH output must equal the exact
    // ground-truth pair set — the verified output is a subset of the
    // exact pairs by construction, so equality IS a 100%-recall check
    // (hashes are deterministic, so this is stable run-to-run).
    // Pairwise-Jaccard histogram — pick the dedup threshold from the
    // corpus's measured similarity distribution. Engine side is the
    // postings-intersection formulation (co-occurrence-linear, df-cap
    // skew guard); the oracle mirrors the SAME formulation, so the cap
    // semantics are exact, not approximated.
    Entry("q_dedup_hist",
      (s, d) => Dedup.jaccardHistogram(t(s, d, "documents"), "text",
        "doc_id", n = 3, bins = 20, maxDocId = 1000),
      Some(Dedup.duckJaccardHistogram("documents", "text", "doc_id",
        n = 3, bins = 20, maxDocId = 1000))),

    // THE production near-dup path: MinHash signatures (native codegen
    // MinHashSig) -> banded bucket equi-join (cap-guarded) -> exact
    // Jaccard verification. Oracle = the exact pairwise ground truth at
    // the same threshold: with b=42/r=3 the detect probability at
    // tau=0.5 is ~0.997, and the verified output is a SUBSET of the
    // exact pairs by construction, so row equality IS a recall check.
    Entry("q_dedup_minhash_lsh",
      (s, d) => Dedup.minhashLshPairs(
        t(s, d, "documents").filter(col("doc_id") < 1000), "text", "doc_id",
        n = 3, bands = 42, rowsPerBand = 3, threshold = 0.5),
      Some(Dedup.duckNgramJaccardPairs("documents", "text", "doc_id",
        n = 3, threshold = 0.5, maxDocId = 1000))),

    // Edit-distance-verified fuzzy dedup: LSH candidates (loose Jaccard
    // floor) re-verified with the normalized Levenshtein ratio — the
    // character-level near-dup criterion. HARD oracle: exact pairwise
    // ground truth at the same floor + the same edit filter, so the
    // gate re-proves full candidate recall THROUGH the edit
    // verification, and the ratio column pins both engines' Levenshtein
    // to the classic definition.
    Entry("q_dedup_edit",
      (s, d) => Dedup.editVerifiedPairs(
        t(s, d, "documents").filter(col("doc_id") < 1000), "text", "doc_id",
        n = 3, bands = 42, rowsPerBand = 3,
        candJaccard = 0.5, maxEditRatio = 0.3),
      Some(Dedup.duckEditVerifiedPairs("documents", "text", "doc_id",
        n = 3, candJaccard = 0.5, maxEditRatio = 0.3, maxDocId = 1000))),

    // Jaro–Winkler-verified fuzzy dedup: the same LSH-candidate shape
    // re-scored with the native graft_jaro_winkler expression, pinned
    // bitwise to DuckDB's jaro_winkler_similarity (rapidfuzz lineage)
    // — prefix/transposition-tolerant record-linkage next to the
    // insert/delete-oriented q_dedup_edit.
    Entry("q_dedup_jaro",
      (s, d) => Dedup.jaroVerifiedPairs(
        t(s, d, "documents").filter(col("doc_id") < 1000), "text", "doc_id",
        n = 3, bands = 42, rowsPerBand = 3,
        candJaccard = 0.5, minJw = 0.8),
      Some(Dedup.duckJaroVerifiedPairs("documents", "text", "doc_id",
        n = 3, candJaccard = 0.5, minJw = 0.8, maxDocId = 1000))),

    // SimHash near-dup detection: 64-bit signatures, pigeonhole chunk
    // buckets (maxHamming+1 chunks → exact candidate recall), signature
    // collapse + bucket cap. HARD oracle: candidates within hamming ≤ 10
    // are re-verified with exact n-gram Jaccard and must reproduce the
    // exact ground-truth pair set on the bounded scope — every true
    // near-dup pair (j ≥ 0.5) measures hamming ≤ 9 on this corpus, so a
    // missed pair (bucketing bug or radius regression) turns the gate red.
    Entry("q_dedup_simhash",
      (s, d) => {
        val docs = t(s, d, "documents").filter(col("doc_id") < 1000)
        // radius 10: every j ≥ 0.5 pair in the corpus measures ≤ 9
        // (fixture max, margin 1); 11 pigeonhole chunks keep candidate
        // recall exact at this radius.
        val pairs = Dedup.simhashPairs(docs, "text", "doc_id", maxHamming = 10)
        val sh = docs.select(col("doc_id"), Dedup.shingleFps(col("text"), 3).as("_sh"))
        pairs
          .join(sh.withColumnRenamed("doc_id", "id_a").withColumnRenamed("_sh", "_sha"), "id_a")
          .join(sh.withColumnRenamed("doc_id", "id_b").withColumnRenamed("_sh", "_shb"), "id_b")
          .withColumn("jaccard", round(Dedup.jaccardSorted(col("_sha"), col("_shb")), 6))
          .filter(col("jaccard") >= 0.5)
          .select("id_a", "id_b", "jaccard")
      },
      Some(Dedup.duckNgramJaccardPairs("documents", "text", "doc_id",
        n = 3, threshold = 0.5, maxDocId = 1000))),

    // Embedding-cosine near-dup pairs (exact ground truth; double
    // left-fold dot product matches DuckDB list_dot_product bitwise).
    // Caller-bounded like its n-gram sibling — the O(n²) join must never
    // see an unbounded corpus; q_dedup_embedding_lsh is the scale path.
    Entry("q_dedup_embedding",
      (s, d) => Dedup.embeddingNearDupPairs(t(s, d, "embeddings"),
        "embedding", "vec_id", threshold = 0.35, maxId = 1000),
      Some(Dedup.duckEmbeddingNearDupPairs("embeddings", "embedding", "vec_id",
        threshold = 0.35, maxId = 1000))),

    // Sign-LSH embedding near-dup (the production scale path): bucketed
    // equi-join on hyperplane sign keys, exact-cosine verification. HARD
    // oracle: must equal the exact pair set on the bounded scope (output
    // ⊆ exact by construction ⇒ equality = 100% recall on the fixture).
    Entry("q_dedup_embedding_lsh",
      (s, d) => Similarity.lshNearDupPairs(
        t(s, d, "embeddings").filter(col("vec_id") < 1000),
        "embedding", "vec_id", dim = 64, nBits = 4, nTables = 64,
        threshold = 0.35),
      Some(Dedup.duckEmbeddingNearDupPairs("embeddings", "embedding", "vec_id",
        threshold = 0.35, maxId = 1000))),

    // ANN brute-force baseline: cosine top-5 for query set vec_id < 10,
    // broadcast queries, windowed top-k — scores oracle-checked.
    Entry("q_ann_bruteforce",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 10),
          "embedding", "vec_id", k = 5)
      },
      Some(Similarity.duckBruteForceTopK("embeddings", "embedding", "vec_id",
        k = 5, maxQueryId = 10))),

    // The SAME search through the bounded-heap typed aggregate
    // (functions.TopK): identical rows to q_ann_bruteforce — one oracle
    // proves both physical shapes — but the aggregate partial-collapses
    // map-side, so the exchange is k·queries·partitions rows instead of
    // the whole scored corpus. Plan-gated in PlanAuditSpec.
    Entry("q_ann_topk_agg",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        Similarity.bruteForceTopKAgg(emb, emb.filter(col("vec_id") < 10),
          "embedding", "vec_id", k = 5)
      },
      Some(Similarity.duckBruteForceTopK("embeddings", "embedding", "vec_id",
        k = 5, maxQueryId = 10))),

    // Contrastive HARD-NEGATIVE mining: per anchor, the most-similar
    // vectors BELOW the positive ceiling (near-dups and self are
    // positives/leakage, not negatives). Same exchange-bounded
    // bounded-heap shape as q_ann_topk_agg — the ceiling is a narrow
    // map-side predicate on the scored stream.
    Entry("q_hard_negatives",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        Similarity.hardNegatives(emb, emb.filter(col("vec_id") < 5),
          "embedding", "vec_id", k = 5, posCeiling = 0.3)
      },
      Some(Similarity.duckHardNegatives("embeddings", "embedding", "vec_id",
        k = 5, posCeiling = 0.3, maxAnchorId = 5))),

    // MMR diversified rerank (λ=0.5): 20 brute-force candidates for one
    // query, greedily re-ranked down to 5 trading relevance against
    // redundancy. Candidate gen is the corpus-sized distributed stage;
    // the greedy runs on the RESULT-sized candidate set. HARD oracle:
    // the k greedy steps unrolled as CTEs with identical 6-dp-rounded
    // similarity inputs and id tie-breaks.
    Entry("q_mmr_rerank",
      (s, d) => Mmr.rerank(t(s, d, "embeddings"), "embedding", "vec_id",
        queryId = 0L, nCand = 20, k = 5),
      Some(Mmr.duckRerank("embeddings", "embedding", "vec_id",
        queryId = 0L, nCand = 20, k = 5))),

    // ANN scale path: IVF over label cells (centroid probe, nProbe=3).
    // HARD oracle: DuckDB mirrors the IVF computation itself (centroids
    // → probes → in-cell exact search), so probe selection AND the
    // probed-cell top-k are both checked; emitted scores are exact dot
    // products, bitwise equal between engines.
    Entry("q_ann_ivf",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 10),
          "embedding", "vec_id", "label", k = 5, nProbe = 3)
      },
      Some(Similarity.duckIvfTopK("embeddings", "embedding", "vec_id", "label",
        dim = 64, k = 5, nProbe = 3, maxQueryId = 10))),

    // ANN IVF over LEARNED cells: deterministic distributed Lloyd
    // k-means (min-id init, max-dot assignment with min-cell tie-break,
    // mean update) builds the coarse quantizer, then the same centroid
    // probe + in-cell search. Oracle unrolls the k-means iterations as
    // CTEs and mirrors the whole pipeline.
    Entry("q_ann_ivf_kmeans",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val cells = Similarity.kmeansCells(emb, "embedding", "vec_id", k = 8, iters = 2)
        val corpus = emb.join(cells, "vec_id")
        Similarity.ivfTopK(corpus, corpus.filter(col("vec_id") < 10),
          "embedding", "vec_id", "cell", k = 5, nProbe = 3)
      },
      Some(Similarity.duckIvfTopK(
        Similarity.duckKmeansRel("embeddings", "embedding", "vec_id", k = 8, iters = 2, dim = 64),
        "embedding", "vec_id", "cell", dim = 64, k = 5, nProbe = 3, maxQueryId = 10))),

    // IVF from a PERSISTED cell assignment — the amortized read path of
    // q_ann_ivf_kmeans (train the coarse quantizer once, search many
    // times): the learned (vec_id, cell) table is built and saved once
    // per JVM (artifactCache) and every invocation after the first
    // loads it from parquet and pays the probe + in-cell search only.
    // Same oracle — the index round trip must be invisible.
    Entry("q_ann_ivf_saved",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val dir = artifactDir(s"ivf|$d|k=8") { dir =>
          Similarity.kmeansCells(emb, "embedding", "vec_id", k = 8, iters = 2)
            .write.mode("overwrite").parquet(s"$dir/cells")
        }
        val corpus = emb.join(s.read.parquet(s"$dir/cells"), "vec_id")
        Similarity.ivfTopK(corpus, corpus.filter(col("vec_id") < 10),
          "embedding", "vec_id", "cell", k = 5, nProbe = 3)
      },
      Some(Similarity.duckIvfTopK(
        Similarity.duckKmeansRel("embeddings", "embedding", "vec_id", k = 8, iters = 2, dim = 64),
        "embedding", "vec_id", "cell", dim = 64, k = 5, nProbe = 3, maxQueryId = 10))),

    // Product-quantization ANN: 8 subspaces × 16 centroids trained as ONE
    // joint deterministic Lloyd pass (single exchange updates all eight
    // codebooks), corpus stored as 8 codes/vector, candidates scored by
    // asymmetric-distance codebook lookups only — the 32× scan-volume cut
    // for embedding search at scale. Oracle unrolls the joint k-means and
    // the sorted-fold ADC sum.
    Entry("q_ann_pq",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        Pq.pqTopK(emb, emb.filter(col("vec_id") < 10), "embedding", "vec_id",
          dim = 64, m = 8, ksub = 16, iters = 2, k = 5)
      },
      Some(Pq.duckPqTopK("embeddings", "embedding", "vec_id",
        dim = 64, m = 8, ksub = 16, iters = 2, k = 5, maxQueryId = 10))),

    // PQ index PERSISTENCE round trip — train, save (codes parquet +
    // codebook parquet), load, query from the loaded index. Same oracle
    // as q_ann_pq: the disk round trip must be lossless to the row.
    // This is the production read path (train once offline, query many
    // times); per-run temp dir like the sink roundtrips.
    Entry("q_ann_pq_saved",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val (codes, cents) = Pq.pqModel(emb, "embedding", "vec_id",
          dim = 64, m = 8, ksub = 16, iters = 2)
        val dir = TempDirs.create("graft-pq-index").toString
        Pq.saveIndex(codes, cents, "vec_id", dir)
        val (codes2, cents2) = Pq.loadIndex(s, dir)
        Pq.pqTopKFromIndex(codes2, cents2, emb.filter(col("vec_id") < 10),
          "embedding", "vec_id", dim = 64, m = 8, k = 5)
      },
      Some(Pq.duckPqTopK("embeddings", "embedding", "vec_id",
        dim = 64, m = 8, ksub = 16, iters = 2, k = 5, maxQueryId = 10))),

    // IVF-PQ — the production ANN composition: learned coarse cells
    // prune candidates (3-of-8 probed), PQ codes make scoring the
    // survivors an m-lookup ADC sum. At scale: cell = partition key,
    // codes inline, raw floats never scanned at query time.
    Entry("q_ann_ivfpq",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val cells = Similarity.kmeansCells(emb, "embedding", "vec_id", k = 8, iters = 2)
        // Materialize (vector, cell) ONCE: three consumers (codebook
        // training, coarse centroids, candidate coding) would otherwise
        // each recompute the kmeans assignment — the q_ann_jl barrier
        // pattern; at scale this is "write the cell-partitioned index,
        // then query it".
        val corpus = emb.join(cells, "vec_id").localCheckpoint()
        Pq.ivfPqTopK(corpus, corpus.filter(col("vec_id") < 10),
          "embedding", "vec_id", "cell",
          dim = 64, m = 8, ksub = 16, iters = 2, k = 5, nProbe = 3)
      },
      Some(Pq.duckIvfPqTopK(
        Similarity.duckKmeansRel("embeddings", "embedding", "vec_id", k = 8, iters = 2, dim = 64),
        "embedding", "vec_id", "cell",
        dim = 64, m = 8, ksub = 16, iters = 2, k = 5, nProbe = 3, maxQueryId = 10))),

    // As-of join (point-in-time lookup): every view event matched to the
    // user's most recent purchase at-or-before it. Spark has no built-in
    // as-of operator — AsofJoin is the union-and-carry sort-merge
    // formulation (one exchange, no nested-loop join); the oracle is
    // DuckDB's NATIVE `ASOF LEFT JOIN`, so the semantics are checked
    // against an independent first-class implementation.
    Entry("q_asof_join",
      (s, d) => {
        val ev = t(s, d, "events")
        val views = ev.filter(col("event_type") === "view")
          .select("event_id", "user_id", "ts")
        // Collapse right rows to one per (user_id, ts) for determinism.
        val purchases = ev.filter(col("event_type") === "purchase")
          .groupBy("user_id", "ts")
          .agg(max_by(col("value"), col("event_id")).as("value"))
        AsofJoin.asofJoin(views, purchases, Seq("user_id"), "ts", Seq("value"))
      },
      Some(AsofJoin.duckAsofJoin(
        s"(SELECT event_id, user_id, ts FROM $EvOracle e WHERE event_type = 'view')",
        s"(SELECT user_id, ts, max_by(value, event_id) AS value FROM $EvOracle e " +
          "WHERE event_type = 'purchase' GROUP BY 1, 2)",
        Seq("user_id"), "ts",
        leftOutCols = Seq("event_id", "user_id", "ts"),
        payloadCols = Seq("value")))),

    // Interval join WITHOUT an equi key (purchases inside the 10-minute
    // window after any error event): the naive theta-join is a
    // BroadcastNestedLoopJoin; RangeJoin bucketizes time so it runs as a
    // bucket equi-join + exact containment filter. Everything stays in
    // µs-epoch integers, so the oracle (a plain inequality join) matches
    // exactly.
    Entry("q_range_join",
      (s, d) => {
        val ev = t(s, d, "events")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), unix_micros(col("ts")).as("p_us"))
        val errors = ev.filter(col("event_type") === "error")
          .select(col("event_id").as("error_id"),
            unix_micros(col("ts")).as("start_us"),
            (unix_micros(col("ts")) + 600000000L).as("end_us"))
        RangeJoin.bucketedIntervalJoin(purchases, "p_us",
            errors, "start_us", "end_us", bucketUs = 600000000L)
          .select(col("purchase_id"), col("error_id"),
            (col("p_us") - col("start_us")).as("lag_us"))
      },
      Some(s"""SELECT p.event_id AS purchase_id, e.event_id AS error_id,
                      epoch_us(p.ts) - epoch_us(e.ts) AS lag_us
               FROM (SELECT * FROM $EvOracle ev WHERE event_type = 'purchase') p,
                    (SELECT * FROM $EvOracle ev2 WHERE event_type = 'error') e
               WHERE epoch_us(p.ts) >= epoch_us(e.ts)
                 AND epoch_us(p.ts) < epoch_us(e.ts) + 600000000""")),

    // Deterministic-sample range join (r14, VERDICT r13 #4): the SAME
    // bucketed interval join over an id-deterministic purchase slice.
    // The full gate's output is quadratic in event density (926 M rows
    // at sf10 — checker-infeasible to hash-compare); the slice keeps
    // the row-level compare feasible at the TOP SFs while exercising
    // the identical bucket/containment machinery. The modulus is
    // SF-tiered from the fixture's events count (the q_quantile_sketch
    // pattern, identical tiering on both engines): small fixtures take
    // the full join (their output is tiny — sampling there would only
    // de-vacuate the gate), sf10's 10 M events take 1/31 (≈ 30 M rows).
    Entry("q_range_join_sample",
      (s, d) => {
        val ev = t(s, d, "events")
        // footer-metadata tier probe, not a Spark count job (r15)
        val n = FixtureProbe.rowCount(s, d, "events")
        val m = if (n <= 200000L) 1L else if (n <= 2000000L) 7L else 31L
        val purchases = ev.filter(col("event_type") === "purchase" &&
            pmod(col("event_id"), lit(m)) === 0L)
          .select(col("event_id").as("purchase_id"), unix_micros(col("ts")).as("p_us"))
        val errors = ev.filter(col("event_type") === "error")
          .select(col("event_id").as("error_id"),
            unix_micros(col("ts")).as("start_us"),
            (unix_micros(col("ts")) + 600000000L).as("end_us"))
        RangeJoin.bucketedIntervalJoin(purchases, "p_us",
            errors, "start_us", "end_us", bucketUs = 600000000L)
          .select(col("purchase_id"), col("error_id"),
            (col("p_us") - col("start_us")).as("lag_us"))
      },
      Some(s"""SELECT p.event_id AS purchase_id, e.event_id AS error_id,
                      epoch_us(p.ts) - epoch_us(e.ts) AS lag_us
               FROM (SELECT * FROM $EvOracle ev WHERE event_type = 'purchase'
                     AND event_id % (CASE WHEN (SELECT count(*) FROM events) <= 200000 THEN 1
                                          WHEN (SELECT count(*) FROM events) <= 2000000 THEN 7
                                          ELSE 31 END) = 0) p,
                    (SELECT * FROM $EvOracle ev2 WHERE event_type = 'error') e
               WHERE epoch_us(p.ts) >= epoch_us(e.ts)
                 AND epoch_us(p.ts) < epoch_us(e.ts) + 600000000""")),

    // Full-join COUNT audit for the range join (r14, VERDICT r13 #4):
    // one row, the exact pair count of the UNSAMPLED join — the oracle
    // aggregates its inequality join without ever sorting/hashing the
    // quadratic output, so the full gate's cardinality is verified even
    // at SFs where the row-level compare is checker-infeasible.
    Entry("q_range_join_count",
      (s, d) => {
        val ev = t(s, d, "events")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), unix_micros(col("ts")).as("p_us"))
        val errors = ev.filter(col("event_type") === "error")
          .select(col("event_id").as("error_id"),
            unix_micros(col("ts")).as("start_us"),
            (unix_micros(col("ts")) + 600000000L).as("end_us"))
        RangeJoin.bucketedIntervalJoin(purchases, "p_us",
            errors, "start_us", "end_us", bucketUs = 600000000L)
          .agg(count(lit(1)).as("n_pairs"))
      },
      Some(s"""SELECT count(*) AS n_pairs
               FROM (SELECT * FROM $EvOracle ev WHERE event_type = 'purchase') p,
                    (SELECT * FROM $EvOracle ev2 WHERE event_type = 'error') e
               WHERE epoch_us(p.ts) >= epoch_us(e.ts)
                 AND epoch_us(p.ts) < epoch_us(e.ts) + 600000000""")),

    // The COMPOSED training-data prep pipeline end-to-end: score →
    // language/quality filter → exact dedup → LSH near-dup resolve →
    // training manifest. Oracle mirrors stages directly with the exact
    // pairwise ground truth in place of LSH, so this re-proves 100% LSH
    // recall through the whole composition.
    // SCOPE BOUND (r10 verdict item 7): the oracle's near-dup stage is
    // the exact O(n²) pairwise CTE, which at sf0.1's 5 000 docs ran
    // ~96 CPU-min in DuckDB and cut the r9 full-SF verify short. The
    // gate slices the corpus at doc_id < 1500 on BOTH sides — a no-op
    // at sf0.001/sf0.01 (≤ 500 docs), and at sf0.1 it caps the oracle
    // at ~1.1 M pairs so a full-suite sf0.1 pass completes. The
    // operator itself stays unbounded (q_dedup_minhash_lsh's pattern).
    Entry("q_pipeline_prep",
      (s, d) => Pipeline.prepCorpus(
        t(s, d, "documents").filter(col("doc_id") < 1500), "text", "doc_id",
        lang = "en", minQuality = 0.75),
      Some(Pipeline.duckPrepCorpus("(SELECT * FROM documents WHERE doc_id < 1500)",
        "text", "doc_id", lang = "en", minQuality = 0.75, n = 3, threshold = 0.5))),

    // Symmetric int8 embedding quantization (the 4× storage shrink before
    // indexing/shipping vectors): scale, quantized-vector digest, and
    // reconstruction MSE — every value bitwise-checked against DuckDB.
    Entry("q_emb_quantize",
      (s, d) => Embeddings.quantizeInt8(t(s, d, "embeddings"), "embedding", "vec_id"),
      Some(Embeddings.duckQuantizeInt8("embeddings", "embedding", "vec_id"))),

    // Johnson–Lindenstrauss ±1 projection 64 → 16 (4× shrink before
    // ANN): plan-time literal sign matrix, one narrow codegen'd
    // projection, bitwise-identical left-fold sums both engines.
    // 1/√16 = 0.25 exactly, so the scale literal is lossless.
    Entry("q_rand_proj",
      (s, d) => Embeddings.randProject(t(s, d, "embeddings"), "embedding", "vec_id",
        srcDim = 64, outDim = 16),
      Some(Embeddings.duckRandProject("embeddings", "embedding", "vec_id",
        srcDim = 64, outDim = 16, scaleSql = "0.25"))),

    // The compression path FEEDING search: brute-force dot top-k in
    // the 24-dim JL space — both engines compute the identical
    // projected ranking (bitwise floats; the scale literal is the
    // shortest round-trip decimal of 1/√24, which DuckDB parses to the
    // same double). 24 dims, not 16: on a separable clustered corpus
    // r=16 measured mean recall@10 ≈ 0.78 vs ≈ 0.86 at r=24 — the
    // SimilaritySpec recall gate pins ≥ 0.8. This fixture itself has no
    // strong neighbors (max cosine ≈ 0.5, near-tied), so the oracle
    // checks bitwise ranking parity; the usefulness claim lives in the
    // recall gate's clustered fixture.
    Entry("q_ann_jl",
      (s, d) => {
        // "Project ONCE, search in 24-d": the projection feeds both the
        // corpus side and the broadcast query side, so without a
        // barrier the 24×(128-term) chain re-evaluates per consumer —
        // measured 1.34 s vs 0.46 s warm at sf0.1. At scale this is
        // exactly "materialize the compressed vectors, then search
        // them" — the point of compressing at all.
        val proj = Embeddings.randProjectVec(t(s, d, "embeddings"),
          "embedding", "vec_id", srcDim = 64, outDim = 24, as = "proj")
          .localCheckpoint()
        Similarity.bruteForceTopK(proj, proj.filter(col("vec_id") < 10),
          "proj", "vec_id", k = 5)
      },
      Some(s"""WITH pv AS (SELECT vec_id, ${Embeddings.duckRandProjectVec(64, 24, (1.0 / math.sqrt(24.0)).toString)} AS proj
               |           FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings) v),
               |q AS (SELECT vec_id AS query_id, CAST(proj AS DOUBLE[]) AS qv
               |      FROM pv WHERE vec_id < 10),
               |s AS (SELECT q.query_id, c.vec_id,
               |             list_dot_product(q.qv, CAST(c.proj AS DOUBLE[])) AS score,
               |             ROW_NUMBER() OVER (PARTITION BY q.query_id
               |               ORDER BY list_dot_product(q.qv, CAST(c.proj AS DOUBLE[])) DESC,
               |                        c.vec_id ASC) AS rank
               |      FROM q, pv c WHERE c.vec_id <> q.query_id)
               |SELECT query_id, vec_id, rank, round(score, 6) AS score
               |FROM s WHERE rank <= 5""".stripMargin)),

    // Distributed PCA: ONE-pass quantized-BIGINT Gram sums (exact,
    // order-independent), driver power iteration on 32 KB of metadata,
    // broadcast-literal projection. Oracle unrolls the identical
    // 8-step iteration from the same integer sums — bitwise to the
    // final round(6).
    Entry("q_pca_power",
      (s, d) => Pca.scores(t(s, d, "embeddings"), "embedding", "vec_id",
        d = 64, iters = 8),
      Some(Pca.duckScores("embeddings", "embedding", "vec_id",
        d = 64, iters = 8))),

    // Per-source unigram KL drift vs the corpus blend (mixture
    // monitoring): vocabulary-sized aggregates, token-keyed count
    // join, exact-integer KL sum (order-independent, oracle-exact).
    Entry("q_source_drift",
      (s, d) => Drift.sourceKl(t(s, d, "documents"), "text", "source",
        minCount = 5),
      Some(Drift.duckSourceKl("documents", "text", "source",
        minCount = 5))),

    // Clustering-quality silhouette (centroid-based, integer-exact)
    // over the stored label assignment: centroids are k·dim driver
    // metadata inlined as literals — one narrow codegen scoring pass,
    // no k-way corpus join.
    Entry("q_silhouette",
      (s, d) => Similarity.silhouette(t(s, d, "embeddings"), "embedding",
        "label"),
      Some(Similarity.duckSilhouette("embeddings", "embedding", "vec_id",
        "label", dim = 64))),

    // EMBEDDING-space drift: per-label centroid cosine against the
    // corpus centroid (the semantic sibling of q_source_drift — token
    // KL sees vocabulary shifts, centroid cosine sees meaning shifts).
    // One posexplode → one (group, component) aggregate; exact-integer
    // quantized sums make the centroids engine-bitwise.
    Entry("q_emb_drift",
      (s, d) => Drift.embeddingDrift(t(s, d, "embeddings"), "embedding", "label"),
      Some(Drift.duckEmbeddingDrift("embeddings", "embedding", "label", dim = 64))),

    // Pairwise group-centroid cosine matrix — the semantic-redundancy
    // map between slices (merge/downweight candidates; uniformly-low
    // rows are semantic outliers). One corpus pass to (group, dim)
    // exact sums; the 45-pair join runs on the groups-sized frame.
    Entry("q_emb_group_sim",
      (s, d) => Drift.centroidSimMatrix(t(s, d, "embeddings"),
        "embedding", "label"),
      Some(Drift.duckCentroidSimMatrix("embeddings", "embedding",
        "label", dim = 64))),

    // Within-group alignment: the EXACT mean pairwise cosine per group
    // via (‖Σx‖² − Σ‖x‖²)/(n(n−1)) — one corpus pass, no pair
    // enumeration; exact µ²-integer numerator, one final division.
    Entry("q_emb_alignment",
      (s, d) => Drift.withinGroupAlignment(t(s, d, "embeddings"),
        "embedding", "label"),
      Some(Drift.duckWithinGroupAlignment("embeddings", "embedding",
        "label", dim = 64))),

    // Multimodal: binary payload + batched per-partition decode stub
    // (mapPartitions with explicit encoder — the mapInPandas shape).
    Entry("q_mm_decode",
      (s, d) => Multimodal.decodeBatch(
        Multimodal.attachBinary(t(s, d, "documents"), "text"), "doc_id"),
      Some(Multimodal.duckDecodeBatch("documents", "text", "doc_id"))),

    // Multimodal batch resize: nearest-neighbor 16×8 with the stub
    // resizer (real java.awt path spec-gated like imageDecode).
    Entry("q_mm_resize",
      (s, d) => Multimodal.resizeBatch(
        Multimodal.attachBinary(t(s, d, "documents"), "text"), "doc_id",
        targetW = 16, targetH = 8),
      Some(Multimodal.duckResizeBatch("documents", "text", "doc_id",
        targetW = 16, targetH = 8))),

    // Multimodal audio-feature extraction: payload as unsigned PCM8 —
    // sample count, peak, centered integer energy (bitwise oracle).
    Entry("q_mm_audio",
      (s, d) => Multimodal.audioFeatures(
        Multimodal.attachBinary(t(s, d, "documents"), "text"), "doc_id"),
      Some(Multimodal.duckAudioFeatures("documents", "text", "doc_id"))),

    // Multimodal frame sampling: every 2nd 64-byte frame, flat rows.
    Entry("q_mm_frames",
      (s, d) => Multimodal.frameSample(
        Multimodal.attachBinary(t(s, d, "documents"), "text"), "doc_id", step = 2),
      Some(Multimodal.duckFrameSample("documents", "text", "doc_id", step = 2))),

    // ------------------------------------------------------------------
    // Round-3 corpus-curation extensions: the filter/scrub/split/pack
    // stages around dedup in a pre-training data pipeline.
    // ------------------------------------------------------------------

    // Gopher-style quality/repetition filters: mean word length, unique-
    // word ratio, top-word frequency, duplicate-2-gram ratio + keep
    // verdict. Narrow codegen projection — no shuffle at any scale.
    Entry("q_quality_gopher",
      (s, d) => Dedup.rebalance(t(s, d, "documents"))
        .withColumn("_w", TextAnalysis.tokens(col("text"))) // bind the split once
        .select(
          col("doc_id"),
          QualityFilters.meanWordLenOf(col("_w")).as("mean_word_len"),
          QualityFilters.uniqWordRatioOf(col("_w")).as("uniq_word_ratio"),
          QualityFilters.topWordRatioOf(col("_w")).as("top_word_ratio"),
          QualityFilters.dup2gramRatioOf(col("_w")).as("dup_2gram_ratio"),
          QualityFilters.keepOf(col("_w")).as("keep")),
      Some(s"""SELECT doc_id,
                      ${QualityFilters.duckMeanWordLen} AS mean_word_len,
                      ${QualityFilters.duckUniqWordRatio} AS uniq_word_ratio,
                      ${QualityFilters.duckTopWordRatio} AS top_word_ratio,
                      ${QualityFilters.duckDup2gramRatio} AS dup_2gram_ratio,
                      ${QualityFilters.duckKeep} AS keep
               FROM (SELECT *, ${TextAnalysis.duckTokensBind("text")} AS w
                     FROM documents) d""")),

    // Linear quality classifier (fastText/DCLM shape): plan-time
    // literal weights over the 6dp-rounded Gopher features + capped
    // length, sigmoid score, 0.5 keep threshold. Narrow codegen
    // projection — swap in trained weights without a plan change.
    Entry("q_quality_classifier",
      (s, d) => Dedup.rebalance(t(s, d, "documents"))
        .withColumn("_w", TextAnalysis.tokens(col("text"))) // bind the split once
        .select(
          col("doc_id"),
          QualityFilters.classifierScoreOf(col("_w")).as("q_score"),
          (QualityFilters.classifierScoreOf(col("_w")) >= 0.5).cast("long").as("q_keep")),
      Some(s"""SELECT doc_id,
                      ${QualityFilters.duckClassifierScore} AS q_score,
                      CAST(${QualityFilters.duckClassifierScore} >= 0.5 AS BIGINT) AS q_keep
               FROM (SELECT *, ${TextAnalysis.duckTokensBind("text")} AS w
                     FROM documents) d""")),

    // Flesch–Kincaid readability per document: three regex counts and
    // one fixed double expression — narrow codegen projection, no
    // shuffle, the curriculum difficulty signal.
    Entry("q_readability",
      (s, d) => {
        val r = Dedup.rebalance(t(s, d, "documents"))
          .withColumn("_w", TextAnalysis.tokens(col("text")))
          .withColumn("_r", TextAnalysis.readabilityOf(col("text"), col("_w")))
        r.select(col("doc_id"), col("_r.n_words"), col("_r.n_sentences"),
          col("_r.n_syllables"), col("_r.fk_grade"))
      },
      Some(s"""SELECT doc_id, ${TextAnalysis.duckReadability("text")}
               FROM (SELECT *, ${TextAnalysis.duckTokensBind("text")} AS w
                     FROM documents) d""")),

    // Classifier evaluation, AUC: exact rank-sum (Mann–Whitney with tie
    // correction) of the linear classifier score against the Gopher
    // rule as weak label — computed from score-GROUPED counts (≤ 10⁶+1
    // distinct 6dp scores, metadata scale), never a per-row global rank.
    Entry("q_auc",
      (s, d) => Eval.aucRankSum(
        Dedup.rebalance(t(s, d, "documents"))
          .withColumn("_w", TextAnalysis.tokens(col("text")))
          .select(QualityFilters.classifierScoreOf(col("_w")).as("q_score"),
            QualityFilters.keepOf(col("_w")).as("keep")),
        "q_score", "keep"),
      Some(Eval.duckAucRankSum(
        s"""SELECT ${QualityFilters.duckClassifierScore} AS q_score,
                   ${QualityFilters.duckKeep} AS keep
            FROM (SELECT *, ${TextAnalysis.duckTokensBind("text")} AS w
                  FROM documents) d""", "q_score", "keep"))),

    // Fisher class-separability of the labeled embeddings: between- vs
    // within-class sum-of-squares trace ratio from ONE (class·dim)
    // exact aggregate — "are these labels linearly separable in this
    // space" before training a probe.
    Entry("q_separability",
      (s, d) => Similarity.classSeparability(t(s, d, "embeddings"),
        "embedding", "label"),
      Some(Similarity.duckClassSeparability("embeddings", "embedding",
        "label"))),

    // PR-AUC (threshold-step average precision) on the same scored
    // frame as q_auc — the imbalanced-class metric; per-threshold
    // terms nano-requantized before the cross-step sum.
    Entry("q_pr_auc",
      (s, d) => Eval.averagePrecision(
        Dedup.rebalance(t(s, d, "documents"))
          .withColumn("_w", TextAnalysis.tokens(col("text")))
          .select(QualityFilters.classifierScoreOf(col("_w")).as("q_score"),
            QualityFilters.keepOf(col("_w")).as("keep")),
        "q_score", "keep"),
      Some(Eval.duckAveragePrecision(
        s"""SELECT ${QualityFilters.duckClassifierScore} AS q_score,
                   ${QualityFilters.duckKeep} AS keep
            FROM (SELECT *, ${TextAnalysis.duckTokensBind("text")} AS w
                  FROM documents) d""", "q_score", "keep"))),

    // Classifier evaluation, calibration: equal-width reliability bins
    // (mean predicted score vs observed positive rate), bin membership
    // decided in integer micro-score space — one nBins-cardinality agg.
    Entry("q_calibration",
      (s, d) => Eval.calibrationBins(
        Dedup.rebalance(t(s, d, "documents"))
          .withColumn("_w", TextAnalysis.tokens(col("text")))
          .select(QualityFilters.classifierScoreOf(col("_w")).as("q_score"),
            QualityFilters.keepOf(col("_w")).as("keep")),
        "q_score", "keep", nBins = 10),
      Some(Eval.duckCalibrationBins(
        s"""SELECT ${QualityFilters.duckClassifierScore} AS q_score,
                   ${QualityFilters.duckKeep} AS keep
            FROM (SELECT *, ${TextAnalysis.duckTokensBind("text")} AS w
                  FROM documents) d""", "q_score", "keep", nBins = 10))),

    // Jensen–Shannon divergence between the en and es slices' unigram
    // distributions — symmetric, bounded source-similarity (KL drift
    // explodes on one-sided tokens; the JSD midpoint absorbs them);
    // count-cross-product ratios into one ln, nano-requantized terms.
    Entry("q_jsd",
      (s, d) => Entropy.jsDivergence(t(s, d, "documents"), "text",
        predA = "lang = 'en'", predB = "lang = 'es'"),
      Some(Entropy.duckJsDivergence("documents", "text",
        predA = "lang = 'en'", predB = "lang = 'es'"))),

    // Brier score + Murphy decomposition over the same integer-edged
    // bins as q_calibration: proper-scoring-rule view (reliability /
    // resolution / uncertainty) of the quality classifier — exact µ²
    // Brier sum, µ-requantized cross-bin terms.
    Entry("q_brier",
      (s, d) => Eval.brierDecomposition(
        Dedup.rebalance(t(s, d, "documents"))
          .withColumn("_w", TextAnalysis.tokens(col("text")))
          .select(QualityFilters.classifierScoreOf(col("_w")).as("q_score"),
            QualityFilters.keepOf(col("_w")).as("keep")),
        "q_score", "keep", nBins = 10),
      Some(Eval.duckBrierDecomposition(
        s"""SELECT ${QualityFilters.duckClassifierScore} AS q_score,
                   ${QualityFilters.duckKeep} AS keep
            FROM (SELECT *, ${TextAnalysis.duckTokensBind("text")} AS w
                  FROM documents) d""", "q_score", "keep", nBins = 10))),

    // Isotonic (PAV) calibration of the classifier score against the
    // Gopher keep decision — the MONOTONE calibrated curve next to
    // q_calibration's raw per-bin rates, via the minimax
    // characterization (max-min of µ-quantized interval averages) so
    // no sequential PAV loop exists in either engine; everything after
    // the one corpus pass is grid-sized metadata.
    Entry("q_isotonic",
      (s, d) => Eval.isotonicCalibration(
        Dedup.rebalance(t(s, d, "documents"))
          .withColumn("_w", TextAnalysis.tokens(col("text")))
          .select(QualityFilters.classifierScoreOf(col("_w")).as("q_score"),
            QualityFilters.keepOf(col("_w")).as("keep")),
        "q_score", "keep", grid = 100),
      Some(Eval.duckIsotonicCalibration(
        s"""SELECT ${QualityFilters.duckClassifierScore} AS q_score,
                   ${QualityFilters.duckKeep} AS keep
            FROM (SELECT *, ${TextAnalysis.duckTokensBind("text")} AS w
                  FROM documents) d""", "q_score", "keep", grid = 100))),

    // Confident-joint label-noise estimate: class-conditional
    // confidence thresholds in cross-multiplied integer space, the
    // (label × confident-prediction) joint, and the suspected-noise
    // share — "how mislabeled is the keep signal".
    Entry("q_confident_joint",
      (s, d) => Eval.confidentJoint(
        Dedup.rebalance(t(s, d, "documents"))
          .withColumn("_w", TextAnalysis.tokens(col("text")))
          .select(QualityFilters.classifierScoreOf(col("_w")).as("q_score"),
            QualityFilters.keepOf(col("_w")).as("keep")),
        "q_score", "keep"),
      Some(Eval.duckConfidentJoint(
        s"""SELECT ${QualityFilters.duckClassifierScore} AS q_score,
                   ${QualityFilters.duckKeep} AS keep
            FROM (SELECT *, ${TextAnalysis.duckTokensBind("text")} AS w
                  FROM documents) d""", "q_score", "keep"))),

    // Paired-rater agreement between the two quality filters (Gopher
    // rules vs classifier@0.5): Cohen's κ + McNemar over one exact
    // contingency aggregate — the swap-my-filter audit.
    Entry("q_agreement",
      (s, d) => Eval.agreementStats(
        Dedup.rebalance(t(s, d, "documents"))
          .withColumn("_w", TextAnalysis.tokens(col("text")))
          .select(QualityFilters.keepOf(col("_w")).as("keep_a"),
            (QualityFilters.classifierScoreOf(col("_w")) >= 0.5)
              .cast("long").as("keep_b")),
        "keep_a", "keep_b"),
      Some(Eval.duckAgreementStats(
        s"""SELECT ${QualityFilters.duckKeep} AS keep_a,
                   CAST(${QualityFilters.duckClassifierScore} >= 0.5
                        AS BIGINT) AS keep_b
            FROM (SELECT *, ${TextAnalysis.duckTokensBind("text")} AS w
                  FROM documents) d""", "keep_a", "keep_b"))),

    // Curriculum quality binning: per-language equal-depth NTILE deciles
    // of the classifier score (score DESC, id ASC — deterministic bin
    // membership). One narrow scoring projection + one language-keyed
    // window exchange.
    Entry("q_quality_bins",
      (s, d) => Curriculum.qualityBins(t(s, d, "documents"),
        "text", "doc_id", "lang", nBins = 10),
      Some(Curriculum.duckQualityBins("documents", "text", "doc_id",
        "lang", nBins = 10))),

    // Per-domain quality quota: keep the best `cap` docs per source by
    // classifier score (score DESC, id ASC) — the crawl-curation rule
    // that stops one mega-domain from dominating. Same single-exchange
    // ranking window as q_quality_bins, keyed by domain.
    Entry("q_domain_cap",
      (s, d) => Curriculum.domainCap(t(s, d, "documents"),
        "text", "doc_id", "source", cap = 12),
      Some(Curriculum.duckDomainCap("documents", "text", "doc_id",
        "source", cap = 12))),

    // Dynamic per-domain quality threshold: keep the TOP 30% of every
    // source by classifier score (the proportional twin of
    // q_domain_cap's fixed quota) — exact integer-rank cut, rank and
    // domain size from the SAME single window exchange.
    Entry("q_quality_topp",
      (s, d) => Curriculum.qualityTopPercent(t(s, d, "documents"),
        "text", "doc_id", "source", pct = 30),
      Some(Curriculum.duckQualityTopPercent("documents", "text", "doc_id",
        "source", pct = 30))),

    // Benchmark decontamination: training docs sharing word 3-grams with
    // the held-out eval split (doc_id % 97 = 0). Eval grams broadcast;
    // the corpus side stays narrow until the per-doc count agg.
    Entry("q_decontaminate",
      (s, d) => Decontaminate.overlap(t(s, d, "documents"), "text", "doc_id",
        evalPred = pmod(col("doc_id"), lit(97L)) === 0L, n = 3),
      Some(Decontaminate.duckOverlap("documents", "text", "doc_id",
        evalPredSql = "doc_id % 97 = 0", n = 3))),

    // Per-eval-item CONTAINMENT decontamination: which benchmark item
    // leaked into which training doc, at what gram fraction — the
    // fuzzy tier between exact gram collision and embedding cosine.
    // Threshold 0.02 (r13, was 0.2): the word-salad fixture has no
    // PLANTED eval leakage, so the only hits are chance vocabulary
    // overlap, whose measured max containment at the driver's sf0.01
    // gate is 0.054 — at t=0.2 the gate passed with 0 rows on both
    // engines, verifying nothing (VERDICT r12 #3). t=0.02 compares
    // ~68 rows at sf0.01 (~90 at sf0.001, ~9 k at sf0.1), so the join,
    // the count, and the rounded-ratio filter are all exercised on
    // real rows; the operator's semantics are threshold-independent.
    Entry("q_decontaminate_item",
      (s, d) => Decontaminate.itemContainment(t(s, d, "documents"), "text",
        "doc_id", evalPred = pmod(col("doc_id"), lit(97L)) === 0L,
        n = 3, threshold = 0.02),
      Some(Decontaminate.duckItemContainment("documents", "text", "doc_id",
        evalPredSql = "doc_id % 97 = 0", n = 3, threshold = 0.02))),

    // SEMANTIC decontamination: cosine-vs-eval-set flagging in embedding
    // space (paraphrase leakage has no n-gram collision). τ=0.35 is the
    // fixture's demo near-threshold (FIXTURES.md: max pairwise cosine
    // ≈ 0.5, no planted near-dups).
    Entry("q_decontaminate_emb",
      (s, d) => Decontaminate.embeddingOverlap(t(s, d, "embeddings"),
        "embedding", "vec_id",
        evalPred = pmod(col("vec_id"), lit(97L)) === 0L, threshold = 0.35),
      Some(Decontaminate.duckEmbeddingOverlap("embeddings", "embedding",
        "vec_id", evalPredSql = "vec_id % 97 = 0", threshold = 0.35))),

    // Sub-document exact dedup: 8-token chunks, first-occurrence keeper
    // via ONE chunk-key exchange (C4-style line dedup generalized).
    Entry("q_chunk_dedup",
      (s, d) => ChunkDedup.stats(t(s, d, "documents"), "text", "doc_id",
        chunkTokens = 8),
      Some(ChunkDedup.duckStats("documents", "text", "doc_id",
        chunkTokens = 8))),

    // Boilerplate REMOVAL (C4's "line occurs 3+ times in corpus" rule
    // over 5-word chunks): the rewrite twin of q_chunk_dedup's stats —
    // frequency-thresholded drop set broadcast back as one array row,
    // narrow HOF rewrite, no per-doc re-exchange.
    Entry("q_boilerplate_strip",
      (s, d) => ChunkDedup.stripBoilerplate(t(s, d, "documents"),
        "text", "doc_id", chunkTokens = 5, minDocs = 3),
      Some(ChunkDedup.duckStripBoilerplate("documents", "text", "doc_id",
        chunkTokens = 5, minDocs = 3))),

    // Winnowing (MOSS) shared-passage pairs: window-min k-gram hash
    // selection (density 2/(w+1)) → df-capped fingerprint equi-join.
    // Finds the planted near-dup pairs without banding or O(n²).
    Entry("q_winnow_overlap",
      (s, d) => Winnow.overlapPairs(t(s, d, "documents"), "text", "doc_id",
        k = 4, w = 4, maxDocFreq = 50, minCommon = 3),
      Some(Winnow.duckOverlapPairs("documents", "text", "doc_id",
        k = 4, w = 4, maxDocFreq = 50, minCommon = 3))),

    // The span-family cleaning pass composed end-to-end: boilerplate
    // chunk removal → dup-span cutting on the cleaned text → model
    // quality floor. Stage mirrors nested verbatim in the oracle.
    Entry("q_pipeline_spans",
      (s, d) => Pipeline.curateSpans(t(s, d, "documents"), "text", "doc_id",
        chunkTokens = 5, minDocs = 3, k = 5, minRun = 4, minScore = 0.5),
      Some(Pipeline.duckCurateSpans("documents", "text", "doc_id",
        chunkTokens = 5, minDocs = 3, k = 5, minRun = 4, minScore = 0.5))),

    // The late-round composed recipe: canonical-form exact dedup →
    // classifier floor → LEAKAGE-FREE cluster-aware split → per-split
    // manifest. Proves the new tiers compose end-to-end: near-dups can
    // never straddle train/test in the emitted manifest.
    Entry("q_pipeline_splits",
      (s, d) => Pipeline.curateSplits(t(s, d, "documents"), "text", "doc_id",
        minScore = 0.5, trainPct = 80, valPct = 10, pairMaxDocId = 500),
      Some(Pipeline.duckCurateSplits("documents", "text", "doc_id",
        minScore = 0.5, trainPct = 80, valPct = 10, pairMaxDocId = 500))),

    // ExactSubstr signal (Lee et al. 2022): per-doc duplicated-span
    // coverage via runs of cross-doc-shared 5-grams — join-free
    // (min≠max over the gram window) + gaps-and-islands run lengths.
    Entry("q_dup_span",
      (s, d) => DupSpan.stats(t(s, d, "documents"), "text", "doc_id", k = 5),
      Some(DupSpan.duckStats("documents", "text", "doc_id", k = 5))),

    // The ExactSubstr REWRITE: cut spans covered by >= 4 consecutive
    // shared 5-grams (>= 8 verbatim tokens), reassemble the rest.
    Entry("q_dup_span_strip",
      (s, d) => DupSpan.strip(t(s, d, "documents"), "text", "doc_id",
        k = 5, minRun = 4),
      Some(DupSpan.duckStrip("documents", "text", "doc_id",
        k = 5, minRun = 4))),

    // PII scrub: inject deterministic fake email+phone per row, then
    // count and mask them; the redacted text is fingerprinted so the
    // oracle checks the full transform, not just the counts.
    Entry("q_pii_redact",
      (s, d) => Dedup.rebalance(t(s, d, "documents"))
        .withColumn("_t", Redaction.withSyntheticPii(col("text"), col("doc_id")))
        .select(
          col("doc_id"),
          Redaction.emailCount(col("_t")).as("n_emails"),
          Redaction.phoneCount(col("_t")).as("n_phones"),
          TextAnalysis.fingerprint(Redaction.redact(col("_t"))).as("redacted_fp")),
      Some(s"""SELECT doc_id,
                      ${Redaction.duckEmailCount("t")} AS n_emails,
                      ${Redaction.duckPhoneCount("t")} AS n_phones,
                      ${TextAnalysis.duckFingerprint(Redaction.duckRedact("t"))} AS redacted_fp
               FROM (SELECT doc_id, ${Redaction.duckWithSyntheticPii("text", "doc_id")} AS t
                     FROM documents) d""")),

    // Deterministic 80/10/10 split assignment (hash-bucket of the id),
    // audited per source — reproducible across engines and runs.
    Entry("q_split_assign",
      (s, d) => Splits.splitCounts(t(s, d, "documents"), "doc_id", "source",
        trainPct = 80, valPct = 10),
      Some(Splits.duckSplitCounts("documents", "doc_id", "source",
        trainPct = 80, valPct = 10))),

    // CLUSTER-AWARE (leakage-free) split: near-duplicate docs must land
    // in the same split, so the split hash runs over each doc's CC
    // cluster representative — a near-dup pair straddling train/test is
    // eval contamination. Pairs bounded like q_dedup_resolve (the
    // production route feeds LSH pairs); oracle = recursive closure +
    // the same representative-keyed hash.
    Entry("q_cluster_split",
      (s, d) => {
        val docs = t(s, d, "documents")
        val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
          n = 3, threshold = 0.5, maxDocId = 500)
        Splits.clusterSplit(docs, pairs, "doc_id", trainPct = 80, valPct = 10)
      },
      Some(Splits.duckClusterSplitNgram("documents", "text", "doc_id",
        n = 3, threshold = 0.5, maxDocId = 500, trainPct = 80, valPct = 10))),

    // Neyman optimal allocation of a 1000-doc labeling budget across
    // sources: n_h ∝ N_h·σ_h (size × length-spread) — minimum-variance
    // stratified sampling, one exact-moment pass + a stratum-sorted
    // denominator fold.
    Entry("q_neyman",
      (s, d) => Splits.neymanAllocation(t(s, d, "documents"), "source",
        "n_chars", budget = 1000L),
      Some(Splits.duckNeymanAllocation("documents", "source", "n_chars",
        budget = 1000L))),

    // Per-language stratified downsampling to target mixture rates,
    // audited: totals vs deterministic hash-sampled counts.
    Entry("q_stratified_sample",
      (s, d) => Splits.sampleAudit(t(s, d, "documents"), "doc_id", "lang",
        rates = MixtureRates),
      Some(Splits.duckSampleAudit("documents", "doc_id", "lang",
        rates = MixtureRates))),

    // Concat-and-chunk sequence packing into 512-token context windows,
    // per source (one low-cardinality exchange; no global sort).
    Entry("q_seq_pack",
      (s, d) => Packing.assign(t(s, d, "documents"), "text", "doc_id",
        groupCol = "source", ctxLen = 512),
      Some(Packing.duckAssign("documents", "text", "doc_id",
        groupCol = "source", ctxLen = 512))),

    // Overlapping passage chunking (RAG/embedding prep): 32-token
    // windows every 24 tokens, last window clamped, one-window docs
    // yield one passage. Pure narrow Generate + slice — no shuffle.
    Entry("q_passage_chunk",
      (s, d) => Packing.passages(t(s, d, "documents"), "text", "doc_id",
        windowTokens = 32, stride = 24),
      Some(Packing.duckPassages("documents", "text", "doc_id",
        windowTokens = 32, stride = 24))),

    // Deterministic per-epoch shuffle: epoch-salted fingerprint order
    // within (epoch, shard) — reproducible loader order, shard-local
    // sorts only (never a global per-epoch sort).
    Entry("q_epoch_shuffle",
      (s, d) => Splits.epochShuffle(
        t(s, d, "documents").filter(col("doc_id") < 200), "doc_id",
        epochs = 3, nShards = 4),
      Some(Splits.duckEpochShuffle("(SELECT * FROM documents WHERE doc_id < 200)",
        "doc_id", epochs = 3, nShards = 4))),

    // Zipf-law fit of the term distribution (corpus-health profiling):
    // OLS of ln(freq) on ln(rank) over the top terms, every fp sum a
    // rank-sorted left fold so both engines add in identical order.
    Entry("q_zipf_fit",
      (s, d) => Zipf.fit(t(s, d, "documents"), "text", topN = 30),
      Some(Zipf.duckFit("documents", "text", topN = 30))),

    // Heaps'-law vocabulary growth over 10 id-range corpus prefixes —
    // "how much new vocabulary does the next slice of crawl buy". The
    // sequential new-word scan is replaced by one token-keyed MIN
    // (first bucket) aggregate + a 10-row prefix sum; the ln-ln OLS
    // runs as bucket-ordered left folds (the q_zipf_fit convention).
    Entry("q_heaps_law",
      (s, d) => Zipf.heapsFit(t(s, d, "documents"), "text", "doc_id",
        nBuckets = 10),
      Some(Zipf.duckHeapsFit("documents", "text", "doc_id",
        nBuckets = 10))),

    // Corpus mean-IDF (rare-word) score per document: one term-key
    // exchange for document frequencies, term join back, per-doc
    // SORTED left fold so the double sum is order-deterministic.
    Entry("q_idf_score",
      (s, d) => Idf.docScores(t(s, d, "documents"), "text", "doc_id"),
      Some(Idf.duckDocScores("documents", "text", "doc_id"))),

    // The composed CURATION pipeline end-to-end: Gopher filter →
    // decontaminate → chunk-dedup gate → deterministic split →
    // sequence packing. Oracle composes the stage oracles.
    Entry("q_pipeline_curate",
      (s, d) => Pipeline.curateCorpus(t(s, d, "documents"), "text", "doc_id",
        evalPred = pmod(col("doc_id"), lit(97L)) === 0L),
      Some(Pipeline.duckCurateCorpus("documents", "text", "doc_id",
        evalPredSql = "doc_id % 97 = 0"))),

    // HyperLogLog distinct-user sketch per event type next to the exact
    // answer — fixed-size registers, map-side-combinable max(rho), no
    // raw-key countDistinct shuffle. Both estimator branches exercised.
    Entry("q_hll_distinct",
      (s, d) => Sketches.hllDistinct(t(s, d, "events"), "user_id", "event_type"),
      Some(Sketches.duckHllDistinct(EvOracle, "user_id", "event_type"))),

    // Single-pass column profiler (deequ-style): every metric for every
    // profiled column from ONE aggregate (multi-distinct plans as a
    // single Expand pass), report rows via stack over the 1-row result.
    Entry("q_profile",
      (s, d) => Profile.profile(t(s, d, "documents"),
        numCols = Seq("doc_id", "n_chars"), strCols = Seq("text", "lang", "source")),
      Some(Profile.duckProfile("documents",
        numCols = Seq("doc_id", "n_chars"), strCols = Seq("text", "lang", "source")))),

    // Expectation checks — the pre-commit corpus quality gate: min row
    // count, key uniqueness, per-column null-fraction ceilings; same
    // one-aggregate shape.
    Entry("q_expectations",
      (s, d) => Profile.expectations(t(s, d, "documents"), keyCol = "doc_id",
        nullBoundedCols = Seq("text", "lang"), minRows = 100L, maxNullFraction = 0.01),
      Some(Profile.duckExpectations("documents", keyCol = "doc_id",
        nullBoundedCols = Seq("text", "lang"), minRows = 100L, maxNullFraction = 0.01))),

    // Streaming per-group quantiles via the GK sketch (percentile_approx):
    // bounded mergeable state vs q_len_quantiles' exact sort. Below the
    // accuracy bound the rank is exact, so the oracle compares the same
    // discrete order statistics bitwise (quantile_disc).
    // SCOPE BOUND (r11, widened r12, made per-SF r13): sf0.1's ~20 k-row
    // groups drifted the GK ranks by ±2 (the one red row of the r11
    // full-sf0.1 pass). Empirically Spark's percentile_approx is
    // rank-EXACT while group n ≤ accuracy/2 (5 000 at the default
    // 10 000 — the summary's compression threshold, measured: 4 898/
    // 4 905-row groups bitwise, 5 020+ drifted). r12 hard-coded % 64 at
    // every SF to fit sf1.0, which shrank sf0.1's coverage 8× (ADVICE
    // r12); the modulus is now DERIVED FROM THE FIXTURE'S EVENTS COUNT
    // on BOTH engines (identical tiering → identical slice): ≤200 k
    // rows → % 8 (sf0.1: ~2.5 k/group, the original coverage), ≤2 M →
    // % 64 (sf1.0: ~3.1 k/group), else % 512 (sf10: ~3.9 k/group) —
    // every tier inside the exact envelope, the sketch's accuracy
    // parameter honest at all SFs.
    Entry("q_quantile_sketch",
      (s, d) => {
        val ev = t(s, d, "events")
        // footer-metadata tier probe, not a Spark count job (r15)
        val n = FixtureProbe.rowCount(s, d, "events")
        val m = if (n <= 200000L) 8 else if (n <= 2000000L) 64 else 512
        Sketches.quantileSketch(
          ev.filter(pmod(col("event_id"), lit(m)) === 0),
          "value", "event_type")
      },
      Some(Sketches.duckQuantileSketch(
        s"(SELECT * FROM $EvOracle e WHERE event_id % " +
          "(CASE WHEN (SELECT count(*) FROM events) <= 200000 THEN 8 " +
          "WHEN (SELECT count(*) FROM events) <= 2000000 THEN 64 " +
          "ELSE 512 END) = 0)",
        "value", "event_type"))),

    // Count-min heavy hitters over document tokens: 3×256-cell sketch
    // built in one map-side-combined agg; top-20 exact tokens get their
    // (always ≥ exact) CMS point estimate via a broadcast cell lookup.
    Entry("q_cms_topk",
      (s, d) => Sketches.cmsHeavyHitters(t(s, d, "documents"), "text", k = 20),
      Some(Sketches.duckCmsHeavyHitters("documents", "text", k = 20))),

    // TF-IDF cosine document pairs over an inverted-index join with
    // df-pruned vocabulary (sparse-vector complement to embedding LSH).
    Entry("q_tfidf_pairs",
      (s, d) => TfidfSim.pairs(t(s, d, "documents"), "text", "doc_id",
        minCos = 0.25),
      Some(TfidfSim.duckPairs("documents", "text", "doc_id", minCos = 0.25))),

    // Trailing 7-day rolling counts per event type: one event-sized
    // exchange (the daily agg); the RANGE window runs over calendar-
    // bounded rows.
    Entry("q_rolling_daily",
      (s, d) => Rolling.dailyCounts(t(s, d, "events"), "ts", "event_type"),
      Some(Rolling.duckDailyCounts(EvOracle, "ts", "event_type"))),

    // Perceptual (average) hash over the opaque media payload — the
    // image-dedup feature extractor on the decodeBatch plumbing.
    Entry("q_mm_phash",
      (s, d) => Multimodal.perceptualHash(
        Multimodal.attachBinary(t(s, d, "documents"), "text"), "doc_id"),
      Some(Multimodal.duckPerceptualHash("documents", "text", "doc_id"))),

    // Media near-dup: 32-bit perceptual hashes joined at hamming ≤ 3 via
    // pigeonhole banding (4 exact 8-bit chunks — the SimHash machinery
    // generalized by Dedup.hammingPairs); the oracle is the exact
    // all-pairs hamming join, which the banded engine must reproduce
    // row-for-row since chunk recall is exact.
    // SCOPE BOUND (r12): sliced at doc_id < 5000 on BOTH sides — a
    // no-op at every shipped SF (≤ 5000 docs), and at sf1.0 it keeps
    // the gate inside the complete-pairs regime: the 32-bit aHash
    // key-space saturates on the low-entropy synthetic payloads
    // (documented in BASELINE.md), identical-hash groups blow past
    // AllPairsGroupCap, and the engine's star expansion (the designed
    // skew guard) then legitimately diverges from the exact quadratic
    // oracle (7.6 M vs 9.7 M pairs measured at 50 k docs).
    Entry("q_mm_phash_dedup",
      (s, d) => Multimodal.phashNearDup(
        Multimodal.attachBinary(
          t(s, d, "documents").filter(col("doc_id") < 5000), "text"),
        "doc_id", maxHamming = 3),
      Some(Multimodal.duckPhashNearDup(
        "(SELECT * FROM documents WHERE doc_id < 5000)", "text", "doc_id",
        maxHamming = 3))),

    // Bloom-filter semi-join pruning: 512-byte bitset over the filtered
    // customer keys prunes the orders scan with a narrow bit-test — no
    // exchange before pruning; audit row counts candidates vs members.
    Entry("q_bloom_prune",
      (s, d) => BloomPrune.pruneAudit(
        t(s, d, "orders"), "o_custkey",
        t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING"),
        "c_custkey"),
      Some(BloomPrune.duckPruneAudit(
        "orders", "o_custkey",
        "(SELECT * FROM customer WHERE c_mktsegment = 'BUILDING')",
        "c_custkey"))),

    // Salted skew join: lineitem ⋈ part on l_partkey spread over 8
    // salts under a shuffle_hash hint; the oracle is the UNSALTED join
    // — salting must be invisible in the result.
    Entry("q_skew_join",
      (s, d) => SkewJoin.salted(
          t(s, d, "lineitem"),
          t(s, d, "part").select(col("p_partkey").as("l_partkey"), col("p_brand")),
          key = "l_partkey", saltSrcCol = "l_orderkey", nSalt = 8)
        .groupBy(col("p_brand"))
        .agg(
          sum(col("l_extendedprice").cast("decimal(18,2)") *
              (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items")),
      Some("""SELECT p_brand,
                     CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                              (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
                     count(*) AS n_items
              FROM lineitem JOIN part ON l_partkey = p_partkey
              GROUP BY p_brand""")),

    // CCNet-style bigram-LM perplexity scoring: count-based LM with
    // add-one smoothing, per-doc mean negative log-prob via a sorted
    // fold. The LM count tables are vocabulary-sized hash aggregates.
    Entry("q_perplexity",
      (s, d) => Perplexity.docScores(t(s, d, "documents"), "text", "doc_id"),
      Some(Perplexity.duckDocScores("documents", "text", "doc_id"))),

    // Temperature (α=0.5) mixture weights per source: sqrt-proportional
    // sampling weights, normalized by a sorted fold over the tiny
    // per-source aggregate.
    Entry("q_mixture_weights",
      (s, d) => Splits.mixtureWeights(t(s, d, "documents"), "text", "source"),
      Some(Splits.duckMixtureWeights("documents", "text", "source"))),

    // Temperature-scaled mixture RESAMPLING: τ=0.5 target shares applied
    // as deterministic per-source Bernoulli keeps (integer basis points
    // vs the id's Rabin–Karp bucket) under a 60%-of-tokens budget. The
    // rate table broadcasts back; the corpus is never shuffled.
    Entry("q_mixture_sample",
      (s, d) => Splits.temperatureSample(t(s, d, "documents"),
        "text", "source", "doc_id", targetFrac = 0.6),
      Some(Splits.duckTemperatureSample("documents", "text", "source",
        "doc_id", targetFrac = 0.6))),

    // TOKEN-weighted quality quantiles per language — the median TOKEN's
    // quality, not the median document's (doc-weighted stats mislead
    // when length correlates with quality). All-integer weighted-rank
    // cuts over one lang-keyed cumulative window.
    Entry("q_token_quantiles",
      (s, d) => Profile.tokenWeightedQuantiles(t(s, d, "documents"),
        "text", "doc_id", "lang"),
      Some(Profile.duckTokenWeightedQuantiles("documents", "text",
        "doc_id", "lang"))),

    // EXACT per-language length quantiles (linear interpolation — the
    // corpus-profiling stat sheet). Exact `percentile` sorts within
    // each group; fine at lang cardinality. Both engines interpolate
    // lower + frac·(higher − lower); round(6) seals the last ulp.
    Entry("q_len_quantiles",
      (s, d) => t(s, d, "documents").groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          round(expr("percentile(n_chars, 0.5D)"), 6).as("p50"),
          round(expr("percentile(n_chars, 0.9D)"), 6).as("p90"),
          round(expr("percentile(n_chars, 0.99D)"), 6).as("p99")),
      Some("""SELECT lang, count(*) AS n_docs,
                     round(quantile_cont(n_chars, 0.5), 6) AS p50,
                     round(quantile_cont(n_chars, 0.9), 6) AS p90,
                     round(quantile_cont(n_chars, 0.99), 6) AS p99
              FROM documents GROUP BY lang""")),

    // KMV (bottom-k) shingle-set sketches per source + pairwise overlap
    // estimation: the mergeable "does crawl A overlap crawl B" sketch.
    // SKETCH-ONLY — the production estimator never pays the exact
    // intersection; that audit is the separate bounded q_kmv_exact.
    Entry("q_kmv_jaccard",
      (s, d) => Sketches.kmvSourceJaccard(t(s, d, "documents"), "text", "source"),
      Some(Sketches.duckKmvSourceJaccard("documents", "text", "source"))),

    // Exact cross-source shingle overlap: the ground-truth twin the KMV
    // sketch replaces at scale — a shingle-hash self-join, quadratic in
    // overlap, so BOUNDED to doc_id < 2000 (the q_dedup_ngram_jaccard
    // pattern).
    Entry("q_kmv_exact",
      (s, d) => Sketches.exactSourceOverlap(
        t(s, d, "documents").filter(col("doc_id") < 2000), "text", "source"),
      Some(Sketches.duckExactSourceOverlap(
        "(SELECT * FROM documents WHERE doc_id < 2000)", "text", "source"))),

    // PMI collocation mining over adjacent word pairs (phrase-vocabulary
    // seeding): vocabulary-sized count tables, support-pruned scoring
    // joins, one ln() per surviving bigram.
    Entry("q_pmi_colloc",
      (s, d) => Collocations.pmiPairs(t(s, d, "documents"), "text", minCount = 5L),
      Some(Collocations.duckPmiPairs("documents", "text", minCount = 5L))),

    // Multi-dimensional corpus rollup: CUBE over (lang, source) in one
    // pass — per-cell, per-lang, per-source, and grand totals from a
    // single partial-agg expansion (no four separate scans). Counts stay
    // integral; rollup nulls are disambiguated to 'ALL'.
    Entry("q_cube_stats",
      (s, d) => t(s, d, "documents")
        .cube(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
        .select(
          coalesce(col("lang"), lit("ALL")).as("lang"),
          coalesce(col("source"), lit("ALL")).as("source"),
          col("n_docs"), col("total_chars")),
      Some("""SELECT coalesce(lang, 'ALL') AS lang,
                     coalesce(source, 'ALL') AS source,
                     count(*) AS n_docs,
                     CAST(sum(n_chars) AS BIGINT) AS total_chars
              FROM documents GROUP BY CUBE (lang, source)""")),

    // Deterministic exact-k per-stratum sample (fixed eval-set carve-out):
    // the k smallest doc-id fingerprints per language. The rank-1..k
    // filter plans as WindowGroupLimit — partial top-k map-side, no full
    // per-group sort, and re-running on a grown corpus keeps prior picks
    // stable unless displaced by a smaller hash.
    Entry("q_group_sample",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        t(s, d, "documents")
          .select(col("lang"), col("doc_id"),
            TextAnalysis.fingerprint(col("doc_id").cast("string")).as("pri"))
          .withColumn("rk", row_number().over(
            Window.partitionBy("lang").orderBy(col("pri"), col("doc_id"))))
          .filter(col("rk") <= 10)
          // row_number() is IntegerType in Spark, BIGINT in DuckDB.
          .withColumn("rk", col("rk").cast("long"))
          .select("lang", "rk", "doc_id", "pri")
      },
      Some(s"""SELECT lang, rk, doc_id, pri FROM (
                 SELECT lang, doc_id,
                        (${TextAnalysis.duckFingerprint("CAST(doc_id AS VARCHAR)")}) AS pri,
                        row_number() OVER (PARTITION BY lang ORDER BY
                          (${TextAnalysis.duckFingerprint("CAST(doc_id AS VARCHAR)")}), doc_id) AS rk
                 FROM documents) WHERE rk <= 10""")),

    // Incremental (index) dedup: screen the "new batch" fifth of the
    // corpus against the rest via asymmetric MinHash banding — the
    // continuous-ingestion pattern where the corpus index is precomputed
    // and per-run cost is O(batch). Oracle is the exact batch×corpus
    // Jaccard ground truth: the LSH route must reproduce it exactly on
    // the gated scope (100%-recall equality gate, like the other LSH
    // gates).
    Entry("q_incr_dedup",
      (s, d) => {
        val docs = t(s, d, "documents").filter(col("doc_id") < 1500)
        Dedup.indexDedup(
          corpus = docs.filter(pmod(col("doc_id"), lit(5L)) =!= 0L),
          batch = docs.filter(pmod(col("doc_id"), lit(5L)) === 0L),
          "text", "doc_id", n = 3, bands = 42, rowsPerBand = 3,
          threshold = 0.5)
      },
      Some(Dedup.duckIndexDedup("documents", "text", "doc_id", n = 3,
        threshold = 0.5,
        batchPred = "doc_id < 1500 AND doc_id % 5 = 0",
        corpusPred = "doc_id < 1500 AND doc_id % 5 <> 0"))),

    // Cross-document duplicated-n-gram fraction (MassiveText/RefinedWeb
    // boilerplate signal): vocabulary-sized shingle-df aggregate, one
    // join back, integral counts until the output division.
    Entry("q_ngram_novelty",
      (s, d) => Novelty.crossDocDupFraction(t(s, d, "documents"), "text",
        "doc_id", n = 3),
      Some(Novelty.duckCrossDocDupFraction("documents", "text", "doc_id",
        n = 3))),

    // BM25 topical scoring of every document against a fixed query-term
    // set (quality-targeted corpus selection). One scan + one 1-row
    // broadcast of the corpus constants — no explode, no per-term shuffle.
    Entry("q_bm25",
      (s, d) => Bm25.score(t(s, d, "documents"), "text", "doc_id",
        BmTerms),
      Some(Bm25.duckScore("documents", "text", "doc_id", BmTerms))),

    // Ranking-quality nDCG@20 of the BM25 ordering against AND-match
    // binary relevance: ranks decided on the 6dp-rounded score (both
    // engines order identical values), DCG/IDCG are integer lookups
    // into inlined micro-discount tables — no cross-rank float sums.
    Entry("q_ndcg",
      (s, d) => {
        val docs = t(s, d, "documents")
        val sc = Bm25.score(docs, "text", "doc_id", BmTerms)
          .select(col("doc_id"), col("bm25"))
        val truth = docs
          .withColumn("_w", TextAnalysis.tokens(lower(col("text"))))
          .filter(BmTerms.map(tm =>
            TextAnalysis.wordCountOf(col("_w"), tm) > 0).reduce(_ && _))
          .select(col("doc_id"))
        Eval.ndcgAtK(sc, "doc_id", "bm25", truth, "doc_id", k = 20)
      },
      Some(Eval.duckNdcgAtK(
        s"SELECT doc_id, bm25 FROM (${Bm25.duckScore("documents", "text",
          "doc_id", BmTerms)})",
        "doc_id", "bm25",
        s"""SELECT doc_id
            FROM (SELECT *, ${TextAnalysis.duckTokensBind("lower(text)")} AS w
                  FROM documents) d
            WHERE ${BmTerms.map(tm =>
              s"${TextAnalysis.duckWordCount(tm)} > 0").mkString(" AND ")}""",
        "doc_id", k = 20))),

    // BM25 through a PERSISTENT INVERTED INDEX (the lexical sibling of
    // q_ann_pq_saved): term-sorted postings + doclen + df + stats built
    // once to parquet, then the query scored from the index WITHOUT
    // re-tokenizing the corpus — the postings read prunes to the query
    // terms' row groups. Same oracle as q_bm25: both physical shapes
    // must produce bitwise-identical scores.
    Entry("q_bm25_indexed",
      (s, d) => {
        val dir = TempDirs.create("graft-bm25-index").toString
        Bm25.buildIndex(t(s, d, "documents"), "text", "doc_id", dir)
        Bm25.scoreFromIndex(s, dir, BmTerms)
      },
      Some(Bm25.duckScore("documents", "text", "doc_id", BmTerms))),

    // INCREMENTAL BM25 index: build on the first half, APPEND the rest
    // as an additive segment (O(batch) LSM posture — no rewrite), then
    // score — must equal the full-corpus scorer bitwise (the
    // however-produced-equals-full-rebuild IVM discipline, extended to
    // the retrieval family next to q_ann_ivf_incr).
    Entry("q_bm25_incr",
      (s, d) => {
        val dir = TempDirs.create("graft-bm25-incr").toString
        val docs = t(s, d, "documents")
        Bm25.buildIndex(docs.filter(col("doc_id") < 250), "text", "doc_id", dir)
        Bm25.appendToIndex(docs.filter(col("doc_id") >= 250), "text", "doc_id", dir)
        Bm25.scoreFromIndex(s, dir, BmTerms)
      },
      Some(Bm25.duckScore("documents", "text", "doc_id", BmTerms))),

    // BM25 from a PREBUILT index — the amortized read path
    // q_bm25_indexed pays build cost to prove: the index is built once
    // per JVM (artifactCache) and every invocation after the first is
    // pure query-side (postings pruned to the query terms). Same
    // oracle as q_bm25/q_bm25_indexed — three physical shapes, one
    // answer.
    Entry("q_bm25_saved",
      (s, d) => {
        val dir = artifactDir(s"bm25|$d") { dir =>
          Bm25.buildIndex(t(s, d, "documents"), "text", "doc_id", dir)
        }
        Bm25.scoreFromIndex(s, dir, BmTerms)
      },
      Some(Bm25.duckScore("documents", "text", "doc_id", BmTerms))),

    // Hybrid retrieval: BM25 + embedding-cosine rankings fused by
    // Reciprocal Rank Fusion (K=60, rank-cutoff variant). Each side's
    // true global top-100 comes from the bounded-heap aggregate (no
    // corpus sort); fusion arithmetic is integer-rank reciprocals, so
    // the gate is float-drift-proof by construction.
    Entry("q_hybrid_rank",
      (s, d) => Hybrid.rrfRetrieve(t(s, d, "documents"), t(s, d, "embeddings"),
        "text", "doc_id", "embedding", "vec_id",
        terms = BmTerms, queryVecId = 0L, kPerSide = 100, kOut = 50),
      Some(Hybrid.duckRrfRetrieve("documents", "embeddings",
        "text", "doc_id", "embedding", "vec_id",
        terms = BmTerms, queryVecId = 0L, kPerSide = 100, kOut = 50))),

    // Daily event-type activity matrix (relational pivot with LITERAL
    // type values — one partial-agg exchange, no distinct-discovery scan).
    Entry("q_event_pivot",
      (s, d) => EventStats.pivotDaily(t(s, d, "events"), "ts", "event_type",
        PivotTypes),
      Some(EventStats.duckPivotDaily(EvOracle, "ts", "event_type",
        PivotTypes))),

    // Trailing-7-day z-score anomaly detection on the per-type daily
    // series: two exchanges, both at (day × type) cardinality.
    Entry("q_event_anomaly",
      (s, d) => EventStats.anomalyZscores(t(s, d, "events"), "ts",
        "event_type", win = 7),
      Some(EventStats.duckAnomalyZscores(EvOracle, "ts", "event_type",
        win = 7))),

    // Weekly seasonality strength (day-of-week variance decomposition)
    // per event type: one corpus exchange to daily counts, then a
    // type-cardinality aggregate whose cross-dow folds are fixed
    // 7-column chains (bit-deterministic doubles, no float groupBy).
    Entry("q_seasonality",
      (s, d) => EventStats.weeklySeasonality(t(s, d, "events"), "ts",
        "event_type"),
      Some(EventStats.duckWeeklySeasonality(EvOracle, "ts", "event_type"))),

    // Circadian concentration per type: mean resultant length of the
    // hour-of-day distribution via inlined µ-quantized trig tables (no
    // query-time trig, no libm divergence) + integer-argmax peak hour.
    Entry("q_circadian",
      (s, d) => EventStats.circadianProfile(t(s, d, "events"), "ts",
        "event_type"),
      Some(EventStats.duckCircadianProfile(EvOracle, "ts", "event_type"))),

    // Partial autocorrelation (Durbin–Levinson) of the per-type daily
    // series at lags 1..5: stationary ACF from exact integer moments,
    // recursion unrolled with identical sum order in both engines —
    // the AR-order diagnostic next to q_event_acf.
    Entry("q_pacf",
      (s, d) => EventStats.dailyPacf(t(s, d, "events"), "ts",
        "event_type", maxLag = 5),
      Some(EventStats.duckDailyPacf(EvOracle, "ts", "event_type",
        maxLag = 5))),

    // Theil–Sen robust trend per event type: median of all pairwise
    // daily slopes — pairs and the exact median live on the days-sized
    // series only.
    Entry("q_theil_sen",
      (s, d) => EventStats.theilSen(t(s, d, "events"), "ts", "event_type"),
      Some(EventStats.duckTheilSen(EvOracle, "ts", "event_type"))),

    // Benford first-digit audit on order amounts: integer-cents leading
    // digits vs inlined micro-quantized Benford expectations, χ² from
    // µ-quantized terms — one 9-group aggregate.
    Entry("q_benford",
      (s, d) => Profile.benford(t(s, d, "lineitem"), "l_extendedprice"),
      Some(Profile.duckBenford("lineitem", "l_extendedprice"))),

    // Kaplan–Meier survival over user lifetimes (censoring-aware
    // retention): one user-keyed exchange; the KM estimator runs
    // wholly on the duration histogram in log-space micro-nats.
    Entry("q_survival",
      (s, d) => Survival.kaplanMeier(t(s, d, "events"), "user_id", "ts",
        horizonDays = 7),
      Some(Survival.duckKaplanMeier(EvOracle, "user_id", "ts",
        horizonDays = 7))),

    // Robust median/MAD outlier summary on the same daily series — the
    // heavy-tail-safe twin of the z-score gate (exact interpolated
    // medians are holistic only over the days-sized series).
    Entry("q_mad_outliers",
      (s, d) => EventStats.madOutliers(t(s, d, "events"), "ts",
        "event_type"),
      Some(EventStats.duckMadOutliers(EvOracle, "ts", "event_type"))),

    // Bivariate Mahalanobis outliers: line items whose (quantity,
    // price) pair is jointly impossible even when each axis is
    // unremarkable — closed-form 2×2 Σ⁻¹ so both engines mirror the
    // expression bit-for-bit; one 6-number moment aggregate broadcast
    // back, narrow scoring, TakeOrdered top-k.
    Entry("q_mahalanobis",
      (s, d) => Outliers.mahalanobis2(
        t(s, d, "lineitem").select(
          (col("l_orderkey") * 8L + col("l_linenumber")).as("line_id"),
          col("l_quantity"), col("l_extendedprice")),
        "line_id", "l_quantity", "l_extendedprice", topK = 100),
      Some(Outliers.duckMahalanobis2(
        "(SELECT l_orderkey * 8 + l_linenumber AS line_id, l_quantity, l_extendedprice FROM lineitem)",
        "line_id", "l_quantity", "l_extendedprice", topK = 100))),

    // Leave-one-out target encoding of event_type against value — the
    // self-leak-free categorical encoder: per-category exact DECIMAL
    // sums broadcast back, one row-side division.
    Entry("q_target_encode",
      (s, d) => Features.targetEncodeLoo(t(s, d, "events"), "event_id",
        "event_type", "value"),
      Some(Features.duckTargetEncodeLoo(EvOracle, "event_id",
        "event_type", "value"))),

    // Regression-eval metrics (RMSE/MAE/R² = ANOVA η²) of the
    // per-type conditional-mean predictor — the in-sample fit audit of
    // q_target_encode's encoder: exact µ-integer moments per type,
    // category-sorted left folds for the handful of group terms.
    Entry("q_reg_metrics",
      (s, d) => Eval.regressionMetrics(t(s, d, "events"),
        "event_type", "value"),
      Some(Eval.duckRegressionMetrics(EvOracle, "event_type", "value"))),

    // Split-conformal calibration audit: q̂ as an exact integer-rank
    // order statistic of hash-split calibration residuals, coverage of
    // ±q̂ on the held-out rows — both computed on the distinct-residual
    // table after one corpus exchange.
    Entry("q_conformal",
      (s, d) => Eval.conformalCoverage(t(s, d, "events"), "event_id",
        "event_type", "value", calPct = 50, alphaPct = 10),
      Some(Eval.duckConformalCoverage(EvOracle, "event_id",
        "event_type", "value", calPct = 50, alphaPct = 10))),

    // Holt double-exponential smoothing: per-type level + trend with a
    // one-step-ahead forecast — the capacity-planning line next to
    // q_ewma's level-only tracker; day-sorted left fold, op order
    // mirrored in the recursive-CTE oracle.
    Entry("q_holt",
      (s, d) => EventStats.holtDaily(t(s, d, "events"), "ts",
        "event_type", alpha = 0.5, beta = 0.3),
      Some(EventStats.duckHoltDaily(EvOracle, "ts", "event_type",
        alpha = 0.5, beta = 0.3))),

    // Exact per-type trimmed/winsorized means at 5% — robust location
    // next to q_mad_outliers' robust dispersion: integer partial-
    // inclusion at the cut ranks over the per-type distinct-value
    // table, no float rank interpolation.
    Entry("q_trimmed",
      (s, d) => EventStats.trimmedStats(t(s, d, "events"), "event_type",
        "value", trimPct = 5),
      Some(EventStats.duckTrimmedStats(EvOracle, "event_type", "value",
        trimPct = 5))),

    // Welch two-sample t-test: purchase vs click order values — the
    // A/B-experiment decision statistic. One 6-sum map-side aggregate
    // (exact DECIMAL sums of micro-units and their squares); t/df are
    // one closed-form double expression mirrored op-for-op in the
    // oracle.
    Entry("q_ttest_welch",
      (s, d) => Hypothesis.welchTTest(t(s, d, "events"), "value",
        "event_type", "purchase", "click"),
      Some(Hypothesis.duckWelchTTest(EvOracle, "value", "event_type",
        "purchase", "click"))),

    // Chi-squared independence (lang × source) with Cramér's V: absent
    // contingency cells materialized by crossing the dimension-sized
    // key sets; per-cell contributions re-quantize to micro-integers so
    // the cross-cell sum is order-independent.
    Entry("q_chi2",
      (s, d) => Hypothesis.chiSquared(t(s, d, "documents"), "lang",
        "source"),
      Some(Hypothesis.duckChiSquared("documents", "lang", "source"))),

    // Two-sample Kolmogorov–Smirnov: purchase vs view value
    // distributions — all-integer ECDF gap (max |cumA·nB − cumB·nA| in
    // exact DECIMAL) over the distinct-micro-value table, one final
    // division.
    Entry("q_ks_test",
      (s, d) => Hypothesis.ksTest(t(s, d, "events"), "value",
        "event_type", "purchase", "view"),
      Some(Hypothesis.duckKsTest(EvOracle, "value", "event_type",
        "purchase", "view"))),

    // CUPED variance reduction: per-user pre-period value (before the
    // cutoff) as covariate for the post-period metric — θ, var(y),
    // var(ŷ), and the removed-variance share, all from ONE 6-moment
    // exact-DECIMAL aggregate over the user table.
    Entry("q_cuped",
      (s, d) => Hypothesis.cuped(t(s, d, "events"), "user_id", "ts",
        "value", splitMs = EvCutoffMs),
      Some(Hypothesis.duckCuped(EvOracle, "user_id", "ts", "value",
        splitMs = EvCutoffMs))),

    // Simpson's-paradox audit: pooled vs within-language association
    // between a source slice and a length outcome — the
    // aggregation-bias alarm for observational corpus comparisons
    // (exact 2×2×S cells from ONE stratum aggregate; µ-quantized
    // mirrored diffs; sign-flip census vs the pooled direction).
    Entry("q_simpson",
      (s, d) => Hypothesis.simpsonAudit(t(s, d, "documents"), "lang",
        "source < 'src2'", "n_chars > 900"),
      Some(Hypothesis.duckSimpsonAudit("documents", "lang",
        "source < 'src2'", "n_chars > 900"))),

    // Poisson-bootstrap CI for the mean account balance: 40 replicates
    // from ONE pass with 80 running sums (deterministic per-row
    // Poisson(1) weights — no row duplication, no corpus shuffle);
    // CI bounds are exact order statistics of µ-integer replicate means.
    Entry("q_bootstrap_ci",
      (s, d) => Hypothesis.poissonBootstrap(t(s, d, "customer"),
        "c_custkey", "c_acctbal", reps = 40, alphaPct = 5),
      Some(Hypothesis.duckPoissonBootstrap("customer", "c_custkey",
        "c_acctbal", reps = 40, alphaPct = 5))),

    // Difference-in-differences over the deterministic 50/50 user
    // split: treated-group post−pre change net of the control group's —
    // four cells from ONE ungrouped exact-DECIMAL aggregate.
    Entry("q_did",
      (s, d) => Hypothesis.diffInDiff(t(s, d, "events"), "user_id", "ts",
        "value", splitMs = EvCutoffMs),
      Some(Hypothesis.duckDiffInDiff(EvOracle, "user_id", "ts", "value",
        splitMs = EvCutoffMs))),

    // Stratified ATT: treated-vs-control post-period means matched
    // within pre-activity log₂ strata, weighted by the treated share —
    // the observational-matching member of the causal family (common
    // support enforced, off-support mass reported).
    Entry("q_att",
      (s, d) => Hypothesis.stratifiedAtt(t(s, d, "events"), "user_id",
        "ts", "value", splitMs = EvCutoffMs),
      Some(Hypothesis.duckStratifiedAtt(EvOracle, "user_id", "ts",
        "value", splitMs = EvCutoffMs))),

    // Sample-ratio-mismatch: distinct users per assignment bucket vs
    // uniform, goodness-of-fit χ² flagged at the χ²₁(α=0.001) critical
    // value — the assignment-health check that gates every experiment
    // read.
    Entry("q_srm",
      (s, d) => Hypothesis.srmCheck(t(s, d, "events"), "user_id",
        nBuckets = 2, crit = 10.828),
      Some(Hypothesis.duckSrmCheck(EvOracle, "user_id",
        nBuckets = 2, crit = 10.828))),

    // Schema-on-read JSON property extraction + per-type aggregation
    // (from_json with a declared schema — codegen'd, no UDF).
    Entry("q_event_props",
      (s, d) => EventStats.jsonPropStats(t(s, d, "events"), "props",
        "event_type"),
      Some(EventStats.duckJsonPropStats(EvOracle, "props", "event_type"))),

    // DSIR-style hashed-n-gram importance weights against the English
    // slice as the target distribution: fixed-size (4096-bucket) count
    // tables, broadcast weight join, one doc-keyed exchange.
    Entry("q_dsir_weights",
      (s, d) => Dsir.importanceWeights(t(s, d, "documents"), "text",
        "doc_id", targetPred = "lang = 'en'"),
      Some(Dsir.duckImportanceWeights("documents", "text", "doc_id",
        targetPred = "lang = 'en'"))),

    // Effective sample size of the DSIR weights (Kish (Σw)²/Σw²): the
    // weight-degeneracy audit — ESS/n → 0 means the resampled corpus
    // is effectively a handful of documents.
    Entry("q_ess",
      (s, d) => Dsir.effectiveSampleSize(
        Dsir.importanceWeights(t(s, d, "documents"), "text", "doc_id",
          targetPred = "lang = 'en'"), "logw"),
      Some(Dsir.duckEffectiveSampleSize(
        Dsir.duckImportanceWeights("documents", "text", "doc_id",
          targetPred = "lang = 'en'"), "logw"))),

    // Max-F1 operating point of the quality classifier against the
    // Gopher label: threshold sweep on the distinct-score table,
    // µ-quantized-F1 argmax with a stricter-threshold tie-break.
    Entry("q_best_f1",
      (s, d) => Eval.bestF1(
        Dedup.rebalance(t(s, d, "documents"))
          .withColumn("_w", TextAnalysis.tokens(col("text")))
          .select(QualityFilters.classifierScoreOf(col("_w")).as("q_score"),
            QualityFilters.keepOf(col("_w")).as("keep")),
        "q_score", "keep"),
      Some(Eval.duckBestF1(
        s"""SELECT ${QualityFilters.duckClassifierScore} AS q_score,
                   ${QualityFilters.duckKeep} AS keep
            FROM (SELECT *, ${TextAnalysis.duckTokensBind("text")} AS w
                  FROM documents) d""", "q_score", "keep"))),

    // Gumbel-top-k importance resampling (DSIR's selection step):
    // deterministic weighted sample ∝ exp(logw), planned as a
    // distributed TakeOrdered — no normalization pass, no global sort.
    Entry("q_dsir_sample",
      (s, d) => Dsir.gumbelResample(t(s, d, "documents"), "text",
        "doc_id", targetPred = "lang = 'en'", k = 100),
      Some(Dsir.duckGumbelResample("documents", "text", "doc_id",
        targetPred = "lang = 'en'", k = 100))),

    // K1+K3 driver gate — sink ROUNDTRIP: q_full's frame written through
    // the reference sink surface (gzip JSON lines, overwrite,
    // maxRecordsPerFile → several files even at sf0.01) and read back
    // with the written schema. The oracle is q_full's SELECT, so the
    // whole write→read cycle must be lossless on every column type
    // (doubles, ms-timestamps, strings) for the hash to match.
    Entry("q_sink_roundtrip",
      (s, d) => {
        // Rebalance before the sink (r16): the single-file fixture scan
        // is one partition, so the gzip+JSON render otherwise serializes
        // on one task — rows/files are unchanged, only write parallelism.
        // (q_sink_roundtrip_csv keeps coalesce(1): that IS its contract.)
        val out = Dedup.rebalance(
          Sync.plan(t(s, d, "lineitem"), SyncMode.Full, Seq("l_returnflag")))
        // Per-run unique dir: a fixed path lets two concurrent runs
        // (Bench alongside Verify) clobber each other mid-read.
        val uri = "file:" +
          TempDirs.create("graft-sink-roundtrip").toAbsolutePath
        FileSink.write(out, SinkSpec("json", uri, maxRecordsPerFile = Some(20000L)))
        s.read.schema(out.schema).json(uri)
      },
      Some("SELECT * FROM lineitem WHERE l_returnflag IS NOT NULL AND l_returnflag != ''")),

    // Table-maintenance gate — small-file COMPACTION roundtrip: lineitem
    // written as ~KB-scale files (maxRecordsPerFile=2000 → dozens), then
    // FileSink.compact rewrites the directory into size-targeted files
    // with an atomic swap. Oracle = the source table: compaction must be
    // row-lossless. FileSinkSpec pins the file-count collapse; per-run
    // temp dir like the sink roundtrips.
    Entry("q_compact_roundtrip",
      (s, d) => {
        val src = t(s, d, "lineitem")
        val dir = TempDirs.create("graft-compact").toString + "/lineitem"
        // Rebalanced small-file setup write (r16): same row set, same
        // ~KB file sizing, but rendered by every core instead of the
        // single fixture-scan partition.
        Dedup.rebalance(src).write.option("maxRecordsPerFile", "2000").parquet(dir)
        FileSink.compact(s, dir, targetFileBytes = 64L * 1024 * 1024)
        s.read.parquet(dir)
      },
      Some("SELECT * FROM lineitem")),

    // Chunked BACKFILL partition-exactness: the full events range split
    // into 4 time-based sync chunks (second-aligned bounds; the chunk
    // upper bound <= b-1000 is exactly < b at second precision), chunks
    // unioned. Oracle = the single-range scan: no gap, no overlap, no
    // duplicate — for any range the fixture happens to span.
    Entry("q_backfill",
      (s, d) => {
        val ev = t(s, d, "events")
        val mm = ev.agg(
          (min(unix_timestamp(col("ts"))) * 1000).as("lo"),
          (max(unix_timestamp(col("ts"))) * 1000 + 1000).as("hi")).head()
        val (lo, hi) = (mm.getLong(0), mm.getLong(1))
        val chunkMs = math.max(1000L, (((hi - lo) / 4 + 999) / 1000) * 1000)
        Engine.backfill(ev, "ts", lo, hi, chunkMs)
          .map(_._3).reduce(_ unionByName _)
      },
      Some(s"SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events WHERE ts IS NOT NULL")),

    // Partition-aware compaction roundtrip: events written
    // hive-partitioned by event_type in ~KB files, every leaf compacted
    // in place, read back through partition discovery. Oracle = the
    // source table: the rewrite must preserve rows AND the pruning
    // layout (FileSinkSpec pins the plan side).
    Entry("q_compact_partitioned",
      (s, d) => {
        val src = t(s, d, "events")
        val dir = TempDirs.create("graft-compact-part").toString + "/events"
        // One writer per event_type leaf (maxRecordsPerFile still yields
        // the ~KB small-file setup the gate compacts), written in
        // parallel instead of from the single fixture-scan task.
        src.repartition(col("event_type"))
          .write.option("maxRecordsPerFile", "1000")
          .partitionBy("event_type").parquet(dir)
        FileSink.compactPartitioned(s, dir, targetFileBytes = 64L * 1024 * 1024)
        // Re-select the source column order: partition discovery appends
        // the partition column last and types it by inference — cast and
        // reorder back so the oracle compare is purely about the data.
        s.read.parquet(dir)
          .select(src.columns.map(c => col(c).cast(src.schema(c).dataType)): _*)
      },
      Some(s"SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events")),

    // Partition RETENTION EXPIRY (the third table-maintenance face next
    // to compact and backfill): events written hive-partitioned by day,
    // days before the retention bound dropped by DIRECTORY DELETE — no
    // data file opened, the O(1)-per-partition posture that makes
    // retention affordable at 100 TB. Read back through partition
    // discovery; oracle = the equivalent row filter on the source.
    Entry("q_retention_expire",
      (s, d) => {
        val dir = TempDirs.create("graft-retention").toString + "/events"
        // Repartition BY the hive key before a partitionBy write (r16,
        // guide §6): keyless rebalance here made every task write every
        // date (tasks × dates small files — measured 3× slower); keying
        // on the date gives one writer per partition directory, written
        // in parallel. Rows are unchanged.
        t(s, d, "events")
          .withColumn("event_date", date_format(col("ts"), "yyyy-MM-dd"))
          .repartition(col("event_date"))
          .write.partitionBy("event_date").parquet(dir)
        FileSink.expirePartitions(s, dir, "event_date", keepFrom = "2024-01-15")
        // Partition-column type inference reads the day back as DATE —
        // cast to the written string form so the compare is data-only.
        s.read.parquet(dir)
          .groupBy(date_format(col("event_date"), "yyyy-MM-dd").as("event_date"))
          .agg(count(lit(1)).as("n"))
      },
      Some("""SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS event_date,
             |       count(*) AS n
             |FROM events
             |WHERE strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') >= '2024-01-15'
             |GROUP BY 1""".stripMargin)),

    // SCHEMA-EVOLUTION read: a table dir that accumulated appends under
    // two schema versions (early files lack o_totalprice), read back as
    // ONE declared schema via footer mergeSchema + explicit alignment —
    // NULL where history predates the column. Oracle renders the same
    // evolution as a CASE on the source.
    Entry("q_schema_evolve",
      (s, d) => {
        val dir = TempDirs.create("graft-schema-evolve").toString + "/orders"
        val o = t(s, d, "orders")
        o.filter(col("o_orderkey") % 2 === 0)
          .select(col("o_orderkey"), col("o_custkey"))
          .write.mode("append").parquet(dir)
        o.filter(col("o_orderkey") % 2 =!= 0)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .write.mode("append").parquet(dir)
        graft.sources.SchemaEvolution.readMerged(s, dir, Seq(
          "o_orderkey" -> "bigint", "o_custkey" -> "bigint",
          "o_totalprice" -> "double"))
      },
      Some("""SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
             |       CAST(o_custkey AS BIGINT) AS o_custkey,
             |       CASE WHEN o_orderkey % 2 <> 0
             |            THEN CAST(o_totalprice AS DOUBLE) END AS o_totalprice
             |FROM orders""".stripMargin)),

    // K2 driver gate — CSV sink ROUNDTRIP on the reference's contract
    // (coalesce(1), header, gzip): orders full-sync written and re-read
    // with the written schema. Orders (not lineitem) keeps the
    // single-task serialized write — the contract being gated —
    // reasonably sized at bench scale.
    Entry("q_sink_roundtrip_csv",
      (s, d) => {
        val out = Sync.plan(t(s, d, "orders"), SyncMode.Full, Seq("o_orderstatus"))
        val uri = "file:" +
          TempDirs.create("graft-sink-roundtrip-csv").toAbsolutePath
        FileSink.write(out, SinkSpec("csv", uri))
        s.read.schema(out.schema).option("header", "true").csv(uri)
      },
      Some("SELECT * FROM orders WHERE o_orderstatus IS NOT NULL AND o_orderstatus != ''")),

    // Structured Streaming driver gate — gap sessionization through a
    // REAL streaming query (session_window + watermark, Append mode,
    // bounded replay harness; see StreamSync.replaySessions). Oracle is
    // the batch lag-break session rollup: the streaming and batch
    // formulations must agree row-for-row on the fixture.
    Entry("q_stream_sessions",
      (s, d) => StreamSync.replaySessions(
        t(s, d, "events").select(col("user_id"), col("ts")),
        "user_id", "ts", gap = "30 minutes"),
      Some(s"""SELECT user_id, min(ts) AS session_start,
                      max(ts) + INTERVAL 30 MINUTE AS session_end,
                      count(*) AS n_events
               FROM (SELECT user_id, ts,
                            sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                           ROWS UNBOUNDED PRECEDING) AS sess
                     FROM (SELECT user_id, ts,
                                  CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL THEN 1
                                       WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 30 MINUTE THEN 1
                                       ELSE 0 END AS brk
                           FROM $EvOracle e
                           WHERE user_id IS NOT NULL AND ts IS NOT NULL) b) g
               GROUP BY user_id, sess""")),

    // Streaming exact-dedup driver gate: every fixture row injected
    // TWICE through dropDuplicatesWithinWatermark in one micro-batch
    // (see StreamSync.replayDedup) — the output must be exactly the
    // distinct (event_id, ts) set, so a regression in in-watermark
    // dropping doubles the row count and turns the gate red.
    Entry("q_stream_dedup",
      (s, d) => StreamSync.replayDedup(
        t(s, d, "events").select(col("event_id"), col("ts")),
        "event_id", "ts", watermarkDelay = "1 hour"),
      Some("""SELECT event_id, CAST(ts AS TIMESTAMP) AS ts FROM events
              WHERE event_id IS NOT NULL AND ts IS NOT NULL""")),

    // Streaming scd-latest driver gate: the flatMapGroupsWithState
    // latest-per-key operator replayed over the bounded fixture and
    // json-decoded back — proved by the SAME oracle shape as the batch
    // ScdLatest gates ((user_id, ts) is unique in the fixture, so no
    // tie-break is exercised; the operator's own tie-break is
    // spec-gated in StreamSyncSpec).
    Entry("q_stream_latest",
      (s, d) => StreamSync.replayLatest(
        t(s, d, "events"), "user_id", "ts", "event_type", "value"),
      Some(s"""SELECT user_id, ts, event_type, value FROM (
                 SELECT user_id, ts, event_type, value, ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY ts DESC) AS rn
                 FROM $EvOracle e
                 WHERE user_id IS NOT NULL AND ts IS NOT NULL) x
               WHERE rn = 1""")),

    // Streaming windowed change counts driver gate: the synthesized
    // change log through a REAL tumbling-window watermark aggregation
    // (Append mode, sentinel-flushed — see replayChangeCounts). Oracle
    // is the epoch-aligned batch rollup with the same synthesized
    // change-type mapping.
    Entry("q_stream_counts",
      (s, d) => StreamSync.replayChangeCounts(
        ChangeLog.synthesize(t(s, d, "events"), "event_id", "ts")
          .select(col("_commit_timestamp"), col("_change_type")),
        windowLength = "1 hour"),
      Some(s"""SELECT make_timestamp((epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000)
                        * 3600000000) AS window_start,
                      CASE WHEN event_id % 10 < 6 THEN 'insert'
                           WHEN event_id % 10 < 8 THEN 'update_postimage'
                           WHEN event_id % 10 < 9 THEN 'update_preimage'
                           ELSE 'delete' END AS _change_type,
                      count(*) AS n_changes
               FROM events WHERE ts IS NOT NULL
               GROUP BY 1, 2""")),

    // FILE-SOURCE → checkpointed parquet FILE-SINK e2e: the sink half
    // of the streaming-IO story — per-file micro-batches appended
    // exactly-once; the sink directory read back must be row-identical
    // to the log (duplicate event_ids = a double-committed batch).
    Entry("q_stream_file_sink",
      (s, d) => StreamSync.replayFileSink(
        ChangeLog.synthesize(t(s, d, "events"), "event_id", "ts")
          .select(col("event_id"), col("_change_type"))),
      Some("""SELECT event_id,
                     CASE WHEN event_id % 10 < 6 THEN 'insert'
                          WHEN event_id % 10 < 8 THEN 'update_postimage'
                          WHEN event_id % 10 < 9 THEN 'update_preimage'
                          ELSE 'delete' END AS _change_type
              FROM events""")),

    // FILE-SOURCE streaming e2e gate: the SAME windowed change counts,
    // but ingested through the production readStream path — a staged
    // change-log parquet directory replayed file-per-micro-batch
    // (maxFilesPerTrigger=1, modTime-ordered). Same oracle as
    // q_stream_counts: the transport must be invisible.
    Entry("q_stream_file_counts",
      (s, d) => StreamSync.replayFileCounts(
        ChangeLog.synthesize(t(s, d, "events"), "event_id", "ts")
          .select(col("_commit_timestamp"), col("_change_type")),
        windowLength = "1 hour"),
      Some(s"""SELECT make_timestamp((epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000)
                        * 3600000000) AS window_start,
                      CASE WHEN event_id % 10 < 6 THEN 'insert'
                           WHEN event_id % 10 < 8 THEN 'update_postimage'
                           WHEN event_id % 10 < 9 THEN 'update_preimage'
                           ELSE 'delete' END AS _change_type,
                      count(*) AS n_changes
               FROM events WHERE ts IS NOT NULL
               GROUP BY 1, 2""")),

    // FILE-SOURCE streaming e2e gate for aggregate maintenance: the
    // foreachBatch incremental fold driven by real file-source
    // micro-batches over a staged change-log directory. Same oracle as
    // q_stream_agg — batch boundaries AND the transport are invisible.
    Entry("q_stream_file_agg",
      (s, d) => StreamSync.replayFileAgg(
        ChangeLog.synthesize(t(s, d, "events"), "event_id", "ts")
          .select(col("user_id"), col("value"),
            col(ChangeLog.ChangeType), col(ChangeLog.CommitTs)),
        "user_id", "value", nChunks = 3),
      Some(s"""WITH b AS (SELECT user_id, value,
                      CASE WHEN event_id % 10 < 6 THEN 'insert'
                           WHEN event_id % 10 < 8 THEN 'update_postimage'
                           WHEN event_id % 10 < 9 THEN 'update_preimage'
                           ELSE 'delete' END AS ct
               FROM events),
               sg AS (SELECT user_id,
                             CASE WHEN ct IN ('insert', 'update_postimage')
                                  THEN 1 ELSE -1 END AS sgn,
                             coalesce(CAST(floor(value * ${ChangeLog.AggQuantum} + 0.5) AS BIGINT), 0) AS q
                      FROM b)
               SELECT user_id, CAST(sum(sgn) AS BIGINT) AS n_rows,
                      CAST(sum(sgn * q) AS BIGINT) AS sum_value_q6
               FROM sg GROUP BY user_id HAVING sum(sgn) <> 0""")),

    // Stream-stream interval join driver gate: purchases enriched with
    // every same-user click in the 2 h before them, replayed through
    // the watermarked streaming join (one micro-batch per side — inner
    // joins emit on match; the watermark's role at scale is state
    // eviction). DuckDB twin is the plain inequality join.
    Entry("q_stream_join",
      (s, d) => {
        val ev = t(s, d, "events")
        StreamSync.replayIntervalJoin(
          ev.filter(col("event_type") === "purchase")
            .select(col("user_id"), col("ts"), col("event_id")),
          ev.filter(col("event_type") === "click")
            .select(col("user_id"), col("ts"), col("event_id")),
          "user_id", "ts", "event_id",
          watermarkDelay = "0 seconds", joinWindowSeconds = 7200L)
      },
      Some(s"""SELECT f.user_id,
                      f.ts AS fact_ts, f.event_id AS fact_id,
                      d.ts AS dim_ts, d.event_id AS dim_id
               FROM $EvOracle f JOIN $EvOracle d
                 ON d.user_id = f.user_id
                AND d.ts >= f.ts - INTERVAL 7200 SECOND
                AND d.ts <= f.ts
               WHERE f.event_type = 'purchase' AND d.event_type = 'click'
                 AND f.user_id IS NOT NULL AND f.ts IS NOT NULL
                 AND f.event_id IS NOT NULL
                 AND d.user_id IS NOT NULL AND d.ts IS NOT NULL
                 AND d.event_id IS NOT NULL""")),

    // Stream-STATIC enrichment — the stateless fourth streaming join
    // shape: each micro-batch equi-joins the broadcast customer dim
    // (events.user_id ↔ customer.c_custkey). Oracle = the plain batch
    // join; the replay harness streams only the event side — the dim
    // staying static IS the semantics under test.
    Entry("q_stream_enrich",
      (s, d) => StreamSync.replayEnrich(
        t(s, d, "events").filter(col("user_id") < 200)
          .select(col("user_id"), col("ts"), col("event_id")),
        t(s, d, "customer").select(col("c_custkey"), col("c_name"), col("c_mktsegment")),
        "user_id", "ts", "event_id", "c_custkey"),
      Some(s"""SELECT e.user_id, e.ts, e.event_id,
                      c.c_name AS dim_c_name,
                      c.c_mktsegment AS dim_c_mktsegment
               FROM $EvOracle e JOIN customer c ON e.user_id = c.c_custkey
               WHERE e.user_id < 200 AND e.user_id IS NOT NULL
                 AND e.ts IS NOT NULL AND e.event_id IS NOT NULL""")),

    // SemDeDup: k-means cells → within-cell cosine near-dup pairs →
    // greedy smaller-id drop (the paper's keep-one policy — NOT a
    // transitive closure; see SemDedup scaladoc). Output
    // drops the embedding array (oracle compare is scalar-only).
    // Threshold 0.5 = the strict-duplicate regime the paper dedups in
    // (and keeps the CC edge set small — at 0.35 this fixture's edge
    // chains dominate the bench with pure CC-round overhead; that
    // looser regime is exercised by DsirSemDedupSpec instead).
    Entry("q_semdedup",
      (s, d) => SemDedup.dedup(t(s, d, "embeddings"), "embedding",
          "vec_id", k = 8, iters = 2, threshold = 0.5)
        .select(col("vec_id"), col("label")),
      Some(SemDedup.duckDedup("embeddings", "embedding", "vec_id",
        k = 8, iters = 2, dim = 64, threshold = 0.5, keepCols = Seq("label")))),

    // Incremental aggregate (materialized-view) maintenance gate: the
    // per-user (count, Σvalue) view maintained from the change feed
    // alone — state from the first half of the log, the second half
    // spliced in as a signed delta. Oracle = the full-log signed
    // aggregate (the IVM equality contract); values quantized once to
    // 6-dp BIGINTs so every sum is integer-exact on both engines.
    Entry("q_agg_maintain",
      (s, d) => {
        val log = ChangeLog.synthesize(t(s, d, "events"), "event_id", "ts")
          .withColumn("_ms", expr(s"unix_micros(`${ChangeLog.CommitTs}`) div 1000"))
        val splitMs = log.stat.approxQuantile("_ms", Array(0.5), 0.01).head.toLong
        val state = ChangeLog.aggMaintainState(
          log.filter(col("_ms") <= splitMs).drop("_ms"), Seq("user_id"), "value")
        ChangeLog.aggPresent(ChangeLog.aggMaintainApply(state,
          log.filter(col("_ms") > splitMs).drop("_ms"), Seq("user_id"), "value"))
      },
      Some(s"""WITH b AS (SELECT user_id, value,
                      CASE WHEN event_id % 10 < 6 THEN 'insert'
                           WHEN event_id % 10 < 8 THEN 'update_postimage'
                           WHEN event_id % 10 < 9 THEN 'update_preimage'
                           ELSE 'delete' END AS ct
               FROM events),
               sg AS (SELECT user_id,
                             CASE WHEN ct IN ('insert', 'update_postimage')
                                  THEN 1 ELSE -1 END AS sgn,
                             coalesce(CAST(floor(value * ${ChangeLog.AggQuantum} + 0.5) AS BIGINT), 0) AS q
                      FROM b)
               SELECT user_id, CAST(sum(sgn) AS BIGINT) AS n_rows,
                      CAST(sum(sgn * q) AS BIGINT) AS sum_value_q6
               FROM sg GROUP BY user_id HAVING sum(sgn) <> 0""")),

    // Join-cardinality estimation gate: CMS inner product predicts
    // |lineitem ⋈ orders| without running the join; the exact count is
    // computed from grouped key counts as the audit twin. The estimate
    // over-counts by construction (collisions add) — SketchesSpec pins
    // the ≥ invariant on a skewed input.
    Entry("q_join_card",
      (s, d) => Sketches.cmsJoinCardinality(
        t(s, d, "lineitem"), "l_orderkey", t(s, d, "orders"), "o_orderkey"),
      Some(Sketches.duckCmsJoinCardinality(
        "lineitem", "l_orderkey", "orders", "o_orderkey"))),

    // Directional source-containment gate: the KMV union-sample
    // machinery of q_kmv_jaccard re-grouped to containment — the
    // size-asymmetric overlap question Jaccard blurs.
    Entry("q_kmv_containment",
      (s, d) => Sketches.kmvContainment(t(s, d, "documents"), "text", "source"),
      Some(Sketches.duckKmvContainment("documents", "text", "source"))),

    // Token-budget selection gate: best documents until 15 000 tokens
    // (~55% of the sf≤0.01 corpus, ~6% of sf0.1 — selective at every
    // SF). The oracle states the semantics directly as a global
    // running-total prefix; the engine's bucketed two-phase plan (no
    // corpus-wide sort — PlanAuditSpec) must equal it exactly.
    Entry("q_token_budget",
      (s, d) => Curriculum.tokenBudgetSelect(
        t(s, d, "documents"), "text", "doc_id", budget = 15000L),
      Some(Curriculum.duckTokenBudgetSelect(
        "documents", "text", "doc_id", budget = 15000L))),

    // Per-document unigram entropy gate — sorted-fold fp parity like
    // q_idf_score.
    Entry("q_entropy",
      (s, d) => Entropy.docEntropy(t(s, d, "documents"), "text", "doc_id"),
      Some(Entropy.duckDocEntropy("documents", "text", "doc_id"))),

    // Per-type daily-volume OLS trend gate — integer moments, one
    // fixed double expression per coefficient.
    Entry("q_trend_fit",
      (s, d) => EventStats.trendFit(t(s, d, "events"), "ts", "event_type"),
      Some(EventStats.duckTrendFit(EvOracle, "ts", "event_type"))),

    // Streaming IVM gate: the per-user aggregate view maintained by
    // foreachBatch × aggMaintainApply over three chronological
    // micro-batches; same oracle as q_agg_maintain — batch boundaries
    // must be invisible in the maintained state.
    Entry("q_stream_agg",
      (s, d) => StreamSync.replayAgg(
        ChangeLog.synthesize(t(s, d, "events"), "event_id", "ts")
          .select(col("user_id"), col("value"),
            col(ChangeLog.ChangeType), col(ChangeLog.CommitTs)),
        "user_id", "value", nBatches = 3),
      Some(s"""WITH b AS (SELECT user_id, value,
                      CASE WHEN event_id % 10 < 6 THEN 'insert'
                           WHEN event_id % 10 < 8 THEN 'update_postimage'
                           WHEN event_id % 10 < 9 THEN 'update_preimage'
                           ELSE 'delete' END AS ct
               FROM events),
               sg AS (SELECT user_id,
                             CASE WHEN ct IN ('insert', 'update_postimage')
                                  THEN 1 ELSE -1 END AS sgn,
                             coalesce(CAST(floor(value * ${ChangeLog.AggQuantum} + 0.5) AS BIGINT), 0) AS q
                      FROM b)
               SELECT user_id, CAST(sum(sgn) AS BIGINT) AS n_rows,
                      CAST(sum(sgn * q) AS BIGINT) AS sum_value_q6
               FROM sg GROUP BY user_id HAVING sum(sgn) <> 0""")),

    // First-order event-type transition matrix gate: one user-keyed
    // lead window, |types|²-sized aggregates, broadcast normalizer.
    Entry("q_transitions",
      (s, d) => EventStats.transitions(
        t(s, d, "events"), "ts", "event_type", "user_id", "event_id"),
      Some(EventStats.duckTransitions(
        EvOracle, "ts", "event_type", "user_id", "event_id"))),

    // Key-skew report gate: per-key count distribution collapsed to
    // (n_rows, n_keys, max_share, gini) — integer moments, two final
    // divisions.
    Entry("q_key_skew",
      (s, d) => Profile.keySkew(t(s, d, "events"), "user_id"),
      Some(Profile.duckKeySkew("events", "user_id"))),

    // SCD2 point-in-time lookup gate: every event joined to the user
    // dimension version valid AT the event's timestamp (half-open
    // intervals; deleted gaps match nothing). Oracle nests the full
    // SCD2 rebuild as the history side.
    Entry("q_scd2_lookup",
      (s, d) => {
        val ev = t(s, d, "events")
        val hist = ChangeLog.scd2History(
          ChangeLog.synthesize(ev, "event_id", "ts"),
          Seq("user_id"), "event_id", Seq("event_type"))
        ChangeLog.scd2Lookup(
          ev.select(col("event_id"), col("user_id"), col("ts")),
          hist, Seq("user_id"), "ts", Seq("event_type"))
      },
      Some(s"""SELECT e.event_id, e.user_id, e.ts,
                      h.version AS dim_version,
                      h.event_type AS dim_event_type
               FROM $EvOracle e
               JOIN ($Scd2RebuildSql) h
                 ON e.user_id = h.user_id
                AND epoch_us(CAST(e.ts AS TIMESTAMP)) // 1000 >= h.valid_from_ms
                AND (h.valid_to_ms IS NULL
                     OR epoch_us(CAST(e.ts AS TIMESTAMP)) // 1000 < h.valid_to_ms)""")),

    // Rolling 7-day distinct-user series gate: mergeable HLL registers
    // per day, trailing-window register unions, exact audit twin
    // alongside.
    Entry("q_rolling_distinct",
      (s, d) => Sketches.rollingDistinct(t(s, d, "events"), "ts", "user_id"),
      Some(Sketches.duckRollingDistinct(EvOracle, "ts", "user_id"))),

    // Document-boundary bin packing gate (Next-Fit-Decreasing): whole
    // docs into 256-token bins across 8 shards; oracle restates the
    // per-shard fold as a recursive CTE.
    Entry("q_bin_pack",
      (s, d) => Packing.binPack(t(s, d, "documents"), "text", "doc_id",
        capacity = 256L, nShards = 8),
      Some(Packing.duckBinPack("documents", "text", "doc_id",
        capacity = 256L, nShards = 8))),

    // Equi-width histogram gate: 20 buckets over the document length
    // column — two-pass bounds + one bucket aggregate, no sort.
    Entry("q_histogram",
      (s, d) => Profile.histogram(t(s, d, "documents"), "n_chars", 20),
      Some(Profile.duckHistogram("documents", "n_chars", 20))),

    // Order-independent content checksum gate: the reference's P4 row
    // render XOR-folded — sync integrity verification as one narrow
    // aggregate (doubles excluded from the render like q_row_hash).
    // Functional-dependency gates: l_orderkey → o-side attributes via
    // the lineitem/orders denormalization would hold; within lineitem,
    // l_orderkey does NOT determine l_partkey (multi-line orders) while
    // doc_id → lang trivially holds on documents. One violated, one
    // held — both summaries exercised.
    Entry("q_fd_check",
      (s, d) => Profile.fdCheck(t(s, d, "lineitem"), "l_orderkey", "l_partkey")
        .withColumn("fd", lit("l_orderkey->l_partkey"))
        .unionByName(
          Profile.fdCheck(t(s, d, "documents"), "doc_id", "lang")
            .withColumn("fd", lit("doc_id->lang"))),
      Some(s"""SELECT *, 'l_orderkey->l_partkey' AS fd
               FROM (${Profile.duckFdCheck("lineitem", "l_orderkey", "l_partkey")})
               UNION ALL
               SELECT *, 'doc_id->lang' AS fd
               FROM (${Profile.duckFdCheck("documents", "doc_id", "lang")})""")),

    // Composed corpus health report gate: six monitoring diagnostics
    // (volume, diversity, Zipf shape, entropy, language balance)
    // unioned into one (metric, value) frame — every constituent's
    // mirror nested in the oracle.
    // Vocabulary-coverage / OOV-rate report: top-20 corpus vocabulary
    // (count DESC, word ASC — deterministic cut), per-doc fraction of
    // token occurrences outside it. Broadcast vocab probe; the corpus
    // never shuffles by word.
    Entry("q_oov_rate",
      (s, d) => Profile.oovRate(t(s, d, "documents"), "text", "doc_id",
        topV = 20),
      Some(Profile.duckOovRate("documents", "text", "doc_id", topV = 20))),

    // Vocabulary coverage CURVE: token-mass coverage of the top-k vocab
    // at a k grid — the tokenizer-budget planning view whose knee
    // answers "how big a vocab do I need"; cumulative sums on the
    // vocab-sized rank table only.
    Entry("q_vocab_coverage",
      (s, d) => Profile.vocabCoverage(t(s, d, "documents"), "text",
        "doc_id", ks = Seq(5, 20, 100, 1000)),
      Some(Profile.duckVocabCoverage("documents", "text", "doc_id",
        ks = Seq(5, 20, 100, 1000)))),

    // Per-source redundancy report: per source, the fraction of its
    // docs byte-identical (md5) to an earlier doc anywhere in the
    // corpus — the mixture-weight discount signal.
    Entry("q_source_redundancy",
      (s, d) => Profile.sourceRedundancy(t(s, d, "documents"), "text",
        "doc_id", "source"),
      Some(Profile.duckSourceRedundancy("documents", "text", "doc_id",
        "source"))),

    // One-stop corpus health sheet: per-language doc/token/quality
    // rollup UNIONed with the cap-drop census (LSH bucket caps, graph
    // pivot caps, sign-LSH caps) so "what did the skew guards cost" is
    // a queryable row, not a log line.
    Entry("q_health_report",
      (s, d) => Pipeline.healthReport(t(s, d, "documents"), "text",
          "doc_id", "lang")
        .unionByName(Pipeline.capDropReport(t(s, d, "documents"), "text",
          "doc_id", t(s, d, "embeddings"), "embedding", "vec_id")),
      Some(s"""${Pipeline.duckHealthReport("documents", "text", "doc_id", "lang")}
               UNION ALL
               ${Pipeline.duckCapDropReport("documents", "text", "doc_id",
                 "embeddings", "embedding", "vec_id", dim = 64)}""")),

    // Z-order clustered sink round-trip gate: the multi-column pruning
    // layout (Morton interleave + range partition) must be ROW-LOSSLESS
    // — the layout work cannot perturb data. The pruning property
    // itself is FileSinkSpec's gate; this driver-gates the data path.
    Entry("q_zorder_roundtrip",
      (s, d) => {
        val li = t(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
        val dir = TempDirs.create("graft-zorder").toString + "/li"
        FileSink.writeZOrdered(li, dir, "l_orderkey", "l_partkey", numFiles = 8)
        s.read.parquet(dir)
      },
      Some("SELECT l_orderkey, l_partkey, l_suppkey FROM lineitem")),

    // Streaming windowed CMS gate: daily count-min cells maintained by
    // a watermarked streaming aggregate; point estimates for fixed
    // probe terms next to exact counts (estimate ≥ exact).
    Entry("q_stream_cms",
      (s, d) => StreamSync.replayCmsCounts(
        t(s, d, "events"), "ts", "event_type", windowLength = "1 day",
        terms = Seq("click", "view", "purchase")),
      Some(Sketches.duckStreamingCms(EvOracle, "ts", "event_type",
        lenUs = 86400000000L, terms = Seq("click", "view", "purchase")))),

    // ANN recall@k audit gate: IVF vs exact per query — the deployment
    // metric as a first-class query; oracle joins both mirrors.
    Entry("q_ann_recall",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        Similarity.recallAtK(emb, emb.filter(col("vec_id") < 10),
          "embedding", "vec_id", "label", k = 5, nProbe = 3)
      },
      Some(Similarity.duckRecallAtK("embeddings", "embedding", "vec_id",
        "label", dim = 64, k = 5, nProbe = 3, maxQueryId = 10))),

    // PSI score-distribution drift gate: English vs the rest over the
    // fixed 10-bucket grid, add-one smoothed, 1e-12-quantized terms.
    Entry("q_psi",
      (s, d) => Drift.scorePsi(t(s, d, "documents"), "text",
        col("lang") === "en"),
      Some(Drift.duckScorePsi("documents", "text", "lang = 'en'"))),

    // Top session paths gate: first-3-step path per 30-min session,
    // top 15 by session count (path tie-break).
    Entry("q_top_paths",
      (s, d) => Sessionize.topPaths(t(s, d, "events"), "user_id", "ts",
        "event_id", "event_type", gapMs = 30L * 60 * 1000, maxSteps = 3, k = 15),
      Some(Sessionize.duckTopPaths(EvOracle, "user_id", "ts", "event_id",
        "event_type", gapMs = 30L * 60 * 1000, maxSteps = 3, k = 15))),

    // Streaming windowed-distinct gate: daily HLL registers maintained
    // by a real watermarked streaming aggregate, estimator run over
    // the emitted register table, batch-exact twin joined per window.
    Entry("q_stream_distinct",
      (s, d) => StreamSync.replayDistinctCounts(
        t(s, d, "events"), "ts", "user_id", windowLength = "1 day"),
      Some(Sketches.duckWindowedDistinct(EvOracle, "ts", "user_id",
        lenUs = 86400000000L))),

    // EWMA daily smoothing gate: sequential recurrence folded over the
    // tiny per-type day series; oracle = recursive CTE.
    Entry("q_ewma",
      (s, d) => EventStats.ewmaDaily(t(s, d, "events"), "ts", "event_type",
        alpha = 0.3),
      Some(EventStats.duckEwmaDaily(EvOracle, "ts", "event_type", alpha = 0.3))),

    // Distinct-n-gram diversity gate: the Self-BLEU-style synthetic-
    // data canary — per-source share of fresh 3-grams.
    Entry("q_distinct_ngrams",
      (s, d) => Novelty.distinctNgramRatio(t(s, d, "documents"), "text",
        "source", n = 3),
      Some(Novelty.duckDistinctNgramRatio("documents", "text", "source", n = 3))),

    // FK referential-integrity gate: orders→customer orphan count as a
    // one-row expectation (broadcast anti probe).
    Entry("q_fk_check",
      (s, d) => Profile.fkCheck(t(s, d, "orders"), "o_custkey",
        t(s, d, "customer"), "c_custkey"),
      Some(Profile.duckFkCheck("orders", "o_custkey", "customer", "c_custkey"))),

    // Percent-rank score normalization gate: within-language quantile
    // position of the classifier score (cross-language comparable).
    Entry("q_score_normalize",
      (s, d) => Curriculum.scoreNormalize(t(s, d, "documents"), "text",
        "doc_id", "lang"),
      Some(Curriculum.duckScoreNormalize("documents", "text", "doc_id", "lang"))),

    // Cross-source QUANTILE normalization: each doc's score mapped to
    // the POOLED distribution's value at its within-source percentile
    // (q_score_normalize maps to uniform; this maps source→pooled so
    // every source's normalized histogram matches). 100-point grid:
    // all-integer buckets from one source-keyed window, pooled order
    // statistics from the distinct-value table, broadcast bucket join.
    Entry("q_quantile_norm",
      (s, d) => Features.quantileNormalize(
        t(s, d, "documents")
          .withColumn("_w", TextAnalysis.tokens(col("text")))
          .select(col("doc_id"), col("source"),
            QualityFilters.classifierScoreOf(col("_w")).as("q_score")),
        "doc_id", "source", "q_score"),
      Some(Features.duckQuantileNormalize(
        s"""(SELECT doc_id, source,
                    ${QualityFilters.duckClassifierScore} AS q_score
             FROM (SELECT *, ${TextAnalysis.duckTokensBind("text")} AS w
                   FROM documents) d0)""",
        "doc_id", "source", "q_score"))),

    // Lead-lag cross-correlation gate: does the view series predict the
    // purchase series, and at what day offset?
    Entry("q_event_xcorr",
      (s, d) => EventStats.dailyCrossCorr(t(s, d, "events"), "ts",
        "event_type", typeA = "view", typeB = "purchase", maxLag = 3),
      Some(EventStats.duckDailyCrossCorr(EvOracle, "ts", "event_type",
        typeA = "view", typeB = "purchase", maxLag = 3))),

    // Degree-distribution gate: log2-binned power-law fingerprint of
    // the co-purchase graph (integer bit-length bins — no floating
    // log2 at bucket boundaries).
    Entry("q_degree_dist",
      (s, d) => Triangles.degreeHistogram(
        MarketBasket.coPairs(t(s, d, "lineitem"), "l_orderkey", "l_partkey",
          minPairs = 2),
        "item_a", "item_b"),
      Some(s"""WITH ${MarketBasket.duckCoPairCtes("lineitem", "l_orderkey",
                 "l_partkey", minPairs = 2)}
              |SELECT * FROM (
              |${Triangles.duckDegreeHistogram("pairs", "item_a", "item_b")})""".stripMargin)),

    // Temporal-split leakage gate: time-cutoff split with the entity-
    // leakage census (users seen on both sides of the cutoff).
    Entry("q_time_split",
      (s, d) => Splits.timeSplitAudit(t(s, d, "events"), "user_id", "ts",
        cutoffMs = EvCutoffMs),
      Some(Splits.duckTimeSplitAudit(EvOracle, "user_id", "ts",
        cutoffMs = EvCutoffMs))),

    // Nearest-centroid classifier audit gate: label separability in
    // embedding space (per-label mean centroids, narrow re-assignment
    // fold, exact counts).
    Entry("q_centroid_classify",
      (s, d) => Similarity.centroidClassify(t(s, d, "embeddings"),
        "embedding", "vec_id", "label"),
      Some(Similarity.duckCentroidClassify("embeddings", "embedding",
        "vec_id", "label", dim = 64))),

    // Funnel latency gate: time-to-convert distribution per transition
    // (exact integer ms; interpolated p50/p90 over converted users).
    Entry("q_funnel_latency",
      (s, d) => Funnel.stepLatency(t(s, d, "events"), "user_id", "ts",
        "event_type", Seq("view", "click", "purchase")),
      Some(Funnel.duckStepLatency3(EvOracle, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase")))),

    // Daily-autocorrelation gate: per-type Pearson r of the daily count
    // series vs its 1..3-day shift — seasonality/momentum probe from
    // exact BIGINT moments (one √-quotient at the end).
    Entry("q_event_acf",
      (s, d) => EventStats.dailyAcf(t(s, d, "events"), "ts", "event_type",
        maxLag = 3),
      Some(EventStats.duckDailyAcf(EvOracle, "ts", "event_type", maxLag = 3))),

    // Triangle census gate: cohesion of the co-purchase graph via
    // degree-ordered orientation (wedge fan-out bounded O(√m) per
    // node, both stages equi-joins, exact BIGINT counts).
    Entry("q_triangles",
      (s, d) => Triangles.census(
        MarketBasket.coPairs(t(s, d, "lineitem"), "l_orderkey", "l_partkey",
          minPairs = 2),
        "item_a", "item_b"),
      Some(s"""WITH ${MarketBasket.duckCoPairCtes("lineitem", "l_orderkey",
                 "l_partkey", minPairs = 2)},
              |${Triangles.duckCensusCtes("pairs", "item_a", "item_b")}
              |${Triangles.duckCensusSelect}""".stripMargin)),

    // Adamic–Adar link prediction over the co-purchase graph: top
    // NON-edges by Σ 1/ln(deg) over shared neighbors — the
    // "customers who bought both…" recommender next to q_item_neighbors'
    // observed-pair similarity. Per-pivot weights µ-quantized once so
    // the pair sum is order-independent; hub pivots are capped (the
    // wedge-volume skew guard).
    Entry("q_adamic_adar",
      (s, d) => LinkPred.adamicAdar(
        MarketBasket.coPairs(t(s, d, "lineitem"), "l_orderkey", "l_partkey",
          minPairs = 2).select(col("item_a"), col("item_b")),
        "item_a", "item_b", topK = 50),
      Some(s"""WITH ${MarketBasket.duckCoPairCtes("lineitem", "l_orderkey",
                 "l_partkey", minPairs = 2)},
              |aa AS (
              |${LinkPred.duckAdamicAdar("pairs", "item_a", "item_b", topK = 50)}
              |)
              |SELECT * FROM aa""".stripMargin)),

    // Exact 2-hop reachability per item over the same graph — the
    // neighborhood-growth profile (radius-2 prefix of the HyperANF
    // neighborhood function; the HLL-register variant is the >2-radius
    // scale path). Same pivot-degree skew guard as q_adamic_adar.
    Entry("q_two_hop",
      (s, d) => LinkPred.twoHopReach(
        MarketBasket.coPairs(t(s, d, "lineitem"), "l_orderkey", "l_partkey",
          minPairs = 2).select(col("item_a"), col("item_b")),
        "item_a", "item_b"),
      Some(s"""WITH ${MarketBasket.duckCoPairCtes("lineitem", "l_orderkey",
                 "l_partkey", minPairs = 2)},
              |th AS (
              |${LinkPred.duckTwoHopReach("pairs", "item_a", "item_b")}
              |)
              |SELECT * FROM th""".stripMargin)),

    // HyperANF radius-2 estimate: per-node 64-register HLL of the
    // 2-hop ball via ONE register merge pulled across each edge —
    // edge-linear, no wedge volume, no cap (the scale path q_two_hop's
    // exact twin audits). The gate pins the registers bit-for-bit.
    Entry("q_two_hop_hll",
      (s, d) => LinkPred.twoHopReachHll(
        MarketBasket.coPairs(t(s, d, "lineitem"), "l_orderkey", "l_partkey",
          minPairs = 2).select(col("item_a"), col("item_b")),
        "item_a", "item_b"),
      Some(s"""WITH ${MarketBasket.duckCoPairCtes("lineitem", "l_orderkey",
                 "l_partkey", minPairs = 2)},
              |hanf AS (
              |${LinkPred.duckTwoHopReachHll("pairs", "item_a", "item_b")}
              |)
              |SELECT * FROM hanf""".stripMargin)),

    // Degree-capped HyperANF radius-2 (r14, VERDICT r13 #4): the same
    // register/merge/estimator chain over the subgraph with both edge
    // endpoints of degree ≤ 16 — the BOUNDED oracle shape for top-SF
    // audits (the uncapped gate's oracle must materialize the exact
    // two-hop expansion and spilled past the host's disk at sf10).
    // Two bounds compose: the degree cap bounds the PER-NODE expansion,
    // and an SF-tiered order slice (the q_range_join_sample /
    // q_quantile_sketch pattern, identical tiering in both engines)
    // bounds the GRAPH itself at the top SFs, where even building the
    // co-pair wedge set and the edges×64-register pull exceeds the
    // checker's temp disk. On the shipped fixtures both bounds are
    // no-ops (slice 1, max degree ≤ 15), so the gate equals
    // q_two_hop_hll at small SF and stays non-vacuous.
    Entry("q_two_hop_hll_capped",
      (s, d) => {
        val li = t(s, d, "lineitem")
        // SF tier from parquet footer metadata — no Spark job spent
        // deciding the modulus (r15, VERDICT r14 #3); DuckDB's count(*)
        // twin below is footer-answered too, so the tiers stay paired.
        val m = if (FixtureProbe.rowCount(s, d, "lineitem") <= 10000000L) 1L else 11L
        LinkPred.twoHopReachHllCapped(
          MarketBasket.coPairs(
            li.filter(pmod(col("l_orderkey"), lit(m)) === 0L),
            "l_orderkey", "l_partkey", minPairs = 2)
            .select(col("item_a"), col("item_b")),
          "item_a", "item_b", maxDeg = 16)
      },
      Some(s"""WITH ${MarketBasket.duckCoPairCtes(
                 "(SELECT * FROM lineitem WHERE l_orderkey % " +
                   "(CASE WHEN (SELECT count(*) FROM lineitem) <= 10000000 " +
                   "THEN 1 ELSE 11 END) = 0)",
                 "l_orderkey", "l_partkey", minPairs = 2)},
              |hanfc AS (
              |${LinkPred.duckTwoHopReachHllCapped("pairs", "item_a", "item_b",
                 maxDeg = 16)}
              |)
              |SELECT * FROM hanfc""".stripMargin)),

    // Pivot-cap drop accounting for the wedge operators: what share of
    // the total wedge volume the skew guard sheds (cap 8: the fixture
    // graph tops out at degree 8–15, so the drop branch exercises) —
    // every cap a queryable metric, never a silent recall loss.
    Entry("q_graph_cap",
      (s, d) => LinkPred.pivotCapAudit(
        MarketBasket.coPairs(t(s, d, "lineitem"), "l_orderkey", "l_partkey",
          minPairs = 2).select(col("item_a"), col("item_b")),
        "item_a", "item_b", maxPivotDeg = 8),
      Some(s"""WITH ${MarketBasket.duckCoPairCtes("lineitem", "l_orderkey",
                 "l_partkey", minPairs = 2)},
              |ca AS (
              |${LinkPred.duckPivotCapAudit("pairs", "item_a", "item_b",
                  maxPivotDeg = 8)}
              |)
              |SELECT * FROM ca""".stripMargin)),

    // Frequent triple itemsets (one Apriori level above pair lift):
    // candidates generated on the frequent-PAIR table with all three
    // sub-pairs pruned before touching the incidence; TakeOrdered top-k.
    Entry("q_basket_triples",
      (s, d) => MarketBasket.tripleCounts(t(s, d, "lineitem"),
        "l_orderkey", "l_partkey", minCount = 2, topK = 100),
      Some(MarketBasket.duckTripleCounts("lineitem", "l_orderkey",
        "l_partkey", minCount = 2, topK = 100))),

    // Per-node local clustering coefficients over the same graph —
    // dense-pocket vs bridge nodes; wedge volume stays degree-ordered
    // O(m^1.5), triangles explode to 3 member rows before the count.
    Entry("q_local_cc",
      (s, d) => Triangles.localCoefficients(
        MarketBasket.coPairs(t(s, d, "lineitem"), "l_orderkey", "l_partkey",
          minPairs = 2),
        "item_a", "item_b"),
      Some(s"""WITH ${MarketBasket.duckCoPairCtes("lineitem", "l_orderkey",
                 "l_partkey", minPairs = 2)},
              |${Triangles.duckLocalCoefficientCtes("pairs", "item_a", "item_b")}
              |${Triangles.duckLocalCoefficientSelect}""".stripMargin)),

    // PageRank gate: item centrality over the co-purchase graph.
    // Fixed-point BIGINT arithmetic end to end (integer sums commute),
    // so 5 synchronous iterations are bit-reproducible and oracle-
    // hash-exact; per-iteration shape is one src join + one dst agg.
    // SCOPE BOUND (r12): graph sliced at l_partkey < 20 000 on BOTH
    // sides — a no-op at sf ≤ 0.1, and at sf1.0 it caps the oracle's
    // materialized per-iteration CTEs, which spilled past the host's
    // disk at the 6 M-row lineitem (same bound as q_label_prop; the
    // engine side is degree-bounded and ran fine).
    Entry("q_pagerank",
      (s, d) => {
        val pairs = MarketBasket.coPairs(
          t(s, d, "lineitem").filter(col("l_partkey") < 20000),
          "l_orderkey", "l_partkey", minPairs = 2)
        val edges = pairs.select(col("item_a").as("src"), col("item_b").as("dst"))
          .union(pairs.select(col("item_b"), col("item_a")))
        PageRank.ranks(edges, "src", "dst", iters = 5)
      },
      Some(s"""WITH ${MarketBasket.duckCoPairCtes(
                 "(SELECT * FROM lineitem WHERE l_partkey < 20000)",
                 "l_orderkey", "l_partkey", minPairs = 2)},
              |e AS (SELECT item_a AS src, item_b AS dst FROM pairs
              |      UNION ALL SELECT item_b, item_a FROM pairs),
              |${PageRank.duckRankCtes("e", "src", "dst", iters = 5)}
              |SELECT node, round(CAST(r AS DOUBLE) / ${PageRank.DefaultScale}.0, 6) AS rank
              |FROM r5""".stripMargin)),

    // Label-propagation communities on the weighted co-purchase graph:
    // synchronous updates + min-label tie-break make the classically
    // randomized algorithm bit-deterministic; 3 iterations, per-
    // iteration shape is one src join + one (dst,label) agg + one
    // neighbor-label-table top-1 window.
    // Personalized PageRank (random walk with restart) from the two
    // smallest co-purchase nodes — "customers who bought X…"
    // relatedness; same fixed-point integer iteration as q_pagerank
    // with teleport mass restricted to the seed set.
    Entry("q_ppr",
      (s, d) => {
        val pairs = MarketBasket.coPairs(t(s, d, "lineitem"),
          "l_orderkey", "l_partkey", minPairs = 2)
        val edges = pairs.select(col("item_a").as("src"), col("item_b").as("dst"))
          .union(pairs.select(col("item_b"), col("item_a")))
        val seeds = edges.select(col("src").as("node"))
          .union(edges.select(col("dst"))).distinct()
          .orderBy(col("node")).limit(2)
        PageRank.personalized(edges, "src", "dst", seeds, "node", iters = 4)
      },
      Some(s"""WITH ${MarketBasket.duckCoPairCtes("lineitem", "l_orderkey",
                 "l_partkey", minPairs = 2)},
              |e AS MATERIALIZED (SELECT item_a AS src, item_b AS dst FROM pairs
              |      UNION ALL SELECT item_b, item_a FROM pairs),
              |sd AS (SELECT src AS node FROM e UNION SELECT dst FROM e
              |       ORDER BY 1 LIMIT 2),
              |${PageRank.duckPersonalizedCtes("e", "src", "dst",
                 "SELECT node FROM sd", iters = 4)}
              |SELECT node, round(CAST(r AS DOUBLE) / ${PageRank.DefaultScale}.0, 6) AS rank
              |FROM pr4""".stripMargin)),

    // k-core extraction over the co-purchase graph: 12 fixed peel
    // rounds (covers the measured sf0.01 peel depth of 10; peeling is
    // monotone, so extra rounds are no-ops and the unrolled oracle
    // computes the identical prefix regardless of convergence).
    Entry("q_kcore",
      (s, d) => {
        val pairs = MarketBasket.coPairs(t(s, d, "lineitem"),
          "l_orderkey", "l_partkey", minPairs = 2)
        val edges = pairs.select(col("item_a").as("src"), col("item_b").as("dst"))
          .union(pairs.select(col("item_b"), col("item_a")))
        KCore.coreMembers(edges, "src", "dst", k = 3, iters = 12)
      },
      Some(s"""WITH ${MarketBasket.duckCoPairCtes("lineitem", "l_orderkey",
                 "l_partkey", minPairs = 2)},
              |e AS (SELECT item_a AS src, item_b AS dst FROM pairs
              |      UNION ALL SELECT item_b, item_a FROM pairs),
              |${KCore.duckCoreCtes("e", k = 3, iters = 12)}
              |${KCore.duckCoreSelect(k = 3, iters = 12)}""".stripMargin)),

    // Community detection on the co-purchase graph: synchronous
    // weighted label propagation, fixed iters, integer tie-break --
    // deterministic on any engine (the PageRank/k-core discipline:
    // fixed-point integer state, degree-bounded exchanges).
    // SCOPE BOUND (r12): the gate's co-purchase graph is sliced at
    // l_partkey < 20 000 on BOTH sides — a no-op at sf ≤ 0.1 (the full
    // part range), and at sf1.0 it caps the ORACLE's materialized
    // per-iteration CTE joins, which spilled past the host's disk on
    // the 6 M-row lineitem (the engine side ran fine — LabelProp's
    // exchanges are degree-bounded). Same pattern as q_pipeline_prep.
    Entry("q_label_prop",
      (s, d) => {
        val pairs = MarketBasket.coPairs(
          t(s, d, "lineitem").filter(col("l_partkey") < 20000),
          "l_orderkey", "l_partkey", minPairs = 2)
        val edges = pairs.select(col("item_a").as("src"),
            col("item_b").as("dst"), col("pair_count").as("w"))
          .union(pairs.select(col("item_b"), col("item_a"),
            col("pair_count")))
        LabelProp.communities(edges, "src", "dst", "w", iters = 3)
      },
      Some(s"""WITH ${MarketBasket.duckCoPairCtes(
                 "(SELECT * FROM lineitem WHERE l_partkey < 20000)",
                 "l_orderkey", "l_partkey", minPairs = 2)},
              |edges AS (SELECT item_a AS src, item_b AS dst, pair_count AS w
              |          FROM pairs
              |          UNION ALL SELECT item_b, item_a, pair_count FROM pairs),
              |${LabelProp.duckCommunityCtes(iters = 3)}
              |SELECT node, label AS community FROM lp3""".stripMargin)),

    // Incremental IVF gate: train on the first 400 vectors, append the
    // rest by frozen-centroid assignment (O(batch), no retraining, no
    // pass over the indexed corpus), query the union probing the SAME
    // frozen centroids.
    Entry("q_ann_ivf_incr",
      (s, d) => {
        import s.implicits._
        val emb = t(s, d, "embeddings")
        val base = emb.filter(col("vec_id") < 400)
        val cells = Similarity.kmeansCells(base, "embedding", "vec_id",
          k = 8, iters = 2)
        val baseIdx = base.join(cells, "vec_id")
          .select("vec_id", "embedding", "cell")
        val cents = Similarity.collectCentroids(
          Similarity.centroidsOf(baseIdx, "embedding", "cell"))
        val batch = emb.filter(col("vec_id") >= 400)
        val batchIdx = batch
          .join(Similarity.assignCells(batch, "embedding", "vec_id", cents),
            "vec_id")
          .select("vec_id", "embedding", "cell")
        val union = baseIdx.union(batchIdx)
        Similarity.ivfTopKWith(union, union.filter(col("vec_id") < 10),
          cents.toSeq.toDF("cell", "centroid"),
          "embedding", "vec_id", "cell", k = 5, nProbe = 3)
      },
      Some(Similarity.duckIvfIncrTopK("embeddings", "embedding", "vec_id",
        dim = 64, kCells = 8, iters = 2, splitId = 400, k = 5, nProbe = 3,
        maxQueryId = 10))),

    // Sorted-neighborhood dedup gate: range-sort on a text-prefix key,
    // pair within a fixed window over the sorted order (candidate
    // volume exactly n·(w−1) — no bucket-skew failure mode), verify by
    // exact n-gram Jaccard.
    Entry("q_dedup_snm",
      (s, d) => SortedNeighborhood.pairs(t(s, d, "documents"), "text",
        "doc_id", keyLen = 40, window = 10, n = 3, threshold = 0.5),
      Some(SortedNeighborhood.duckPairs("documents", "text", "doc_id",
        keyLen = 40, window = 10, n = 3, threshold = 0.5))),

    // SNM recall audit vs the exact O(n²) truth on an id-bounded slice:
    // what fraction of true near-dup pairs does the (key, window)
    // configuration co-locate? (Precision is structurally 1.0 — every
    // emitted pair is Jaccard-verified.)
    Entry("q_snm_recall",
      (s, d) => SortedNeighborhood.recallAudit(t(s, d, "documents"), "text",
        "doc_id", keyLen = 40, window = 10, n = 3, threshold = 0.5,
        maxDocId = 500),
      Some(SortedNeighborhood.duckRecallAudit("documents", "text", "doc_id",
        keyLen = 40, window = 10, n = 3, threshold = 0.5, maxDocId = 500))),

    // Market-basket gate: top co-purchased part pairs by lift across
    // orders; exact-integer moments, one double division, TakeOrdered
    // top-k (never a full sort).
    Entry("q_basket_lift",
      (s, d) => MarketBasket.pairLift(t(s, d, "lineitem"),
        "l_orderkey", "l_partkey", minPairs = 2, topK = 100),
      Some(MarketBasket.duckPairLift("lineitem", "l_orderkey", "l_partkey",
        minPairs = 2, topK = 100))),

    // Directional association rules on top of the co-occurrence pairs:
    // X→Y confidence (integer-gated at 10% — the sf0.01 basket mix
    // tops out at 14%), support, lift — the actionable counterpart of
    // symmetric q_basket_lift.
    Entry("q_basket_rules",
      (s, d) => MarketBasket.associationRules(t(s, d, "lineitem"),
        "l_orderkey", "l_partkey", minPairs = 2, minConfPct = 10,
        topK = 100),
      Some(MarketBasket.duckAssociationRules("lineitem", "l_orderkey",
        "l_partkey", minPairs = 2, minConfPct = 10, topK = 100))),

    // Correlation-matrix gate: pairwise Pearson r over lineitem's
    // numeric columns from quantized exact-integer moments, one scan
    // for all pairs. Scales sized to the column magnitudes (price in
    // tenths keeps Σx² far inside BIGINT at any SF).
    Entry("q_corr_matrix",
      (s, d) => Profile.corrMatrix(t(s, d, "lineitem"),
        Seq("l_quantity" -> 10000L, "l_extendedprice" -> 10L,
          "l_discount" -> 10000000L)),
      Some(Profile.duckCorrMatrix("lineitem",
        Seq("l_quantity" -> 10000L, "l_extendedprice" -> 10L,
          "l_discount" -> 10000000L)))),

    // Pairwise mutual information over lineitem's categorical columns:
    // one scan to the full joint table, per-pair cells/marginals from
    // that; micro-nat integer cell contributions keep the cross-cell
    // sum order-independent.
    Entry("q_feature_mi",
      (s, d) => Profile.featureMi(
        t(s, d, "orders").select(col("o_orderstatus"), col("o_orderpriority"),
          year(col("o_orderdate")).cast("int").as("o_year")),
        Seq("o_orderstatus", "o_orderpriority", "o_year")),
      Some(Profile.duckFeatureMi(
        """(SELECT o_orderstatus, o_orderpriority,
           CAST(year(o_orderdate) AS INTEGER) AS o_year FROM orders)""",
        Seq("o_orderstatus", "o_orderpriority", "o_year")))),

    // K-anonymity gate: QI equivalence-class size distribution over
    // customer under a generalized account-balance bucket — the privacy
    // risk report (k=1 rows are unique under the QI tuple).
    Entry("q_kanon",
      (s, d) => Profile.kAnonymity(t(s, d, "customer"),
        Seq("c_nationkey", "c_mktsegment", "floor(c_acctbal / 1000)")),
      Some(Profile.duckKAnonymity("customer",
        Seq("c_nationkey", "c_mktsegment", "floor(c_acctbal / 1000)")))),

    // l-diversity gate next to q_kanon: per-QI-class distinct sensitive
    // values (market segment as the sensitive attribute) — l=1 classes
    // are the homogeneity-attack risk mass a k-only report misses.
    Entry("q_ldiversity",
      (s, d) => Profile.lDiversity(t(s, d, "customer"),
        Seq("c_nationkey", "floor(c_acctbal / 1000)"), "c_mktsegment"),
      Some(Profile.duckLDiversity("customer",
        Seq("c_nationkey", "floor(c_acctbal / 1000)"), "c_mktsegment"))),

    // DP-SHAPED released counts, REPLAY posture: per-nation customer
    // counts + inverse-CDF Laplace(1/ε) over a PUBLISHED salt — the
    // gate verifies the mechanism (one map-side key aggregate, narrow
    // noise projection, clamp) bit-exactly on two engines. It is NOT a
    // privacy release (a recomputable draw masks nothing); the
    // publication path is Profile.dpNoisedCounts(secretSalt).
    Entry("q_dp_counts",
      (s, d) => Profile.dpShapedCountsReplay(t(s, d, "customer"),
        "c_nationkey", epsilon = 0.5),
      Some(Profile.duckDpNoisedCounts("customer", "c_nationkey",
        epsilon = 0.5))),

    // Fano factor of daily volume per type — the Poisson-ness audit
    // behind the z-score/CUSUM monitors' assumptions: F = var/mean of
    // daily counts as ONE exact rational, a single double division.
    Entry("q_fano",
      (s, d) => EventStats.fanoDaily(t(s, d, "events"), "ts", "event_type"),
      Some(EventStats.duckFanoDaily(EvOracle, "ts", "event_type"))),

    // Gini concentration of per-source corpus mass — "ten sources or
    // one source wearing ten names": three exact sums over the ranked
    // group-size table, one division.
    Entry("q_gini",
      (s, d) => Profile.giniConcentration(t(s, d, "documents"), "source"),
      Some(Profile.duckGiniConcentration("documents", "source"))),

    // CUSUM change-point gate: fixed-point integer sequential test over
    // per-type daily volume (accumulates small persistent drifts the
    // pointwise z-score misses).
    Entry("q_cusum",
      (s, d) => EventStats.cusumDaily(t(s, d, "events"), "ts", "event_type",
        kMicro = 500000L, hMicro = 20000000L),
      Some(EventStats.duckCusumDaily(EvOracle, "ts", "event_type",
        kMicro = 500000L, hMicro = 20000000L))),

    // RFM segmentation gate: fixed-threshold tiers (policy, not data
    // artifacts — and no single-partition population NTILE), one user
    // exchange + a 27-cell aggregate. Reference "now" = 2024-02-01.
    Entry("q_rfm",
      (s, d) => Rfm.segments(t(s, d, "events"), "user_id", "ts",
        "event_type", "value", convType = "purchase",
        refMs = 1706745600000L, rDays = (5, 9), fCounts = (15L, 12L),
        mValues = (700.0, 500.0)),
      Some(Rfm.duckSegments(EvOracle, "user_id", "ts", "event_type",
        "value", convType = "purchase", refMs = 1706745600000L,
        rDays = (5, 9), fCounts = (15L, 12L), mValues = (700.0, 500.0)))),

    // Linear multi-touch attribution gate: even credit split across
    // all in-window touches in fixed-point micro-units; the pairing is
    // the user-keyed bucketed interval join, never a nested loop.
    Entry("q_attribution_linear",
      (s, d) => Attribution.linearTouch(t(s, d, "events"),
        "user_id", "ts", "event_id", "event_type", "value",
        touchTypes = Seq("view", "click", "signup"), convType = "purchase",
        lookbackMs = 3L * 24 * 3600 * 1000),
      Some(Attribution.duckLinearTouch(EvOracle, "user_id", "ts", "event_id",
        "event_type", "value",
        touchTypes = Seq("view", "click", "signup"), convType = "purchase",
        lookbackMs = 3L * 24 * 3600 * 1000))),

    // TIME-DECAY multi-touch attribution (12 h half-life): weight
    // 10⁶ >> ⌊Δt/halfLife⌋ — exact integer halving, no pow(); shares
    // are the same fixed-point micro-credits as the linear gate.
    Entry("q_attribution_decay",
      (s, d) => Attribution.timeDecayTouch(t(s, d, "events"),
        "user_id", "ts", "event_id", "event_type", "value",
        touchTypes = Seq("view", "click", "signup"), convType = "purchase",
        lookbackMs = 3L * 24 * 3600 * 1000, halfLifeMs = 12L * 3600 * 1000),
      Some(Attribution.duckTimeDecayTouch(EvOracle, "user_id", "ts",
        "event_id", "event_type", "value",
        touchTypes = Seq("view", "click", "signup"), convType = "purchase",
        lookbackMs = 3L * 24 * 3600 * 1000, halfLifeMs = 12L * 3600 * 1000))),

    // Exact phrase search gate: consecutive in-order token match via
    // aligned-anchor bitmask aggregation — one explode (query-term
    // postings only), one (doc, anchor) aggregate, no join chain.
    Entry("q_phrase_search",
      (s, d) => Phrase.phraseHits(t(s, d, "documents"), "text", "doc_id",
        phrase = Seq("table", "value")),
      Some(Phrase.duckPhraseHits("documents", "text", "doc_id",
        phrase = Seq("table", "value")))),

    // Item-item neighborhood similarity gate ("users also bought"):
    // basket-set Jaccard via postings intersection, per-item top-3
    // neighbors over the pair set.
    Entry("q_item_neighbors",
      (s, d) => MarketBasket.itemNeighbors(t(s, d, "lineitem"),
        "l_orderkey", "l_partkey", minPairs = 2, topK = 3),
      Some(MarketBasket.duckItemNeighbors("lineitem", "l_orderkey",
        "l_partkey", minPairs = 2, topK = 3))),

    // Last-touch attribution gate: purchases credited to the user's
    // most recent view/click/signup inside a 3-day lookback; one
    // user-key exchange, no touch×conversion self-join.
    Entry("q_attribution",
      (s, d) => Attribution.lastTouch(t(s, d, "events"),
        "user_id", "ts", "event_id", "event_type", "value",
        touchTypes = Seq("view", "click", "signup"), convType = "purchase",
        lookbackMs = 3L * 24 * 3600 * 1000),
      Some(Attribution.duckLastTouch(EvOracle, "user_id", "ts", "event_id",
        "event_type", "value",
        touchTypes = Seq("view", "click", "signup"), convType = "purchase",
        lookbackMs = 3L * 24 * 3600 * 1000))),

    // Markov removal-effect attribution — the data-driven member of the
    // attribution family: one user-keyed exchange builds the journey
    // transition matrix ((channels+2)² rows — metadata), then exact
    // fixed-point value iteration (driver-side BigInt ≡ oracle HUGEINT
    // CTE chain) prices each channel by the conversion probability that
    // dies with it.
    Entry("q_attribution_markov",
      (s, d) => Attribution.markovRemoval(t(s, d, "events"),
        "user_id", "ts", "event_id", "event_type",
        touchTypes = Seq("view", "click", "signup"), convType = "purchase",
        iters = 12),
      Some(Attribution.duckMarkovRemoval(EvOracle, "user_id", "ts",
        "event_id", "event_type",
        touchTypes = Seq("view", "click", "signup"), convType = "purchase",
        iters = 12))),

    // Order-independent dataset checksum (sync audit): per-row md5 ->
    // fingerprint folded two ways (XOR + bucketed modular SUM, the
    // even-multiplicity blind-spot fix) in ONE pass; ignore-columns
    // exercised so the hash-input projection is schema-sorted.
    Entry("q_content_checksum",
      (s, d) => RowHash.contentChecksum(t(s, d, "orders"),
        ignoreColumns = Set("o_totalprice")),
      Some(s"""SELECT CAST(count(*) AS BIGINT) AS n_rows,
                      CAST(bit_xor(fp) AS BIGINT) AS checksum,
                      CAST(sum(CAST(fp AS HUGEINT)) % ${graft.functions.TextAnalysis.FpMod} AS BIGINT) AS checksum_add
               FROM (SELECT (${graft.functions.TextAnalysis.duckFingerprint(
                 """md5('{"o_custkey":' || o_custkey ||
                   |',"o_orderdate":"' || strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S.%g') ||
                   |'","o_orderkey":' || o_orderkey ||
                   |',"o_orderpriority":"' || o_orderpriority ||
                   |'","o_orderstatus":"' || o_orderstatus ||
                   |'"}')""".stripMargin.linesIterator.map(_.trim).mkString)}) AS fp
                     FROM orders)""")),

    // ── Bounded oracles for the mult-1000 tier (r16, VERDICT r15 #4) ──
    // The 600 M-row fixture previously carried NO oracle (row-level
    // DuckDB compare infeasible at 20 GB inputs). These twins SF-tier a
    // deterministic slice from the fixture's footer row count — the
    // q_range_join_sample pattern, identical tier arithmetic on both
    // engines via `(SELECT count(*) FROM t)` (footer-answered in
    // DuckDB) — so each headline family keeps a row/schema/hash-level
    // oracle at EVERY tier: full input at the driver's SFs, ~150 k-row
    // slices at sf100. The unsliced headline gates stay untouched (they
    // are the bench surface); the twins are the correctness carriers.

    // scd-latest over an o_custkey-deterministic slice: modulus on the
    // PARTITION key keeps every sliced group complete, so the window
    // semantics are identical to the full gate's on the kept keys.
    Entry("q_scd_latest_tiered",
      (s, d) => {
        val n = FixtureProbe.rowCount(s, d, "orders")
        val m = if (n <= 2000000L) 1L else if (n <= 20000000L) 101L else 1009L
        Sync.plan(
          t(s, d, "orders").filter(pmod(col("o_custkey"), lit(m)) === 0L),
          SyncMode.ScdLatest("o_custkey", "o_orderdate", keepRank = true,
            tieBreakers = Seq("o_orderkey")))
          .withColumn("row_num", col("row_num").cast("long"))
      },
      Some("""SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY o_custkey
                  ORDER BY o_orderdate DESC, o_orderkey DESC) AS row_num
                FROM orders
                WHERE o_custkey % (CASE WHEN (SELECT count(*) FROM orders) <= 2000000 THEN 1
                                        WHEN (SELECT count(*) FROM orders) <= 20000000 THEN 101
                                        ELSE 1009 END) = 0) RankedRows
              WHERE row_num = 1""")),

    // FULL-data cardinality audit for scd-latest — the aggregate-count
    // companion (the q_range_join_count pattern): the operator's output
    // cardinality over the ENTIRE fixture equals the distinct partition
    // keys, which DuckDB aggregates without sorting/hashing row-level
    // output even at 150 M orders — top-tier correctness signal on the
    // unsliced data.
    Entry("q_scd_latest_keys",
      (s, d) => Sync.latestByGroup(t(s, d, "orders"), "o_custkey",
          struct(col("o_orderdate"), col("o_orderkey")))
        .agg(count(lit(1)).as("n_latest_rows"),
          countDistinct(col("o_custkey")).as("n_distinct_keys")),
      Some("""SELECT count(DISTINCT o_custkey) AS n_latest_rows,
                     count(DISTINCT o_custkey) AS n_distinct_keys
              FROM orders""")),

    // CDC first-sync over an event_id-deterministic slice; the
    // synthesized change-type mapping keys on event_id, so the slice's
    // fold keeps the exact full-gate semantics on the kept ids.
    Entry("q_cdc_sync_tiered",
      (s, d) => {
        val n = FixtureProbe.rowCount(s, d, "events")
        val m = if (n <= 2000000L) 1L else if (n <= 20000000L) 101L else 677L
        val log = ChangeLog.synthesize(
          t(s, d, "events").filter(pmod(col("event_id"), lit(m)) === 0L),
          "event_id", "ts")
        ChangeLog.snapshotAsOf(log, Seq("event_id"), ChangeLog.latestCommitMs(log))
      },
      Some(s"""SELECT 'INSERT' AS _mp_change_type, event_id, ts, user_id,
                      event_type, value, props
               FROM $EvOracle e WHERE event_id % 10 < 8
                 AND event_id % (CASE WHEN (SELECT count(*) FROM events) <= 2000000 THEN 1
                                      WHEN (SELECT count(*) FROM events) <= 20000000 THEN 101
                                      ELSE 677 END) = 0""")),

    // MinHash-LSH near-dup over a deterministic BLOCK slice: keep whole
    // contiguous 500-doc blocks ((doc_id div 500) % m = 0), ~500–1500
    // docs per tier (the exact-pairwise oracle's feasible region). A
    // plain id-modulus slice would be VACUOUS above sf1.0 — the scale
    // fixture plants its dup pairs id-ADJACENTLY ((id−1, id) at
    // id≡99 mod 100, (id−2, id) at id≡499 mod 500,
    // MakeScaleFixture.documents) and no m>1 keeps both endpoints; the
    // 500-block slice preserves every planted pair because pair offsets
    // (97‥99, 497‥499) never straddle a 500 boundary.
    Entry("q_dedup_minhash_tiered",
      (s, d) => {
        val n = FixtureProbe.rowCount(s, d, "documents")
        val m = if (n <= 1600L) 1L else if (n <= 160000L) 101L
                else if (n <= 1600000L) 499L else 3989L
        Dedup.minhashLshPairs(
          t(s, d, "documents")
            .filter(pmod(expr("doc_id div 500"), lit(m)) === 0L),
          "text", "doc_id", n = 3, bands = 42, rowsPerBand = 3, threshold = 0.5)
      },
      Some(Dedup.duckNgramJaccardPairs(
        """(SELECT * FROM documents
           WHERE (doc_id // 500) % (CASE WHEN (SELECT count(*) FROM documents) <= 1600 THEN 1
                                         WHEN (SELECT count(*) FROM documents) <= 160000 THEN 101
                                         WHEN (SELECT count(*) FROM documents) <= 1600000 THEN 499
                                         ELSE 3989 END) = 0)""",
        "text", "doc_id", n = 3, threshold = 0.5, maxDocId = Long.MaxValue))),

    // HLL registers over an event_id-deterministic slice (~1 M rows at
    // sf100): register-bitwise oracle at every tier.
    Entry("q_hll_tiered",
      (s, d) => {
        val n = FixtureProbe.rowCount(s, d, "events")
        val m = if (n <= 2000000L) 1L else if (n <= 20000000L) 11L else 101L
        Sketches.hllDistinct(
          t(s, d, "events").filter(pmod(col("event_id"), lit(m)) === 0L),
          "user_id", "event_type")
      },
      Some(Sketches.duckHllDistinct(
        s"""(SELECT * FROM $EvOracle e
            WHERE event_id % (CASE WHEN (SELECT count(*) FROM events) <= 2000000 THEN 1
                                   WHEN (SELECT count(*) FROM events) <= 20000000 THEN 11
                                   ELSE 101 END) = 0)""",
        "user_id", "event_type")))
  )

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(e => e.name -> e.fn).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(e => e.oracle.map(o => e.name -> normalize(o))).toMap

  /** Collapse the multiline indentation of oracle literals to single-line
    * SQL (cosmetic; keeps the JSON dump readable).
    */
  private def normalize(sql: String): String =
    sql.linesIterator.map(_.trim).filter(_.nonEmpty).mkString(" ")
}
