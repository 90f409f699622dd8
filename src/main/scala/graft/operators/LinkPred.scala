package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Common-neighbor link prediction over an undirected graph —
  * Adamic–Adar scoring of NON-edges ("customers who bought both X and Y
  * also bought…", entity-resolution candidate pairs, knowledge-graph
  * completion): a candidate pair (v, w) scores Σ_z 1/ln(deg z) over
  * their shared neighbors z, so rare shared neighbors count for more
  * than promiscuous hubs (Adamic & Adar 2003).
  *
  * Scale shape: candidate pairs come from per-pivot neighbor-pair
  * fan-out — Σ deg(z)² wedges, the same volume class as the naive
  * neighbor self-join triangle counters avoid. Unlike triangle
  * counting, link prediction NEEDS every wedge at every pivot (the
  * degree-ordered trim would drop candidate pairs), so the skew guard
  * is a pivot-degree CAP instead: pivots with deg > maxPivotDeg are
  * excluded from wedge generation. That cap is principled, not just
  * protective — a hub shared by everyone contributes at most
  * 1/ln(maxPivotDeg) ≈ noise per pair while generating deg² of the
  * total wedge volume, so the dropped mass is the least informative
  * signal on the graph (the repo-wide cap-drop posture; the drop IS a
  * queryable metric — [[pivotCapAudit]]). With the cap, wedge volume
  * is ≤ n·maxPivotDeg² and every stage is an equi-join / hash
  * aggregate.
  *
  * Determinism: each pivot's contribution is µ-quantized ONCE
  * (aaµ = round(10⁶/ln deg), an exact BIGINT), so the per-pair sum is
  * order-independent and oracle-hash-exact; common-neighbor counts are
  * exact integers. Existing edges are removed with an anti-join. Top-k
  * is (score DESC, v ASC, w ASC) — fully tie-broken.
  *
  * Output: top-k rows (item_a, item_b, common_n, aa_score).
  */
object LinkPred {

  def adamicAdar(edges: DataFrame, srcCol: String, dstCol: String,
                 topK: Int, maxPivotDeg: Int = 1000): DataFrame = {
    // canonical undirected edges a < b, deduped
    val ce = edges.select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    // full adjacency (both directions) + pivot degrees
    val adj = ce.select(col("a").as("z"), col("b").as("n"))
      .union(ce.select(col("b"), col("a")))
    val deg = adj.groupBy(col("z")).agg(count(lit(1)).as("deg"))
    // µ-quantized pivot weight; deg 1 pivots have no pairs, deg > cap
    // pivots are the skew guard's drop set
    val pivots = adj.join(
      deg.filter(col("deg") >= 2L && col("deg") <= maxPivotDeg)
        .withColumn("aamu",
          round(lit(1e6) / log(col("deg").cast("double"))).cast("long")),
      "z")
    // neighbor pairs per pivot (v < w), then the pair-keyed aggregate
    val cand = pivots.as("x").join(pivots.as("y"),
        col("x.z") === col("y.z") && col("x.n") < col("y.n"))
      .select(col("x.n").as("item_a"), col("y.n").as("item_b"),
        col("x.aamu").as("aamu"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("common_n"), sum(col("aamu")).as("_s"))
    // non-edges only: the prediction target is absent links
    cand.join(ce, cand("item_a") === ce("a") && cand("item_b") === ce("b"),
        "left_anti")
      .orderBy(col("_s").desc, col("item_a").asc, col("item_b").asc)
      .limit(topK)
      .select(col("item_a"), col("item_b"), col("common_n"),
        round(col("_s").cast("double") / 1e6, 6).as("aa_score"))
  }

  /** DuckDB oracle CTEs for [[adamicAdar]] over an edge relation named
    * `edgesRel` (same canonicalization, same µ-quantized weights, same
    * cap, same tie-broken top-k).
    */
  def duckAdamicAdar(edgesRel: String, srcCol: String, dstCol: String,
                     topK: Int, maxPivotDeg: Int = 1000): String =
    s"""WITH ce AS (SELECT DISTINCT least($srcCol, $dstCol) AS a,
       |                   greatest($srcCol, $dstCol) AS b
       |            FROM $edgesRel WHERE $srcCol <> $dstCol),
       |adj AS (SELECT a AS z, b AS n FROM ce
       |        UNION ALL SELECT b, a FROM ce),
       |deg AS (SELECT z, CAST(count(*) AS BIGINT) AS deg FROM adj GROUP BY z),
       |piv AS (SELECT adj.z, adj.n,
       |               CAST(round(1000000.0 / ln(CAST(deg AS DOUBLE)))
       |                    AS BIGINT) AS aamu
       |        FROM adj JOIN deg ON adj.z = deg.z
       |        WHERE deg >= 2 AND deg <= $maxPivotDeg),
       |cand AS (
       |  SELECT x.n AS item_a, y.n AS item_b,
       |         CAST(count(*) AS BIGINT) AS common_n,
       |         CAST(sum(x.aamu) AS BIGINT) AS s
       |  FROM piv x JOIN piv y ON x.z = y.z AND x.n < y.n
       |  GROUP BY 1, 2),
       |ne AS (SELECT cand.* FROM cand
       |       ANTI JOIN ce ON cand.item_a = ce.a AND cand.item_b = ce.b)
       |SELECT item_a, item_b, common_n,
       |       round(CAST(s AS DOUBLE) / 1e6, 6) AS aa_score
       |FROM ne
       |ORDER BY s DESC, item_a ASC, item_b ASC
       |LIMIT $topK""".stripMargin

  /** Exact 2-hop reachability per node — the neighborhood-growth
    * profile ("how much of the graph is two links away"): per node the
    * count of DISTINCT nodes at distance ≤ 2, next to its direct
    * degree. The ratio n_2hop/deg separates tree-like sparseness from
    * dense community pockets, and the distribution is the radius-2
    * prefix of the neighborhood function (effective-diameter
    * analysis).
    *
    * Scale shape: wedge fan-out capped by the same pivot-degree guard
    * as [[adamicAdar]] (an uncapped hub makes Σ deg² of 2-hop pairs),
    * then ONE distinct over (node, reached) and a count — all
    * equi-joins and hash aggregates. Exact distinct is the gate
    * semantics; at radius > 2 or web scale the production path swaps
    * the distinct for per-node HLL registers merged along edges
    * (HyperANF, Boldi et al. 2011) — the registers are the
    * [[Sketches]] machinery this repo already gates.
    *
    * Output: (node, degree, n_2hop) — n_2hop counts distance ≤ 2,
    * self excluded.
    */
  def twoHopReach(edges: DataFrame, srcCol: String, dstCol: String,
                  maxPivotDeg: Int = 1000): DataFrame = {
    val ce = edges.select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val adj = ce.select(col("a").as("z"), col("b").as("n"))
      .union(ce.select(col("b"), col("a")))
    val deg = adj.groupBy(col("z")).agg(count(lit(1)).as("degree"))
    val pivots = adj.join(
      deg.filter(col("degree") <= maxPivotDeg), "z")
    val twoHop = pivots.as("x").join(pivots.as("y"),
        col("x.z") === col("y.z") && col("x.n") =!= col("y.n"))
      .select(col("x.n").as("node"), col("y.n").as("reached"))
    val reach = adj.select(col("z").as("node"), col("n").as("reached"))
      .union(twoHop)
      .distinct()
      .groupBy(col("node")).agg(count(lit(1)).as("n_2hop"))
    deg.select(col("z").as("node"), col("degree"))
      .join(reach, Seq("node"))
  }

  /** Pivot-cap DROP ACCOUNTING for the wedge-generating operators
    * ([[adamicAdar]], [[twoHopReach]]) — the repo-wide rule that every
    * skew-guard cap must be a queryable metric, not a silent recall
    * loss: reports how many pivots the cap excludes and what share of
    * the TOTAL wedge volume (Σ deg·(deg−1)/2) they carried — i.e. the
    * fraction of candidate evidence the guard trades for boundedness.
    * wedge_kept_frac near 1 says the cap only sheds hub noise; a low
    * value says the graph IS its hubs and the cap needs raising (or
    * the hub family needs its own path).
    *
    * One degree aggregate — the same table the capped operators build
    * anyway. Output 1 row: (n_nodes, n_capped_pivots, n_wedges_total,
    * n_wedges_dropped, wedge_kept_frac).
    */
  def pivotCapAudit(edges: DataFrame, srcCol: String, dstCol: String,
                    maxPivotDeg: Int = 1000): DataFrame = {
    val ce = edges.select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val deg = ce.select(col("a").as("z")).union(ce.select(col("b")))
      .groupBy(col("z")).agg(count(lit(1)).as("deg"))
    val wedges = expr("deg * (deg - 1L) DIV 2")
    deg.agg(
        count(lit(1L)).as("n_nodes"),
        count(when(col("deg") > maxPivotDeg, lit(1))).as("n_capped_pivots"),
        sum(wedges).as("n_wedges_total"),
        sum(when(col("deg") > maxPivotDeg, wedges).otherwise(0L))
          .as("n_wedges_dropped"))
      .select(col("n_nodes"), col("n_capped_pivots"),
        col("n_wedges_total"), col("n_wedges_dropped"),
        when(col("n_wedges_total") === 0L, lit(null).cast("double"))
          .otherwise(round((col("n_wedges_total") - col("n_wedges_dropped"))
            .cast("double") / col("n_wedges_total").cast("double"), 6))
          .as("wedge_kept_frac"))
  }

  /** DuckDB oracle twin of [[pivotCapAudit]]. */
  def duckPivotCapAudit(edgesRel: String, srcCol: String, dstCol: String,
                        maxPivotDeg: Int = 1000): String =
    s"""WITH ce AS (SELECT DISTINCT least($srcCol, $dstCol) AS a,
       |                   greatest($srcCol, $dstCol) AS b
       |            FROM $edgesRel WHERE $srcCol <> $dstCol),
       |deg AS (SELECT z, CAST(count(*) AS BIGINT) AS deg FROM
       |          (SELECT a AS z FROM ce UNION ALL SELECT b FROM ce)
       |        GROUP BY z),
       |agg AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_nodes,
       |         CAST(count(*) FILTER (WHERE deg > $maxPivotDeg) AS BIGINT)
       |           AS n_capped_pivots,
       |         CAST(sum(deg * (deg - 1) // 2) AS BIGINT) AS n_wedges_total,
       |         CAST(coalesce(sum(deg * (deg - 1) // 2)
       |                FILTER (WHERE deg > $maxPivotDeg), 0) AS BIGINT)
       |           AS n_wedges_dropped
       |  FROM deg)
       |SELECT n_nodes, n_capped_pivots, n_wedges_total, n_wedges_dropped,
       |       CASE WHEN n_wedges_total <> 0 THEN
       |         round(CAST(n_wedges_total - n_wedges_dropped AS DOUBLE)
       |               / CAST(n_wedges_total AS DOUBLE), 6) END
       |         AS wedge_kept_frac
       |FROM agg""".stripMargin

  /** HyperANF radius-2 neighborhood estimation (Boldi, Rosa & Vigna
    * 2011) — the SCALE PATH [[twoHopReach]]'s docs promise: instead of
    * materializing the 2-hop pair set (Σ deg² wedges, hence the pivot
    * cap), every node keeps a 64-register HLL sketch of its 1-hop set
    * and radius 2 is ONE register-merge pulled across each edge —
    * join volume m·(registers ≤ 64), EDGE-linear, no wedge explosion,
    * no cap, no recall loss to audit. Radius r is r−1 repetitions of
    * the same merge; registers stay 64 numbers per node at any corpus.
    *
    * Uses the [[Sketches]] register machinery verbatim (same
    * fingerprint hash, same ρ, same two-branch estimator), so the
    * oracle mirrors it bit-for-bit — the gate pins the REGISTERS, not
    * an approximate count against truth (q_two_hop's exact twin is the
    * accuracy audit at gate scale).
    *
    * Semantics note: the estimated set is the BALL including the
    * center (u is a neighbor's neighbor whenever deg(u) ≥ 1 — the
    * HyperANF convention); [[twoHopReach]]'s exact count excludes
    * self, so the expected offset is +1.
    *
    * Output: (node, degree, hll_ball2).
    */
  def twoHopReachHll(edges: DataFrame, srcCol: String,
                     dstCol: String): DataFrame = {
    val ce = edges.select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    twoHopReachHllCanonical(ce)
  }

  /** [[twoHopReachHll]] body over an edge set that is ALREADY canonical
    * (columns `a < b`, distinct) — split out (r15) so the capped
    * variant, whose cap pipeline produces exactly that shape, does not
    * pay a second canonicalize+distinct exchange over the full edge
    * set just to re-derive what it already has.
    */
  private def twoHopReachHllCanonical(ce: DataFrame): DataFrame = {
    val adj = ce.select(col("a").as("z"), col("b").as("n"))
      .union(ce.select(col("b"), col("a")))
    val deg = adj.groupBy(col("z")).agg(count(lit(1)).as("degree"))
    val h = graft.functions.TextAnalysis.fingerprint(col("n").cast("string"))
    val regs1 = adj
      .select(col("z").as("node"),
        pmod(h, lit(Sketches.HllM.toLong)).as("_bucket"),
        Sketches.rhoOf(h).as("_rho"))
      .groupBy(col("node"), col("_bucket")).agg(max(col("_rho")).as("_mrho"))
    // radius-2 = each node pulls its neighbors' 1-hop registers across
    // the edge and max-merges with its own — the whole step is one
    // edge-keyed equi-join + one (node, bucket) aggregate
    val pulled = adj
      .join(regs1.withColumnRenamed("node", "n"), "n")
      .select(col("z").as("node"), col("_bucket"), col("_mrho"))
    val merged = regs1.union(pulled)
      .groupBy(col("node"), col("_bucket")).agg(max(col("_mrho")).as("_mrho"))
    val sketch = merged.groupBy(col("node")).agg(
      count(lit(1)).as("_nb"),
      sum(lit(1.0) / expr("shiftleft(CAST(1 AS BIGINT), CAST(_mrho AS INT))")
        .cast("double")).as("_dpres"))
    deg.select(col("z").as("node"), col("degree"))
      .join(sketch, Seq("node"))
      .select(col("node"), col("degree"),
        round(Sketches.hllEstimate, 6).as("hll_ball2"))
  }

  /** DuckDB oracle twin of [[twoHopReachHll]] — identical registers,
    * merge, and estimator.
    */
  def duckTwoHopReachHll(edgesRel: String, srcCol: String,
                         dstCol: String): String = {
    import Sketches.{HllM, HllSentinel}
    val fp = graft.functions.TextAnalysis.duckFingerprint("CAST(n AS VARCHAR)")
    s"""WITH ce AS MATERIALIZED (SELECT DISTINCT least($srcCol, $dstCol) AS a,
       |                   greatest($srcCol, $dstCol) AS b
       |            FROM $edgesRel WHERE $srcCol <> $dstCol),
       |adj AS MATERIALIZED (SELECT a AS z, b AS n FROM ce
       |        UNION ALL SELECT b, a FROM ce),
       |deg AS (SELECT z, CAST(count(*) AS BIGINT) AS degree
       |        FROM adj GROUP BY z),
       |hh AS (SELECT z AS node, ($fp) AS h FROM adj),
       |r1 AS (SELECT node, h % $HllM AS bucket,
       |              1 + CAST(log2(x & (-x)) AS BIGINT) AS rho
       |       FROM (SELECT node, h, (h // $HllM) | $HllSentinel AS x FROM hh)),
       |reg1 AS MATERIALIZED (SELECT node, bucket, max(rho) AS mrho FROM r1 GROUP BY 1, 2),
       |pulled AS (SELECT adj.z AS node, reg1.bucket, reg1.mrho
       |           FROM adj JOIN reg1 ON adj.n = reg1.node),
       |merged AS (SELECT node, bucket, max(mrho) AS mrho
       |           FROM (SELECT * FROM reg1 UNION ALL SELECT * FROM pulled)
       |           GROUP BY 1, 2),
       |sk AS (SELECT node, count(*) AS nb,
       |              sum(1.0 / CAST(CAST(1 AS BIGINT) << CAST(mrho AS INT)
       |                             AS DOUBLE)) AS dpres
       |       FROM merged GROUP BY 1)
       |SELECT deg.z AS node, degree,
       |       round(${Sketches.duckHllEstimate("nb", "dpres")}, 6) AS hll_ball2
       |FROM deg JOIN sk ON deg.z = sk.node""".stripMargin
  }

  /** DEGREE-CAPPED [[twoHopReachHll]] (r14, VERDICT r13 #4): drop
    * every canonical edge with an endpoint of degree > `maxDeg` and run
    * the HLL radius-2 estimator on the surviving subgraph. Purpose: a
    * BOUNDED oracle shape for the top-SF audits — the full gate's
    * DuckDB twin must materialize the exact two-hop expansion the HLL
    * sketch exists to avoid, which spilled past the host's disk on the
    * sf10 mult-100 graph (BASELINE.md r13); with both endpoints capped
    * the oracle's expansion is ≤ n·maxDeg², DuckDB-feasible at any SF.
    * On the shipped fixtures (degree ≤ 15 at cap 16) the subgraph is
    * the whole graph, so the small-SF gate stays non-vacuous and
    * coincides with [[twoHopReachHll]]. Output degrees are degrees IN
    * the capped subgraph (the oracle mirrors the same cap).
    */
  def twoHopReachHllCapped(edges: DataFrame, srcCol: String,
                           dstCol: String, maxDeg: Int): DataFrame = {
    val ce = edges.select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val adj = ce.select(col("a").as("z"), col("b").as("n"))
      .union(ce.select(col("b"), col("a")))
    val ok = adj.groupBy(col("z")).agg(count(lit(1)).as("_d"))
      .filter(col("_d") <= maxDeg).select(col("z"))
    // ce is canonical+distinct and the semijoins preserve that, so the
    // HLL chain runs on it directly — no second distinct exchange.
    val capped = ce
      .join(ok.withColumnRenamed("z", "a"), "a")
      .join(ok.withColumnRenamed("z", "b"), "b")
      .select(col("a"), col("b"))
    twoHopReachHllCanonical(capped)
  }

  /** DuckDB oracle twin of [[twoHopReachHllCapped]] — same cap, then
    * the standard register/merge/estimator chain over the capped rel.
    */
  def duckTwoHopReachHllCapped(edgesRel: String, srcCol: String,
                               dstCol: String, maxDeg: Int): String =
    s"""WITH kce AS MATERIALIZED (SELECT DISTINCT least($srcCol, $dstCol) AS a,
       |                    greatest($srcCol, $dstCol) AS b
       |             FROM $edgesRel WHERE $srcCol <> $dstCol),
       |kadj AS MATERIALIZED (SELECT a AS z, b AS n FROM kce
       |         UNION ALL SELECT b, a FROM kce),
       |kok AS MATERIALIZED (SELECT z FROM kadj GROUP BY z HAVING count(*) <= $maxDeg),
       |kpe AS MATERIALIZED (SELECT kce.a AS $srcCol, kce.b AS $dstCol FROM kce
       |        JOIN kok ka ON kce.a = ka.z
       |        JOIN kok kb ON kce.b = kb.z)
       |SELECT * FROM (
       |${duckTwoHopReachHll("kpe", srcCol, dstCol)}
       |)""".stripMargin

  /** DuckDB oracle twin of [[twoHopReach]]. */
  def duckTwoHopReach(edgesRel: String, srcCol: String, dstCol: String,
                      maxPivotDeg: Int = 1000): String =
    s"""WITH ce AS (SELECT DISTINCT least($srcCol, $dstCol) AS a,
       |                   greatest($srcCol, $dstCol) AS b
       |            FROM $edgesRel WHERE $srcCol <> $dstCol),
       |adj AS (SELECT a AS z, b AS n FROM ce
       |        UNION ALL SELECT b, a FROM ce),
       |deg AS (SELECT z, CAST(count(*) AS BIGINT) AS degree
       |        FROM adj GROUP BY z),
       |piv AS (SELECT adj.z, adj.n FROM adj JOIN deg ON adj.z = deg.z
       |        WHERE degree <= $maxPivotDeg),
       |reach AS (
       |  SELECT node, CAST(count(*) AS BIGINT) AS n_2hop FROM (
       |    SELECT DISTINCT node, reached FROM (
       |      SELECT z AS node, n AS reached FROM adj
       |      UNION ALL
       |      SELECT x.n AS node, y.n AS reached
       |      FROM piv x JOIN piv y ON x.z = y.z AND x.n <> y.n))
       |  GROUP BY node)
       |SELECT deg.z AS node, degree, n_2hop
       |FROM deg JOIN reach ON deg.z = reach.node""".stripMargin
}
