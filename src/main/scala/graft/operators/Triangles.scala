package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting + global clustering coefficient over an
  * undirected edge list — the graph-cohesion profile of a co-occurrence
  * graph (co-purchase density, entity-linkage quality, community
  * structure of a citation/link corpus).
  *
  * Scale shape — DEGREE-ORDERED ORIENTATION (the MapReduce classic,
  * Suri & Vassilvitskii 2011): orient every undirected edge from its
  * lower-degree endpoint to its higher-degree endpoint (degree ties
  * break on node id, so the orientation is a total order and every
  * triangle is counted EXACTLY once). Wedge generation then fans out
  * from each node's OUT-neighborhood, whose size is bounded by
  * O(√m) — the hub that would explode a naive neighbor self-join
  * (deg² wedges on the skew node) instead contributes only its
  * low-degree edges. Total wedge volume is Σ outdeg² = O(m^1.5) worst
  * case, linear on real power-law graphs. Both stages are equi-joins:
  * wedges = oriented ⋈ oriented on the pivot, closures = wedges ⋈
  * oriented on the (far, far) pair. Exact BIGINT arithmetic throughout
  * → oracle-hash-exact.
  *
  * Wedge census: open-wedge count is Σ C(deg, 2) per node (exact
  * integers, map-side combinable); global clustering coefficient =
  * 3·triangles / wedges with ONE final double division.
  */
object Triangles {

  /** One-row summary: (n_edges, n_triangles, n_wedges, clustering).
    * `edges` may contain duplicates or self-loops in either
    * orientation; they are canonicalized away first.
    */
  def census(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    // canonical undirected edges a < b, deduped
    val ce = edges.select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val deg = ce.select(col("a").as("node"))
      .union(ce.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // orient low-(deg, id) → high-(deg, id)
    val withDeg = ce
      .join(deg.select(col("node").as("a"), col("deg").as("_da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("_db")), "b")
    // Each oriented edge carries the head's (deg, id) so wedge pairs
    // can be canonicalized in ORIENTATION order — then the closing
    // edge, if present, is oriented exactly v→w and closure is a
    // single equi-join (an either-direction probe would be an OR of
    // equi-pairs, which plans as a nested loop).
    val oriented = withDeg.select(
      when(col("_da") < col("_db") ||
        (col("_da") === col("_db") && col("a") < col("b")),
        struct(col("a").as("u"), col("b").as("v"), col("_db").as("dv")))
        .otherwise(struct(col("b").as("u"), col("a").as("v"),
          col("_da").as("dv"))).as("_e"))
      .select(col("_e.u").as("u"), col("_e.v").as("v"), col("_e.dv").as("dv"))
    // wedges from each pivot u: out-neighbor pairs, (v, w) ascending in
    // the same (deg, id) total order the orientation uses
    val wedges = oriented.as("x").join(oriented.as("y"),
        col("x.u") === col("y.u") &&
          (col("x.dv") < col("y.dv") ||
            (col("x.dv") === col("y.dv") && col("x.v") < col("y.v"))))
      .select(col("x.v").as("v"), col("y.v").as("w"))
    val closing = oriented.select(col("u").as("v"), col("v").as("w"))
    val tri = wedges.join(closing, Seq("v", "w"))
      .agg(count(lit(1)).as("n_triangles"))
    val stats = ce.agg(count(lit(1)).as("n_edges"))
      .crossJoin(deg.agg(
        sum(expr("deg * (deg - 1L) div 2")).as("n_wedges")))
    broadcast(stats).crossJoin(tri)
      .select(col("n_edges"), col("n_triangles"), col("n_wedges"),
        when(col("n_wedges") === 0L, lit(null).cast("double"))
          .otherwise(round(lit(3.0) * col("n_triangles").cast("double")
            / col("n_wedges").cast("double"), 6)).as("clustering"))
  }

  /** DuckDB oracle twin of [[census]]: the orientation is an execution
    * strategy, not a semantics — the oracle counts canonical ordered
    * triples (x<y<z with all three edges present) directly, which any
    * correct triangle counter must equal.
    */
  /** Log2-binned degree histogram of the canonical undirected graph —
    * the power-law fingerprint (and the skew early-warning for every
    * per-neighbor join downstream). Bin = ⌊log2 deg⌋ computed as
    * `length(bin(deg)) − 1` — pure INTEGER/string arithmetic, because a
    * floating log2 of an exact integer is not guaranteed to round
    * identically across engines at bin boundaries.
    * Output: (bucket, deg_lo, n_nodes) for non-empty buckets.
    */
  def degreeHistogram(edges: DataFrame, srcCol: String,
                      dstCol: String): DataFrame = {
    val ce = edges.select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    ce.select(col("a").as("node")).union(ce.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
      .select((length(bin(col("deg"))) - 1).cast("int").as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_nodes"))
      .select(col("bucket"), expr("shiftleft(1L, bucket)").as("deg_lo"),
        col("n_nodes"))
  }

  /** DuckDB oracle twin of [[degreeHistogram]]. */
  def duckDegreeHistogram(edgesRel: String, srcCol: String,
                          dstCol: String): String =
    s"""WITH ce AS (SELECT DISTINCT least($srcCol, $dstCol) AS a,
       |                   greatest($srcCol, $dstCol) AS b
       |            FROM $edgesRel WHERE $srcCol <> $dstCol),
       |deg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg FROM
       |          (SELECT a AS node FROM ce UNION ALL SELECT b FROM ce)
       |        GROUP BY 1)
       |SELECT bucket, CAST(1 AS BIGINT) << bucket AS deg_lo,
       |       CAST(count(*) AS BIGINT) AS n_nodes
       |FROM (SELECT CAST(length(bin(deg)) - 1 AS INTEGER) AS bucket FROM deg)
       |GROUP BY 1""".stripMargin

  def duckCensusCtes(edgesRel: String, srcCol: String,
                     dstCol: String): String =
    s"""ce AS (SELECT DISTINCT least($srcCol, $dstCol) AS a,
       |              greatest($srcCol, $dstCol) AS b
       |       FROM $edgesRel WHERE $srcCol <> $dstCol),
       |deg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg FROM
       |          (SELECT a AS node FROM ce UNION ALL SELECT b FROM ce)
       |        GROUP BY 1),
       |tri AS (SELECT CAST(count(*) AS BIGINT) AS n_triangles
       |        FROM ce e1
       |          JOIN ce e2 ON e2.a = e1.a AND e2.b > e1.b
       |          JOIN ce e3 ON e3.a = e1.b AND e3.b = e2.b),
       |st AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM ce) AS n_edges,
       |              CAST(sum(deg * (deg - 1) // 2) AS BIGINT) AS n_wedges
       |       FROM deg)""".stripMargin

  val duckCensusSelect: String =
    s"""SELECT n_edges, n_triangles, n_wedges,
       |       CASE WHEN n_wedges <> 0
       |            THEN round(3.0 * CAST(n_triangles AS DOUBLE)
       |                       / CAST(n_wedges AS DOUBLE), 6)
       |            END AS clustering
       |FROM st, tri""".stripMargin

  def duckCensus(edgesRel: String, srcCol: String, dstCol: String): String =
    s"WITH ${duckCensusCtes(edgesRel, srcCol, dstCol)}\n$duckCensusSelect"

  /** PER-NODE triangle counts and LOCAL clustering coefficients —
    * which nodes sit in dense pockets vs bridge sparse ones:
    * c_v = 2·t_v / (deg_v·(deg_v−1)), NULL when deg < 2.
    *
    * Same degree-ordered wedge machinery as [[census]] (each wedge
    * generated once from its pivot, closure is one equi-join); the
    * only additions are carrying the pivot through the closure and
    * exploding each found triangle to its THREE member nodes before a
    * node-keyed count — volume 3·triangles, not wedge-scale.
    * Output: (node, degree, n_triangles, local_cc).
    */
  def localCoefficients(edges: DataFrame, srcCol: String,
                        dstCol: String): DataFrame = {
    val ce = edges.select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val deg = ce.select(col("a").as("node"))
      .union(ce.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    val withDeg = ce
      .join(deg.select(col("node").as("a"), col("degree").as("_da")), "a")
      .join(deg.select(col("node").as("b"), col("degree").as("_db")), "b")
    val oriented = withDeg.select(
      when(col("_da") < col("_db") ||
        (col("_da") === col("_db") && col("a") < col("b")),
        struct(col("a").as("u"), col("b").as("v"), col("_db").as("dv")))
        .otherwise(struct(col("b").as("u"), col("a").as("v"),
          col("_da").as("dv"))).as("_e"))
      .select(col("_e.u").as("u"), col("_e.v").as("v"), col("_e.dv").as("dv"))
    val wedges = oriented.as("x").join(oriented.as("y"),
        col("x.u") === col("y.u") &&
          (col("x.dv") < col("y.dv") ||
            (col("x.dv") === col("y.dv") && col("x.v") < col("y.v"))))
      .select(col("x.u").as("t_u"), col("x.v").as("v"), col("y.v").as("w"))
    val closing = oriented.select(col("u").as("v"), col("v").as("w"))
    val triNodes = wedges.join(closing, Seq("v", "w"))
      .select(explode(array(col("t_u"), col("v"), col("w"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
    deg.join(triNodes, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        when(col("degree") >= 2,
          round(lit(2.0) * coalesce(col("n_triangles"), lit(0L)).cast("double")
            / (col("degree") * (col("degree") - 1)).cast("double"), 6))
          .as("local_cc"))
  }

  /** DuckDB oracle twin of [[localCoefficients]] — canonical x<y<z
    * triples exploded to members, like [[duckCensus]]'s strategy-free
    * spelling.
    */
  def duckLocalCoefficientCtes(edgesRel: String, srcCol: String,
                               dstCol: String): String =
    s"""ce AS MATERIALIZED (
       |  SELECT DISTINCT least($srcCol, $dstCol) AS a,
       |         greatest($srcCol, $dstCol) AS b
       |  FROM $edgesRel WHERE $srcCol <> $dstCol),
       |deg AS (SELECT node, CAST(count(*) AS BIGINT) AS degree FROM
       |          (SELECT a AS node FROM ce UNION ALL SELECT b FROM ce)
       |        GROUP BY 1),
       |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
       |        FROM ce e1
       |          JOIN ce e2 ON e2.a = e1.a AND e2.b > e1.b
       |          JOIN ce e3 ON e3.a = e1.b AND e3.b = e2.b),
       |tn AS (SELECT node, CAST(count(*) AS BIGINT) AS n_triangles FROM
       |         (SELECT x AS node FROM tri UNION ALL
       |          SELECT y FROM tri UNION ALL SELECT z FROM tri)
       |       GROUP BY 1)""".stripMargin

  val duckLocalCoefficientSelect: String =
    s"""SELECT d.node, d.degree,
       |       coalesce(tn.n_triangles, 0) AS n_triangles,
       |       CASE WHEN d.degree >= 2
       |            THEN round(2.0 * CAST(coalesce(tn.n_triangles, 0) AS DOUBLE)
       |                       / CAST(d.degree * (d.degree - 1) AS DOUBLE), 6)
       |            END AS local_cc
       |FROM deg d LEFT JOIN tn ON tn.node = d.node""".stripMargin
}
