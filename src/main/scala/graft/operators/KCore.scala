package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition (fixed-round peeling) — the graph-density
  * member of the graph family next to [[Triangles]] and [[LabelProp]]:
  * the k-core is the maximal subgraph where every node keeps degree
  * ≥ k, the standard "dense cohesive region" extraction (spam rings,
  * power-user cliques, co-purchase cores) that percolates OUT low-
  * engagement periphery a plain degree filter would keep (dropping a
  * node can drag its neighbors below k — peeling is inherently
  * iterative).
  *
  * Fixed `iters` peel rounds (the [[LabelProp.communities]] posture:
  * data-independent round count so the oracle can unroll the exact
  * same computation): each round computes surviving degrees and
  * semi-join-filters both edge endpoints against the ≥ k survivors.
  * Peeling is monotone — once stable, further rounds are no-ops — so
  * `iters` only needs to cover the peel DEPTH (longest chain of
  * cascading removals), not the node count.
  *
  * Input edges must be SYMMETRIC (both directions present, the
  * [[PageRank.ranks]] convention); self-loops and duplicate edges are
  * dropped. Scale shape per round: one map-side-combinable degree
  * aggregate + two semi joins against the (node-sized, typically
  * broadcastable) survivor set; lineage is checkpoint-cut per round
  * like every iterative operator here.
  *
  * Output: (node, degree) for k-core members, degree = within-core
  * degree after `iters` rounds.
  */
object KCore {

  def coreMembers(edges: DataFrame, srcCol: String, dstCol: String,
                  k: Int, iters: Int): DataFrame =
    coreMembersWith(edges, srcCol, dstCol, k, iters, Dedup.LocalCcMaxEdges)

  /** [[coreMembers]] with an explicit local-tier ceiling — the
    * [[Dedup.connectedComponentsWith]] test-seam convention.
    */
  private[graft] def coreMembersWith(edges: DataFrame, srcCol: String,
                                     dstCol: String, k: Int, iters: Int,
                                     localMaxEdges: Long): DataFrame = {
    require(k >= 1, s"kCore: bad k=$k")
    require(iters >= 1, s"kCore: bad iters=$iters")
    var e = edges
      .select(col(srcCol).as("_s"), col(dstCol).as("_d"))
      .filter(col("_s") =!= col("_d"))
      .distinct()
      .localCheckpoint()
    // Early exit on a STABLE round (r16 optimization): each round's edge
    // set is a subset of the previous one, so an unchanged count means an
    // unchanged set — degrees, the survivor set, and every later round
    // are then bit-identical no-ops and can be skipped. Peel depth, not
    // `iters`, becomes the executed round count (the oracle still unrolls
    // all `iters` rounds; no-op rounds compute the identical relation, so
    // results are unchanged by construction). The count is a cheap job
    // over the just-materialized checkpoint blocks.
    var nEdges = e.count()
    // DRIVER-LOCAL TIER (r17, the Dedup.connectedComponents pattern):
    // below the edge ceiling every peel round costs ~2 fixed Spark jobs
    // over a metadata-scale edge set — the rounds, not the data, are
    // the wall. The local peel is the IDENTICAL synchronous computation
    // (all deg<k nodes removed simultaneously per round, early exit on
    // a stable round), so the surviving (node, degree) set is
    // bit-identical to the distributed loop's by construction. Long ids
    // and non-null endpoints only; anything else keeps the distributed
    // path, which remains the shape that scales.
    if (nEdges <= localMaxEdges &&
        e.schema.fields.forall(_.dataType ==
          org.apache.spark.sql.types.LongType)) {
      val rows = e.collect()
      if (rows.forall(r => !r.isNullAt(0) && !r.isNullAt(1))) {
        var el = rows.map(r => (r.getLong(0), r.getLong(1)))
        var stable = false
        for (_ <- 1 to iters if !stable) {
          val deg = new java.util.HashMap[Long, Long]()
          el.foreach(t => deg.merge(t._1, 1L, _ + _))
          val next = el.filter(t =>
            deg.getOrDefault(t._1, 0L) >= k && deg.getOrDefault(t._2, 0L) >= k)
          stable = next.length == el.length
          el = next
        }
        val outDeg = new java.util.HashMap[Long, Long]()
        el.foreach(t => outDeg.merge(t._1, 1L, _ + _))
        import scala.jdk.CollectionConverters._
        val out = outDeg.asScala.toSeq.filter(_._2 >= k)
          .map { case (n, d) => org.apache.spark.sql.Row(n, d) }
        return e.sparkSession.createDataFrame(out.asJava,
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("node",
              org.apache.spark.sql.types.LongType, nullable = true),
            org.apache.spark.sql.types.StructField("degree",
              org.apache.spark.sql.types.LongType, nullable = false))))
      }
    }
    var stable = false
    for (_ <- 1 to iters if !stable) {
      val keep = e.groupBy(col("_s")).agg(count(lit(1)).as("_deg"))
        .filter(col("_deg") >= k)
        .select(col("_s").as("_keep"))
      e = e
        .join(keep.select(col("_keep").as("_s")), Seq("_s"), "left_semi")
        .join(keep.select(col("_keep").as("_d")), Seq("_d"), "left_semi")
        .localCheckpoint()
      val n = e.count()
      stable = n == nEdges
      nEdges = n
    }
    e.groupBy(col("_s").as("node")).agg(count(lit(1)).as("degree"))
      .filter(col("degree") >= k)
  }

  /** DuckDB CTE chain for [[coreMembers]] (the [[PageRank.duckRankCtes]]
    * convention: caller embeds it in a WITH and appends
    * [[duckCoreSelect]]): the identical peel unrolled as `iters` CTE
    * rounds over `edgesRel` (columns `src`, `dst`, symmetric).
    */
  def duckCoreCtes(edgesRel: String, k: Int, iters: Int): String = {
    // AS MATERIALIZED: every round references the previous one three
    // times (degree count + both endpoint joins) — inlined, the
    // expansion is 3^iters re-reads of the base scan and DuckDB runs
    // out of file handles before it runs out of patience.
    val e0 =
      s"""ke0 AS MATERIALIZED (
         |  SELECT DISTINCT src, dst FROM $edgesRel WHERE src <> dst)""".stripMargin
    val rounds = (1 to iters).map { i =>
      s"""kk$i AS MATERIALIZED (
         |  SELECT src FROM ke${i - 1} GROUP BY src HAVING count(*) >= $k),
         |ke$i AS MATERIALIZED (
         |  SELECT e.src, e.dst FROM ke${i - 1} e
         |  JOIN kk$i a ON e.src = a.src
         |  JOIN kk$i b ON e.dst = b.src)""".stripMargin
    }
    (e0 +: rounds).mkString(",\n")
  }

  /** Final SELECT over [[duckCoreCtes]]'s last round. */
  def duckCoreSelect(k: Int, iters: Int): String =
    s"""SELECT src AS node, CAST(count(*) AS BIGINT) AS degree
       |FROM ke$iters GROUP BY 1 HAVING count(*) >= $k""".stripMargin
}
