package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{KCore, PageRank, Triangles}

/** Scale-rehearsal probe for the graph family (BASELINE.md round 11):
  * triangle census and fixed-point PageRank on a synthetic edge list
  * with a CONTROLLED HUB — `hubPct` percent of all edges attach to node
  * 0, the skew shape that breaks naive triangle counting (the hub's
  * neighbor self-join alone is (hubPct·m)² wedges). Measures:
  *
  *   - `census`: degree-ordered orientation — wedge volume should stay
  *     ~linear in m as m grows 10×, hub notwithstanding (the hub is
  *     everyone's HIGHER-degree endpoint, so it pivots almost nothing);
  *   - `pagerank5`: 5 synchronous integer iterations — per-iteration
  *     cost is one src join + one dst aggregate, linear in m.
  *
  * Prints one JSON line per measurement.
  * Usage: `runMain graft.RehearseGraph <edges> <nodes> [hubPct]`
  */
object RehearseGraph {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: RehearseGraph <edges> <nodes> [hubPct]")
    val (m, nodes) = (args(0).toLong, args(1).toLong)
    val hubPct = if (args.length > 2) args(2).toLong else 10L
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    // Hash-derived endpoints; every 100/hubPct-th edge pins src to the
    // hub. Self-loops land occasionally and are canonicalized away by
    // the operators themselves.
    val edges = spark.range(m).select(
        when(pmod(col("id"), lit(100L)) < hubPct, lit(0L))
          .otherwise(pmod(xxhash64(col("id")), lit(nodes))).as("src"),
        pmod(xxhash64(col("id"), lit(7)), lit(nodes)).as("dst"))
      .localCheckpoint()
    val (census, tCensus) = time {
      Triangles.census(edges, "src", "dst").collect()(0)
    }
    println(s"""{"probe":"census","edges":$m,"nodes":$nodes,"hub_pct":$hubPct,""" +
      s""""n_edges":${census.getLong(0)},"n_triangles":${census.getLong(1)},""" +
      s""""n_wedges":${census.getLong(2)},"sec":${f"$tCensus%.2f"}}""")
    val (nRanks, tPr) = time {
      PageRank.ranks(edges, "src", "dst", iters = 5).count()
    }
    println(s"""{"probe":"pagerank5","edges":$m,"nodes":$nodes,""" +
      s""""rank_rows":$nRanks,"sec":${f"$tPr%.2f"}}""")
    // Symmetrize for the round-11 additions (both expect undirected
    // input): k-core peel depth is bounded, PPR is per-iteration linear
    // like pagerank — both should track m, hub notwithstanding.
    val sym = edges.union(edges.select(col("dst"), col("src"))).localCheckpoint()
    val (nCore, tKc) = time {
      KCore.coreMembers(sym, "src", "dst", k = 8, iters = 6).count()
    }
    println(s"""{"probe":"kcore8x6","edges":$m,"nodes":$nodes,""" +
      s""""core_nodes":$nCore,"sec":${f"$tKc%.2f"}}""")
    val seeds = sym.select(col("src").as("node")).distinct()
      .orderBy(col("node")).limit(4)
    val (nPpr, tPpr) = time {
      PageRank.personalized(sym, "src", "dst", seeds, "node", iters = 4).count()
    }
    println(s"""{"probe":"ppr4","edges":$m,"nodes":$nodes,""" +
      s""""rank_rows":$nPpr,"sec":${f"$tPpr%.2f"}}""")
    spark.stop()
  }
}
