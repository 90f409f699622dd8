package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Triangles

class TrianglesSpec extends AnyFunSuite with SparkTestBase {

  private def census(edges: Seq[(Long, Long)]): (Long, Long, Long, Option[Double]) = {
    import spark.implicits._
    val Array(r) = Triangles.census(edges.toDF("s", "t"), "s", "t")
      .as[(Long, Long, Long, Option[Double])].collect()
    r
  }

  test("triangle with a pendant: 1 triangle, 5 wedges, clustering 0.6") {
    // K3 on {1,2,3} plus edge 3-4: wedges = C(2,2)? degrees 2,2,3,1 →
    // 1+1+3+0 = 5; clustering = 3*1/5.
    val r = census(Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)))
    assert(r == ((4L, 1L, 5L, Some(0.6))))
  }

  test("duplicates, self-loops, and reversed orientations canonicalize away") {
    val r = census(Seq((1L, 2L), (2L, 1L), (1L, 1L), (2L, 3L), (3L, 2L),
      (3L, 1L), (1L, 3L)))
    assert(r == ((3L, 1L, 3L, Some(1.0))))
  }

  test("K4 has 4 triangles and clustering 1.0") {
    val nodes = Seq(1L, 2L, 3L, 4L)
    val edges = for (a <- nodes; b <- nodes if a < b) yield (a, b)
    val r = census(edges)
    assert(r == ((6L, 4L, 12L, Some(1.0))))
  }

  test("degreeHistogram bins by integer bit length, not floating log2") {
    import spark.implicits._
    // degrees: node1:3 (→bucket 1), node2:1, node3:2 (→1), node4:4 (→2),
    // edges chosen so deg(4)=4 exactly at the 2^2 boundary.
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (3L, 4L), (4L, 5L),
      (4L, 6L))
    val out = graft.operators.Triangles
      .degreeHistogram(edges.toDF("s", "t"), "s", "t")
      .as[(Int, Long, Long)].collect().toSet
    // deg: 1→3,2→1,3→2,4→4,5→1,6→1 ⇒ bucket0:{2,5,6}, bucket1:{1,3}, bucket2:{4}
    assert(out == Set((0, 1L, 3L), (1, 2L, 2L), (2, 4L, 1L)))
  }

  test("triangle-free star: 0 triangles, null clustering only when no wedges") {
    val star = census(Seq((1L, 2L), (1L, 3L), (1L, 4L)))
    assert(star == ((3L, 0L, 3L, Some(0.0))))
    val single = census(Seq((1L, 2L)))
    assert(single == ((1L, 0L, 0L, None)))
  }

  test("localCoefficients: K4-minus-an-edge plus a pendant, hand-counted per node") {
    import spark.implicits._
    // Edges: 1-2,1-3,1-4,2-3,2-4 (K4 minus 3-4) + pendant 1-5.
    // Triangles (1,2,3),(1,2,4): t = (1:2, 2:2, 3:1, 4:1, 5:0);
    // degrees (1:4, 2:3, 3:2, 4:2, 5:1).
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (1L, 5L)).toDF("src", "dst")
    val out = Triangles.localCoefficients(edges, "src", "dst")
      .as[(Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((4L, 2L, Some(0.333333))))  // 2·2/(4·3)
    assert(out(2L) == ((3L, 2L, Some(0.666667))))  // 2·2/(3·2)
    assert(out(3L) == ((2L, 1L, Some(1.0))))
    assert(out(4L) == ((2L, 1L, Some(1.0))))
    assert(out(5L) == ((1L, 0L, None)))            // deg < 2 → undefined
  }

  test("adamicAdar: hand-scored square+pendant; edges excluded; hub cap drops pivots") {
    import spark.implicits._
    // Square 1-2-4-3-1 plus pendant 5 on node 1.
    // Degrees: 1→3 (2,3,5), 2→2, 3→2, 4→2, 5→1.
    // Non-edge scores: (1,4): via {2,3} = 2/ln2 = 2.88539;
    //                  (2,3): via {1,4} = 1/ln3 + 1/ln2 = 2.352934;
    //                  (2,5) and (3,5): via {1} = 1/ln3 = 0.910239.
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (1L, 5L))
      .toDF("src", "dst")
    val out = graft.operators.LinkPred
      .adamicAdar(edges, "src", "dst", topK = 10)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq(
      (1L, 4L, 2L, 2.88539),
      (2L, 3L, 2L, 2.352934),
      (2L, 5L, 1L, 0.910239),
      (3L, 5L, 1L, 0.910239)))
    // No existing edge ever appears as a prediction.
    val edgeSet = Set((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (1L, 5L))
    assert(out.forall(r => !edgeSet.contains((r._1, r._2))))

    // Hub cap: maxPivotDeg=2 drops node 1 as a pivot — (1,4) keeps its
    // pivots 2 and 3, (2,3) falls to the 1/ln2 of pivot 4 alone, and
    // the pendant pairs (which exist only through the hub) vanish.
    val capped = graft.operators.LinkPred
      .adamicAdar(edges, "src", "dst", topK = 10, maxPivotDeg = 2)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(capped == Seq(
      (1L, 4L, 2L, 2.88539),
      (2L, 3L, 1L, 1.442695)))

    // topK truncates deterministically on the (score, a, b) order.
    assert(graft.operators.LinkPred
      .adamicAdar(edges, "src", "dst", topK = 1)
      .as[(Long, Long, Long, Double)].collect().toSeq ==
      Seq((1L, 4L, 2L, 2.88539)))
  }

  test("twoHopReach: hand-counted square+pendant; pivot cap trims hub-mediated reach") {
    import spark.implicits._
    // Square 1-2-4-3-1 + pendant 5 on node 1 (same graph as adamicAdar).
    // reach≤2: 1→{2,3,5,4}=4; 2→{1,4,3,5}=4; 3→{1,4,2,5}=4;
    //          4→{2,3,1}=3;   5→{1,2,3}=3.
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (1L, 5L))
      .toDF("src", "dst")
    val out = graft.operators.LinkPred.twoHopReach(edges, "src", "dst")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out == Map(
      1L -> ((3L, 4L)), 2L -> ((2L, 4L)), 3L -> ((2L, 4L)),
      4L -> ((2L, 3L)), 5L -> ((1L, 3L))))

    // cap=2 drops node 1 (deg 3) as a PIVOT: 5 loses its only 2-hop
    // path (reach falls to its direct edge), 2 loses the via-1 routes.
    val capped = graft.operators.LinkPred
      .twoHopReach(edges, "src", "dst", maxPivotDeg = 2)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(capped(5L) == 1L && capped(2L) == 3L && capped(4L) == 3L)
  }

  test("twoHopReachHll: star graph gives every node the same ball; estimate tracks exact") {
    import spark.implicits._
    // Star 1-{2,3,4}: every node's radius-2 ball is {1,2,3,4} — the hub
    // directly, each leaf via the hub — so all four registers sets are
    // identical and so are the estimates.
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("src", "dst")
    val est = graft.operators.LinkPred.twoHopReachHll(star, "src", "dst")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(est.size == 4)
    assert(est.values.toSet.size == 1)
    // 64-register linear counting at n=4 is near-exact
    assert(math.abs(est(1L) - 4.0) < 0.5)

    // square+pendant: estimates track the exact ball (exact + self)
    // within small-range HLL error
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (1L, 5L))
      .toDF("src", "dst")
    val exact = graft.operators.LinkPred.twoHopReach(edges, "src", "dst")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    val hll = graft.operators.LinkPred.twoHopReachHll(edges, "src", "dst")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    for ((n, ex) <- exact)
      assert(math.abs(hll(n) - (ex + 1.0)) < 1.0,
        s"node $n: hll ${hll(n)} vs ball ${ex + 1}")
  }

  test("pivotCapAudit: dropped wedge share is exactly the hub's C(deg,2) mass") {
    import spark.implicits._
    // same square+pendant: degrees 3,2,2,2,1 → wedges 3+1+1+1+0 = 6.
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (1L, 5L))
      .toDF("src", "dst")
    val r = graft.operators.LinkPred
      .pivotCapAudit(edges, "src", "dst", maxPivotDeg = 2)
      .as[(Long, Long, Long, Long, Double)].head()
    // node 1 (deg 3, 3 wedges) is the only capped pivot → kept 3/6.
    assert(r == ((5L, 1L, 6L, 3L, 0.5)))
    // a high cap drops nothing
    val rAll = graft.operators.LinkPred
      .pivotCapAudit(edges, "src", "dst", maxPivotDeg = 100)
      .as[(Long, Long, Long, Long, Double)].head()
    assert(rAll == ((5L, 0L, 6L, 0L, 1.0)))
  }
}
