package graft

import org.apache.spark.sql.functions._

import graft.operators.GraphOps

/** PageRank semantics on planted graphs — structure the synthetic trade
  * graph cannot pin down (exact symmetry, hub dominance, mass
  * conservation). */
class GraphOpsSpec extends SparkSpecBase {

  private def sym(pairs: (String, String)*) = {
    import spark.implicits._
    val df = pairs.toDF("src", "dst")
    df.unionByName(df.select(col("dst").as("src"), col("src").as("dst")))
  }

  test("pageRank: hub out-ranks leaves, symmetric leaves tie, mass ≈ 1") {
    // star: hub — 4 leaves, plus an isolated 2-clique
    val edges = sym(("hub", "l1"), ("hub", "l2"), ("hub", "l3"), ("hub", "l4"),
      ("a", "b"))
    val out = GraphOps.pageRank(edges, k = 10).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out.size == 7)
    val leaves = Seq("l1", "l2", "l3", "l4").map(out)
    assert(leaves.distinct.size == 1, s"symmetric leaves must tie: $leaves")
    assert(out("hub") > leaves.head * 2,
      s"hub ${out("hub")} must dominate a leaf ${leaves.head}")
    assert(out("a") == out("b"))
    // total rank stays a probability mass (teleport conserves it)
    assert(math.abs(out.values.sum - 1.0) < 1e-3, s"mass ${out.values.sum}")
  }

  test("pageRank: top-k truncates by rank with node tie-break") {
    val edges = sym(("h", "x1"), ("h", "x2"), ("h", "x3"))
    val out = GraphOps.pageRank(edges, k = 2).collect()
    assert(out.length == 2)
    assert(out.head.getString(0) == "h")
    assert(out(1).getString(0) == "x1") // equal-rank leaves: lexicographic
  }

  test("pre-degreed fast path returns exactly the generic pageRank output") {
    val generic = GraphOps.pageRank(GraphOps.tradeEdges(spark, Sf)).collect()
    val fast = GraphOps.pageRankPreDegreed(
      GraphOps.tradeEdgesWithDeg(spark, Sf)).collect()
    assert(generic.map(_.toSeq).toSeq == fast.map(_.toSeq).toSeq,
      "the two construction paths must be row-identical")
  }

  test("triangles: shared-node counts are exact; bipartite graphs are triangle-free") {
    import spark.implicits._
    // two triangles sharing node 3, plus a pendant edge 5–6; edges given
    // in mixed directions and with a duplicate to exercise canonicalize
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L),     // triangle {1,2,3}
      (3L, 4L), (5L, 4L), (3L, 5L),     // triangle {3,4,5}, one reversed
      (2L, 1L),                          // duplicate of (1,2) reversed
      (5L, 6L)                           // pendant, in no triangle
    ).toDF("src", "dst")
    val out = GraphOps.triangles(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(3L -> 2L, 1L -> 1L, 2L -> 1L, 4L -> 1L, 5L -> 1L),
      s"wrong counts: $out")
    // the trade graph is bipartite (customer↔supplier): no odd cycles
    assert(GraphOps.triangles(GraphOps.tradeEdges(spark, Sf)).count() == 0)
  }

  test("trade edges are symmetric and distinct") {
    val e = GraphOps.tradeEdges(spark, Sf)
    val n = e.count()
    val nDistinct = e.distinct().count()
    assert(n == nDistinct, "edge list must be pair-distinct")
    val asym = e.select(col("src"), col("dst"))
      .exceptAll(e.select(col("dst").as("src"), col("src").as("dst")))
      .count()
    assert(asym == 0, "every edge must have its reverse")
  }

  test("link prediction: path endpoints predicted with the hand-computed AA score, edges never") {
    import spark.implicits._
    // path 1—2—3—4 plus hub 5 connected to 1,2,3,4
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (5L, 1L), (5L, 2L), (5L, 3L), (5L, 4L)).toDF("src", "dst")
    val out = GraphOps.linkPredict(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    // (1,3): common neighbors 2 (deg 3) and 5 (deg 4) →
    //        1/ln3 + 1/ln4 ≈ 0.910239 + 0.721348
    val (n13, s13) = out((1L, 3L))
    assert(n13 == 2L && math.abs(s13 - (math.rint(1 / math.log(3) * 1e8) / 1e8
      + math.rint(1 / math.log(4) * 1e8) / 1e8)) < 1e-6, s"got $s13")
    // (1,4): only the hub 5 in common → 1/ln4
    assert(out((1L, 4L))._1 == 1L)
    assert(out((1L, 4L))._2 < s13, "hub-only pair scores below close pair")
    // no existing edge appears as a prediction
    for (e <- Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 5L)))
      assert(!out.contains(e), s"edge $e must not be predicted")
  }

  test("k-core peel matches the brute-force peel round for round") {
    val knn = graft.operators.AnnOps.knnGraph(spark, Sf)
      .select(col("src"), col("dst")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    var edges = knn.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct.toSet
    val rows = GraphOps.kcoreQuery(spark, Sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq == Seq(1, 2, 3))
    var prevNodes = Long.MaxValue
    for ((round, nNodes, nEdges) <- rows) {
      val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).view.mapValues(_.size).toMap
      val kept = deg.filter(_._2 >= 3).keySet
      edges = edges.filter(e => kept(e._1) && kept(e._2))
      assert(nNodes == kept.size, s"round $round nodes")
      assert(nEdges == edges.size, s"round $round edges")
      assert(nNodes <= prevNodes, "peel must be monotone")
      prevNodes = nNodes
    }
  }
}
