package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** PageRank semantics: exact integer ranks on a hand-computed star graph
  * (the quantized-integer update rule is deterministic enough to assert
  * bit-exact values), plus leaderboard invariants on the fixture.
  */
class GraphSpec extends SparkSpec {

  test("pageRank: hand-computed star graph — hub dominates, exact integer ranks") {
    import spark.implicits._
    // three orders, each {hub part 1, one leaf}: star 1—2, 1—3, 1—4,
    // all weights 1. By hand (scale 1e6, base 150000, damp 85):
    //   iter1: hub 2700000, leaf 433333
    //   iter2: hub 1254999, leaf 915000
    //   iter3: hub 2483250, leaf 505583
    val tmp = java.nio.file.Files.createTempDirectory("prstar").toString
    Seq((10L, 1L), (10L, 2L), (11L, 1L), (11L, 3L), (12L, 1L), (12L, 4L))
      .toDF("l_orderkey", "l_partkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val out = Graph.pageRank(spark, tmp).collect()
      .map(r => r.getAs[Long]("partkey") ->
        (r.getAs[Long]("pr_rank"), r.getAs[Long]("degree_w"))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L))
    assert(out(1L) == ((2483250L, 3L)), out.toString)
    Seq(2L, 3L, 4L).foreach(p => assert(out(p) == ((505583L, 1L)), out.toString))
  }

  test("pageRank: fixture leaderboard is sorted, positive, degree-consistent, reproducible") {
    val out = Graph.pageRank(spark, sf0001).collect()
    assert(out.length == Graph.PrTopK)
    val ranks = out.map(_.getAs[Long]("pr_rank"))
    assert(ranks.sameElements(ranks.sortBy(-_)), "leaderboard not rank-sorted")
    // every rank ≥ the damping base (a node always keeps (1-d)·scale) and
    // every node in the graph has positive weighted degree
    val base = (100L - Graph.PrDampPct) * Graph.PrScale / 100L
    out.foreach { r =>
      assert(r.getAs[Long]("pr_rank") >= base, r.toString)
      assert(r.getAs[Long]("degree_w") >= 1, r.toString)
    }
    val again = Graph.pageRank(spark, sf0001).collect()
    assert(out.toSeq == again.toSeq, "pageRank not deterministic")
  }

  test("triangles: planted K4 + disjoint edge — 4 triangles, 3 per K4 node, edge-only nodes absent") {
    import spark.implicits._
    // one order with parts {1,2,3,4} → K4 (C(4,3) = 4 triangles, every
    // node in 3); a second order {5,6} adds an edge in no triangle
    val tmp = java.nio.file.Files.createTempDirectory("tri").toString
    (Seq(10L -> 1L, 10L -> 2L, 10L -> 3L, 10L -> 4L) ++ Seq(11L -> 5L, 11L -> 6L))
      .toDF("l_orderkey", "l_partkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    try {
      val out = Graph.triangles(spark, tmp).collect()
        .map(r => r.getAs[Long]("partkey") ->
          (r.getAs[Long]("n_tri"), r.getAs[Long]("degree"))).toMap
      assert(out.keySet == Set(1L, 2L, 3L, 4L), out.toString)
      out.values.foreach(v => assert(v == ((3L, 3L)), out.toString))
    } finally {
      // triangles consumes the staged edge artifact; tmp-dir-named tables
      // would otherwise accumulate in the test warehouse across runs
      spark.sql(s"DROP TABLE IF EXISTS ${Graph.copurchaseTable(tmp)}")
    }
  }

  test("bfsHops: planted path — exact per-level census, disconnected component unreached") {
    import spark.implicits._
    // path 1—2—3—4—5 (one order per edge) + disconnected edge 8—9.
    // degrees: {2,3,4}→2, {1,5,8,9}→1; max-degree tie breaks to id 2.
    // BFS from 2: hop0 {2}, hop1 {1,3}, hop2 {4}, hop3 {5}, hop4 ∅.
    val tmp = java.nio.file.Files.createTempDirectory("bfs").toString
    Seq((10L, 1L), (10L, 2L), (11L, 2L), (11L, 3L), (12L, 3L), (12L, 4L),
        (13L, 4L), (13L, 5L), (14L, 8L), (14L, 9L))
      .toDF("l_orderkey", "l_partkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    try {
      val out = Graph.bfsHops(spark, tmp).collect()
        .map(r => r.getAs[Long]("hop") ->
          ((r.getAs[Long]("n_nodes"), r.getAs[Long]("sum_node"),
            r.getAs[Long]("min_node"), r.getAs[Long]("max_node")))).toMap
      assert(out == Map(
        0L -> ((1L, 2L, 2L, 2L)), 1L -> ((2L, 4L, 1L, 3L)),
        2L -> ((1L, 4L, 4L, 4L)), 3L -> ((1L, 5L, 5L, 5L))), out.toString)
    } finally {
      // bfsHops consumes the staged edge artifact; tmp-dir-named tables
      // would otherwise accumulate in the test warehouse across runs
      spark.sql(s"DROP TABLE IF EXISTS ${Graph.copurchaseTable(tmp)}")
    }
  }

  test("bfsHops: fixture levels — single source, bounded hops, conserved stats, reproducible") {
    val out = Graph.bfsHops(spark, sf0001).collect()
    assert(out.nonEmpty)
    val byHop = out.map(r => r.getAs[Long]("hop") -> r).toMap
    assert(byHop(0L).getAs[Long]("n_nodes") == 1L, "source level must be one node")
    out.foreach { r =>
      val (n, s) = (r.getAs[Long]("n_nodes"), r.getAs[Long]("sum_node"))
      val (lo, hi) = (r.getAs[Long]("min_node"), r.getAs[Long]("max_node"))
      assert(r.getAs[Long]("hop") >= 0 && r.getAs[Long]("hop") <= Graph.BfsHops)
      assert(n >= 1 && lo <= hi && s >= n * lo && s <= n * hi, r.toString)
    }
    val again = Graph.bfsHops(spark, sf0001).collect()
    assert(out.toSeq == again.toSeq, "bfsHops not deterministic")
  }

  test("triangles: fixture leaderboard sorted, bounded by degree-choose-2, reproducible") {
    val out = Graph.triangles(spark, sf0001).collect()
    assert(out.nonEmpty && out.length <= Graph.TriTopK)
    val tris = out.map(_.getAs[Long]("n_tri"))
    assert(tris.sameElements(tris.sortBy(-_)), "leaderboard not sorted")
    out.foreach { r =>
      val (t, d) = (r.getAs[Long]("n_tri"), r.getAs[Long]("degree"))
      assert(t >= 1 && t <= d * (d - 1) / 2, r.toString) // each triangle uses 2 incident edges
    }
    val again = Graph.triangles(spark, sf0001).collect()
    assert(out.toSeq == again.toSeq, "triangles not deterministic")
  }
}
