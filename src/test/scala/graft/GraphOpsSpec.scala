package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.GraphOps

/** PageRank invariants on the customer–supplier graph. */
class GraphOpsSpec extends AnyFunSuite {
  import SparkSuite._

  test("rank mass is conserved (sums to ~1 with no dangling nodes)") {
    val all = GraphOps.pagerank(spark, Sf, topK = Int.MaxValue)
    val total = all.agg(sum(col("pagerank"))).head().getDouble(0)
    assert(math.abs(total - 1.0) < 0.01, s"rank mass $total drifted from 1")
  }

  test("suppliers dominate the top ranks (high-degree side of the bipartite graph)") {
    val top = GraphOps.pagerank(spark, Sf, topK = 10).collect()
    // every customer trades with few suppliers; every supplier serves
    // many customers — the walk concentrates on suppliers
    assert(top.count(_.getString(0).startsWith("s")) >= 8,
      "expected the top-10 to be mostly supplier nodes")
  }

  test("more iterations change ranks (the loop actually iterates)") {
    val r1 = GraphOps.pagerank(spark, Sf, iters = 1, topK = 5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val r3 = GraphOps.pagerank(spark, Sf, iters = 3, topK = 5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(r1 != r3, "iterating had no effect on the rank vector")
  }

  test("bfsHops: source at 0, and hop parity alternates graph sides") {
    val rows = GraphOps.bfsHops(spark, Sf).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(rows("c1") == 0, "the source node must be at hop 0")
    // bipartite: from a customer source, suppliers sit at odd hops,
    // customers at even hops — any violation means the frontier leaked
    rows.foreach { case (n, h) =>
      if (n.startsWith("s")) assert(h % 2 == 1, s"supplier $n at even hop $h")
      else assert(h % 2 == 0, s"customer $n at odd hop $h")
    }
    assert(rows.values.max <= 4, "hops exceeded the maxHops bound")
    assert(rows.size > 1, "BFS never left the source")
  }

  test("bfsHops distances are minimal (hop-k nodes have a hop-(k-1) neighbor)") {
    val dist = GraphOps.bfsHops(spark, Sf).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    val ed = GraphOps.edges(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def name(n: Long) = (if (n % 2 == 0) "c" else "s") + (n >> 1)
    val adj = ed.groupBy(e => name(e._1)).map { case (k, v) => k -> v.map(e => name(e._2)).toSet }
    dist.filter(_._2 > 0).foreach { case (n, h) =>
      val best = adj(n).flatMap(dist.get).min
      assert(best == h - 1, s"$n at hop $h has best-neighbor hop $best — not minimal")
    }
  }

  test("commonNeighbors returns non-edges with valid jaccard") {
    val pairs = GraphOps.frequentPairs(spark, Sf, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rows = GraphOps.commonNeighbors(spark, Sf).collect()
    assert(rows.nonEmpty, "no predicted links")
    rows.foreach { r =>
      val (a, c) = (r.getLong(0), r.getLong(1))
      assert(a < c, "pairs must be id-oriented")
      assert(!pairs.contains((a, c)), s"($a,$c) is already a direct edge")
      val j = r.getDouble(5)
      assert(j > 0 && j <= 1, s"jaccard $j out of range")
    }
    val counts = rows.map(_.getLong(2))
    assert(counts.sameElements(counts.sortBy(-_)), "not sorted by common_cnt desc")
  }

  test("hits: roles split the bipartite sides; scores normalized; loop iterates") {
    val rows = GraphOps.hits(spark, Sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    val (hubs, auths) = rows.partition(_._1 == "hub")
    // top-20 per role, capped by the role's population (sf0.001 has
    // only 10 suppliers)
    assert(hubs.length == 20 && (auths.length == 20 || auths.nonEmpty),
      "expected topK (or the whole role) per role")
    // directed customer->supplier: hubs must all be customers,
    // authorities all suppliers
    hubs.foreach { case (_, n, _) => assert(n.startsWith("c"), s"hub $n not a customer") }
    auths.foreach { case (_, n, _) => assert(n.startsWith("s"), s"authority $n not a supplier") }
    rows.foreach { case (_, n, sc) => assert(sc > 0 && sc <= 1.0, s"$n score $sc out of range") }
    assert(hubs.map(_._3).max == 1.0 && auths.map(_._3).max == 1.0,
      "each role's top score must normalize to 1")
    val r1 = GraphOps.hits(spark, Sf, iters = 1).collect().map(r => (r.getString(1), r.getDouble(2)))
    assert(!r1.sameElements(rows.map(r => (r._2, r._3))), "iterating had no effect")
  }

  test("kcore: peeling shrinks monotonically to a valid k-core fixpoint") {
    val curve = GraphOps.kcore(spark, Sf, k = 3, rounds = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(curve.map(_._1).toSeq == (0L to 6L), "one row per round, in order")
    curve.sliding(2).foreach { case Array((_, n0, e0), (r, n1, e1)) =>
      assert(n1 <= n0 && e1 <= e0, s"round $r grew the graph ($n0,$e0)->($n1,$e1)")
    }
    // the curve must reach its fixpoint within the round budget, and
    // at the fixpoint every surviving node really has degree >= k
    val Array((_, nLast, eLast), (_, nPrev, ePrev)) = curve.takeRight(2).reverse
    assert((nLast, eLast) == (nPrev, ePrev), "peeling did not converge in 6 rounds")
    if (eLast > 0) {
      // recompute the surviving edge set independently: peel by hand
      var ed = GraphOps.frequentPairs(spark, Sf, 2).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      var changed = true
      while (changed) {
        val deg = (ed.map(_._1) ++ ed.map(_._2)).groupBy(identity).map { case (k2, v) => k2 -> v.length }
        val keep = deg.filter(_._2 >= 3).keySet
        val next = ed.filter(e => keep(e._1) && keep(e._2))
        changed = next.length != ed.length
        ed = next
      }
      val nodes = (ed.map(_._1) ++ ed.map(_._2)).distinct.length
      assert((nodes.toLong, ed.length.toLong) == (nLast, eLast),
        "distributed peel disagrees with the by-hand fixpoint")
    }
  }

  test("labelProp: community sizes cover the pruned-graph node set") {
    val nNodes = GraphOps.frequentPairs(spark, Sf, 2)
      .select(org.apache.spark.sql.functions.explode(
        array(col("pa"), col("pb"))).as("n")).distinct().count()
    val comm = GraphOps.labelProp(spark, Sf).collect()
    assert(comm.map(_.getLong(1)).sum == nNodes,
      "community sizes must partition the node set")
    // every community label is itself a node that voted for it
    assert(comm.length > 1, "label propagation collapsed to one community")
  }
}
