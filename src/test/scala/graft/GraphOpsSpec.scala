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
}
