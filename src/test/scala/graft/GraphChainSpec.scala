package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import graft.operators.{DedupChain, GraphOps}

/** r10: the graph family's shared stages (the deduped trade edge table
  * and the support-pruned co-purchase pair table) route through the
  * session chain cache. The cache must be semantically invisible —
  * every consumer returns row-identical results with it on and off —
  * and each shared stage must materialize exactly once per session no
  * matter how many of the six graph queries run.
  */
class GraphChainSpec extends AnyFunSuite {
  import SparkSuite._

  private def rows(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted
    df.select(cols.head, cols.tail: _*).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
  }

  private def family(): Map[String, DataFrame] = Map(
    "pagerank" -> GraphOps.pagerank(spark, Sf),
    "bfs" -> GraphOps.bfsHops(spark, Sf),
    "triangles" -> GraphOps.triangles(spark, Sf),
    "degree" -> GraphOps.degreeDist(spark, Sf),
    "common" -> GraphOps.commonNeighbors(spark, Sf),
    "labelprop" -> GraphOps.labelProp(spark, Sf))

  test("graph queries are row-identical with the chain cache on and off") {
    assert(!DedupChain.enabled)
    val off = family().map { case (k, df) => k -> rows(df) }
    try {
      DedupChain.enable()
      DedupChain.reset()
      val on = family().map { case (k, df) => k -> rows(df) }
      off.keys.foreach { k => assert(on(k) === off(k), s"consumer $k diverged under cache") }
    } finally { DedupChain.disable(); DedupChain.reset() }
  }

  test("q_basket_lift under the cache == off-cache (shared support-2 pair table)") {
    assert(!DedupChain.enabled)
    val off = rows(graft.operators.Relational.basketLift(spark, Sf))
    try {
      DedupChain.enable()
      DedupChain.reset()
      assert(rows(graft.operators.Relational.basketLift(spark, Sf)) === off)
      // ...and it rode the shared basket + graph pair tables, not a
      // private build (r11: the basket stage is session-shared too)
      assert(DedupChain.builtCount === 2)
    } finally { DedupChain.disable(); DedupChain.reset() }
  }

  test("edge and frequent-pair tables each materialize once per session") {
    try {
      DedupChain.enable()
      DedupChain.reset()
      family().values.foreach(_.count())
      // one trade_edges + one baskets + one frequent_pairs_2,
      // regardless of the six consumers (r11: the basket stage under
      // the pair fan-out is itself a shared cached table)
      assert(DedupChain.builtCount === 3)
      family().values.foreach(_.count())
      assert(DedupChain.builtCount === 3)
    } finally { DedupChain.disable(); DedupChain.reset() }
  }
}
