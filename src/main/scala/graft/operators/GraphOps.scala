package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorFunctions.{cents, r6}

/** Iterative graph analytics over relational data (SURVEY.md §2-E):
  * PageRank on the bipartite customer–supplier graph induced by
  * orders ⋈ lineitem (who trades with whom). Complements the
  * connected-components operator in [[Dedup.components]].
  *
  * Scale shape: the classic Pregel-as-joins loop — each iteration is
  * one broadcast equi-join of the edge table with the rank table plus
  * one partial-agg shuffle on dst. Edges are materialized once; rank
  * tables are O(nodes). Per-edge contributions are integerized
  * (floor(d·r/outdeg·+0.5) as long) so the distributed sums are
  * order-independent and every iteration is bitwise reproducible —
  * the oracle unrolls the same two iterations.
  *
  * Node ids are NUMERIC through the whole loop (custkey·2 /
  * suppkey·2+1 — the two key spaces never collide) and only rendered
  * as the reference "c<k>"/"s<k>" strings for the final top-k: long
  * join/agg keys keep the per-iteration shuffles at 16 bytes/row and
  * hash instead of string-compare (r8 — measured 14.6 → ~7 s at sf1).
  */
object GraphOps {

  /** Directed edge list, both directions (random walk on the
    * undirected bipartite graph), as numeric node ids.
    */
  def edges(spark: SparkSession, dir: String): DataFrame = {
    // distinct on the encoded (long, long) pair — the dedup shuffle
    // moves 16-byte rows, and every later join/agg hashes longs
    val e0 = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).cast("long").as("src"),
        (col("l_suppkey") * 2 + 1).cast("long").as("dst"))
      .distinct()
    e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
  }

  /** Render a numeric node id back to the reference naming. */
  private def nodeName(n: org.apache.spark.sql.Column) =
    when(n % 2 === 0, concat(lit("c"), shiftright(n, 1)))
      .otherwise(concat(lit("s"), shiftright(n, 1)))

  /** PageRank with damping 0.85, `iters` synchronous iterations from a
    * uniform start, reported as the top-`topK` nodes. No dangling-node
    * term is needed: every node here has outdegree ≥ 1 by construction.
    */
  def pagerank(spark: SparkSession, dir: String, iters: Int = 2,
      topK: Int = 20,
      maxBroadcastRows: Long = graft.plans.Hints.DefaultMaxBroadcastRows): DataFrame = {
    // The r3–r6 shape relied on ReusedExchange for the edge build
    // (persisting the STRING edge table was measured to LOSE: 6.5 →
    // 11 s at sf0.1). With the r8 numeric 16-byte edges the tradeoff
    // flips: eagerly checkpointing the deduped edge table wins at
    // every measured scale (sf0.1 2.64 → 1.91 s, sf1 7.13 → 4.71,
    // sf3 13.96 → 8.69 — each consumer now reads materialized blocks
    // instead of re-running the distinct's final aggregation). Default
    // cut is localCheckpoint (lineage-truncation caveat as
    // dedup_components' barrier); spark.graft.reliableCheckpoint=true
    // writes rounds to the checkpoint FS instead (r9).
    val ed = graft.Checkpointing.cut(edges(spark, dir))
    // every node has outdeg ≥ 1, so the outdegree table IS the node
    // set — one groupBy covers nodes + outdeg, and its count (one
    // cheap job over the materialized edge blocks) gives n, which both
    // feeds the teleport constants (replacing the old 1-row crossJoin)
    // and size-gates the per-iteration broadcasts below
    val od = ed.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val nNodes = od.count()
    // static per-node table carried through the loop: outdeg rides in
    // the rank rows (the old shape re-joined rank⋈outdeg every
    // iteration) and the teleport term is precomputed once
    val r0 = od
      .select(col("src").as("node"), col("outdeg"),
        cents(lit(0.15) / lit(nNodes.toDouble), 1e9).as("base_e9"),
        cents(lit(1.0) / lit(nNodes.toDouble), 1e9).as("r_e9"))
    var r = r0
    for (_ <- 0 until iters) {
      // the per-edge contribution is constant per source node, so it
      // is computed ONCE per node on the O(nodes) broadcast side —
      // the edge scan only propagates and partial-aggregates longs;
      // only the partially-aggregated (dst, sum) rows shuffle. The
      // hints are size-gated on the node count (r9): past
      // maxBroadcastRows both joins degrade to shuffle joins
      // co-partitioned with the groupBy — same plan shape, one
      // exchange each, no code edit (PlanShapeSpec pins both shapes).
      val cr = r.select(col("node"),
        cents(lit(0.85) * col("r_e9") / col("outdeg"), 1.0).as("c_e9"))
      val contrib = ed.join(
          graft.plans.Hints.broadcastIfUnder(cr, nNodes, maxBroadcastRows),
          ed("src") === cr("node"))
        .groupBy(col("dst")).agg(sum(col("c_e9")).as("in_e9"))
      r = r0.join(
          graft.plans.Hints.broadcastIfUnder(contrib, nNodes, maxBroadcastRows),
          r0("node") === contrib("dst"), "left")
        .select(r0("node"), r0("outdeg"), r0("base_e9"),
          (r0("base_e9") + coalesce(col("in_e9"), lit(0L))).as("r_e9"))
    }
    // stringify BEFORE the final sort: the reference tiebreak is on
    // the rendered name ("c100" < "c2"), not the numeric id
    r.select(nodeName(col("node")).as("node"), col("r_e9"))
      .orderBy(col("r_e9").desc, col("node").asc)
      .limit(topK)
      .select(col("node"), r6(col("r_e9") / lit(1e9)).as("pagerank"))
  }

  /** Triangle listing on the co-purchase graph: part triples {a<b<c}
    * whose three pairs each co-occur in ≥ `minSupport` orders — the
    * "frequently bought TOGETHER together" structure one level above
    * [[Relational.basketLift]]'s pairs.
    *
    * Scale: edge generation is the bounded basket fan-out (pairs built
    * inside each order's part array — never a corpus self-join), and
    * the support threshold prunes the edge set BEFORE the two wedge/
    * closure joins, which therefore run on the (tiny) frequent-pair
    * table. Edges are oriented a<b by id, so each triangle is found
    * exactly once with no dedup pass; at adversarial degree skew the
    * standard remedy is degree-ordered orientation, which changes only
    * the orientation rule, not the plan shape.
    */
  /** The support-pruned co-purchase edge set (pa < pb, support ≥
    * minSupport) — in-basket pair fan-out, one orderkey shuffle, the
    * shared stage of [[triangles]] and [[degreeDist]].
    */
  private[graft] def frequentPairs(spark: SparkSession, dir: String,
      minSupport: Long): DataFrame =
    Tables.lineitem(spark, dir)
      // collect_set dedups per order, so no distinct pre-pass: the old
      // (l_orderkey, l_partkey) distinct paid a full extra shuffle of
      // the lineitem projection before the basket groupBy (r8)
      .select(col("l_orderkey"), col("l_partkey"))
      .groupBy(col("l_orderkey"))
      .agg(array_sort(collect_set(col("l_partkey"))).as("parts"))
      .filter(size(col("parts")) >= 2)
      // native in-basket pair fan-out (r8): the nested-transform HOF
      // evaluated an interpreted lambda per produced pair — pair
      // CONSTRUCTION, not the count, dominated the sf3 tail
      .select(explode(graft.functions.ArrayExprs.orderedPairs(col("parts"))).as("p"))
      .groupBy(col("p.pa").as("pa"), col("p.pb").as("pb"))
      .agg(count(lit(1)).as("sup"))
      .filter(col("sup") >= minSupport)

  /** Degree distribution of the frequent co-purchase graph: how many
    * nodes have each edge degree — the one-glance answer to "is this
    * graph a few hubs or a broad mesh" (hub-dominated graphs break the
    * wedge-join cost model [[triangles]] relies on, so this is also
    * its capacity check). Two bounded aggregates on the pruned edge
    * set; the corpus is only touched by the shared pair stage.
    */
  def degreeDist(spark: SparkSession, dir: String, minSupport: Long = 2): DataFrame =
    frequentPairs(spark, dir, minSupport)
      .select(explode(array(col("pa"), col("pb"))).as("part"))
      .groupBy(col("part")).agg(count(lit(1)).as("degree"))
      .groupBy(col("degree")).agg(count(lit(1)).as("n_nodes"))
      .orderBy(col("degree"))

  def triangles(spark: SparkSession, dir: String, minSupport: Long = 2,
      maxBroadcastRows: Long = graft.plans.Hints.DefaultMaxBroadcastRows): DataFrame = {
    // materialize the support-pruned pair table once: the three
    // projections read checkpoint blocks instead of each re-planning
    // the basket fan-out (r8 got the same sharing via ReusedExchange;
    // the explicit cut additionally yields the exact pair count, which
    // size-gates the closure-join broadcasts — r9)
    val pairs = graft.Checkpointing.cut(frequentPairs(spark, dir, minSupport))
    val nPairs = pairs.count()
    val ab = pairs.select(col("pa").as("a"), col("pb").as("b"), col("sup").as("s_ab"))
    val bc = pairs.select(col("pa").as("b"), col("pb").as("c"), col("sup").as("s_bc"))
    val ac = pairs.select(col("pa").as("a"), col("pb").as("c"), col("sup").as("s_ac"))
    // the support-pruned pair table is small by construction (35k rows
    // at sf1 for ~9M candidate pairs), so both closure joins broadcast:
    // zero post-pairs shuffles. Past maxBroadcastRows (an adversarially
    // low minSupport at 100× data) the gate drops the hints and both
    // closures degrade to shuffle joins — same plan shape, one exchange
    // per join, no code edit (PlanShapeSpec pins both shapes).
    ab.join(graft.plans.Hints.broadcastIfUnder(bc, nPairs, maxBroadcastRows), "b")
      .join(graft.plans.Hints.broadcastIfUnder(ac, nPairs, maxBroadcastRows), Seq("a", "c"))
      .select(col("a"), col("b"), col("c"),
        least(col("s_ab"), col("s_bc"), col("s_ac")).as("min_sup"))
  }
}
