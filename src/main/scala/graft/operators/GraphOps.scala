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

  /** Session-shared materialization of [[edges]]: q_pagerank and
    * q_bfs_hops each need the deduped trade edge table; under the
    * session chain cache (DedupChain precedent — Bench/Verify enable
    * it) the table is built ONCE per SF-dir and every later consumer
    * reads the materialized parquet. With the cache off, per-query
    * behavior is unchanged (the r8/r9 Checkpointing.cut).
    */
  private[graft] def sharedEdges(spark: SparkSession, dir: String): DataFrame =
    if (DedupChain.enabled)
      DedupChain.cached("trade_edges", dir, spark)(edges(spark, dir))
    else graft.Checkpointing.cut(edges(spark, dir))

  /** Session-shared materialization of [[frequentPairs]] — the stage
    * q_triangles, q_degree_dist, q_common_neighbors and q_label_prop
    * all rebuild (r9 verdict: ~60 s of the sf3 window was this one
    * basket fan-out run four times). Keyed by minSupport so different
    * prunings never alias. Off-cache behavior unchanged.
    */
  private[graft] def sharedFrequentPairs(spark: SparkSession, dir: String,
      minSupport: Long): DataFrame =
    if (DedupChain.enabled)
      DedupChain.cached(s"frequent_pairs_$minSupport", dir, spark)(
        frequentPairs(spark, dir, minSupport))
    else graft.Checkpointing.cut(frequentPairs(spark, dir, minSupport))

  /** The per-order sorted part basket — ONE corpus shuffle that
    * [[frequentPairs]] (and through it four graph queries) AND
    * [[Relational.basketLift]]'s support/order counts all consume
    * (r11: the lift query rebuilt this exact groupBy while the pair
    * stage built it again internally — the last duplicated corpus
    * stage in the family, and the suite's sf3 ceiling). collect_set
    * dedups (orderkey, partkey), so no distinct pre-pass.
    */
  private[graft] def baskets(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"))
      .groupBy(col("l_orderkey"))
      .agg(array_sort(collect_set(col("l_partkey"))).as("parts"))

  /** Session-shared materialization of [[baskets]] — same contract as
    * [[sharedEdges]]: cache-on builds once per SF-dir, cache-off is the
    * plain plan (consumers inside ONE query still share its exchange).
    */
  private[graft] def sharedBaskets(spark: SparkSession, dir: String): DataFrame =
    if (DedupChain.enabled)
      DedupChain.cached("baskets", dir, spark)(baskets(spark, dir))
    else baskets(spark, dir)

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
    // writes rounds to the checkpoint FS instead (r9). Under the
    // session chain cache the edge table is shared with bfsHops (r10).
    val ed = sharedEdges(spark, dir)
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
    // basket stage shared with basketLift (r11); under the chain cache
    // the nested cached() call materializes it once for the session
    sharedBaskets(spark, dir)
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
    sharedFrequentPairs(spark, dir, minSupport)
      .select(explode(array(col("pa"), col("pb"))).as("part"))
      .groupBy(col("part")).agg(count(lit(1)).as("degree"))
      .groupBy(col("degree")).agg(count(lit(1)).as("n_nodes"))
      .orderBy(col("degree"))

  /** Minimum-hop BFS distance from a source node over the trade graph
    * — "how far does customer 1's supply neighborhood reach in ≤ k
    * hops" (the reachability primitive under blast-radius / related-
    * entity queries).
    *
    * Scale shape: frontier-expansion BFS — each round is ONE equi-join
    * of the (materialized-once) edge table with the current frontier
    * plus one anti-join against the visited set, both size-gated
    * broadcasts (frontier and visited are O(nodes); past the gate they
    * degrade to shuffle joins co-partitioned on the node id). The
    * frontier is cut per round, so the plan stays O(1) deep and each
    * round's work is proportional to the edges ADJACENT to the
    * frontier, not the whole graph history. The oracle is a DuckDB
    * recursive CTE over the same numeric edge encoding.
    */
  def bfsHops(spark: SparkSession, dir: String, source: Long = 2L,
      maxHops: Int = 4,
      maxBroadcastRows: Long = graft.plans.Hints.DefaultMaxBroadcastRows): DataFrame = {
    val ed = sharedEdges(spark, dir)
    val seed = spark.range(1)
      .select(lit(source).as("node"), lit(0).as("hops"))
    // visited = union of the per-round cut frontiers: each member is
    // already materialized, so no extra cut of the union is needed
    var visited = seed
    var frontier = seed.select(col("node"))
    var nFrontier = 1L
    var nVisited = 1L
    for (h <- 1 to maxHops) {
      val fr = frontier
      val next = ed.join(
          graft.plans.Hints.broadcastIfUnder(fr, nFrontier, maxBroadcastRows),
          ed("src") === fr("node"))
        .select(col("dst").as("node")).distinct()
        .join(graft.plans.Hints.broadcastIfUnder(visited, nVisited, maxBroadcastRows),
          Seq("node"), "left_anti")
        .select(col("node"), lit(h).as("hops"))
      // r16: LAZY cut — the convergence count right below materializes
      // the checkpoint, folding the old cut-job + count-job pair into
      // one job per hop (the components-loop pattern)
      frontier = graft.Checkpointing.cut(next.select(col("node")), eager = false)
      nFrontier = frontier.count()
      nVisited += nFrontier
      visited = visited.union(
        frontier.select(col("node"), lit(h).as("hops")))
    }
    visited.select(nodeName(col("node")).as("node"), col("hops"))
  }

  /** Link prediction by common neighbors on the co-purchase graph: for
    * part pairs NOT directly connected, how many frequent-pair
    * neighbors they share, plus the neighbor-Jaccard score — the
    * "customers who bought these also bought that" candidate edges one
    * step before they exist.
    *
    * Scale shape: the wedge join runs on the support-PRUNED pair table
    * (the same shared stage as [[triangles]]), never the corpus; the
    * per-common-neighbor fan-out is bounded by the pruned degree (at
    * adversarial hub skew the standard remedy is a degree cap on the
    * wedge pivot, which changes a filter, not the plan). Direct edges
    * are removed with one anti-join; degrees ride a size-gated
    * broadcast.
    */
  def commonNeighbors(spark: SparkSession, dir: String, minSupport: Long = 2,
      topK: Int = 30,
      maxBroadcastRows: Long = graft.plans.Hints.DefaultMaxBroadcastRows): DataFrame = {
    val pairs = sharedFrequentPairs(spark, dir, minSupport)
    val nPairs = pairs.count()
    val und = pairs.select(col("pa").as("x"), col("pb").as("y"))
      .union(pairs.select(col("pb").as("x"), col("pa").as("y")))
    val deg = und.groupBy(col("x")).agg(count(lit(1)).as("deg"))
    val wa = und.select(col("y").as("b"), col("x").as("a"))
    val wc = und.select(col("y").as("b"), col("x").as("c"))
    val wedges = wa
      .join(graft.plans.Hints.broadcastIfUnder(wc, 2 * nPairs, maxBroadcastRows), "b")
      .filter(col("a") < col("c"))
      .groupBy(col("a"), col("c")).agg(count(lit(1)).as("common_cnt"))
      // drop pairs that are already edges: candidate links only
      .join(pairs.select(col("pa").as("a"), col("pb").as("c")),
        Seq("a", "c"), "left_anti")
    val da = deg.select(col("x").as("a"), col("deg").as("deg_a"))
    val dc = deg.select(col("x").as("c"), col("deg").as("deg_c"))
    wedges
      .join(graft.plans.Hints.broadcastIfUnder(da, 2 * nPairs, maxBroadcastRows), "a")
      .join(graft.plans.Hints.broadcastIfUnder(dc, 2 * nPairs, maxBroadcastRows), "c")
      .select(col("a"), col("c"), col("common_cnt"), col("deg_a"), col("deg_c"),
        r6(col("common_cnt") / (col("deg_a") + col("deg_c") - col("common_cnt")))
          .as("jaccard"))
      .orderBy(col("common_cnt").desc, col("a"), col("c"))
      .limit(topK)
  }

  /** Community detection by synchronous label propagation on the
    * co-purchase graph: `iters` rounds of "adopt the most frequent
    * neighbor label, ties to the smallest", reported as community
    * sizes. Unlike [[Dedup.components]] (pure min-label = connected
    * components) the FREQUENCY vote finds dense sub-structure inside a
    * component — on this data ~440 product communities, where the
    * dense bipartite trade graph would collapse to its 2 sides.
    *
    * Deterministic by construction: synchronous updates (every round
    * reads only the previous round's labels) and a total tie order
    * (count desc, numeric label asc) — the oracle unrolls the same
    * rounds over the same numeric node ids. Scale shape: the corpus is
    * touched once by the shared support-pruned pair stage
    * ([[frequentPairs]]); per round, one edge⋈labels join (labels
    * O(nodes), size-gated broadcast), one partial-agg shuffle on
    * (dst, label), and one partial-agg shuffle on dst — the vote
    * winner is a `max(struct(n, -label))` fold (count desc, label asc
    * by struct order), so both aggregates map-side combine and no
    * round ever sorts: partitioned by node id, never global.
    */
  def labelProp(spark: SparkSession, dir: String, iters: Int = 3,
      minSupport: Long = 2,
      maxBroadcastRows: Long = graft.plans.Hints.DefaultMaxBroadcastRows): DataFrame = {
    val pairs = sharedFrequentPairs(spark, dir, minSupport)
    val ed = pairs.select(col("pa").as("src"), col("pb").as("dst"))
      .union(pairs.select(col("pb").as("src"), col("pa").as("dst")))
    // undirected edges, so the src projection IS the node set
    val nodes = ed.select(col("src").as("node")).distinct()
    val nNodes = nodes.count()
    var labels = nodes.select(col("node"), col("node").as("label"))
    for (_ <- 1 to iters) {
      val lb = labels
      val votes = ed.join(
          graft.plans.Hints.broadcastIfUnder(lb, nNodes, maxBroadcastRows),
          ed("src") === lb("node"))
        .groupBy(col("dst"), col("label")).agg(count(lit(1)).as("n"))
      // winner = count desc, label asc: max over (n, -label) structs.
      // Node ids are non-negative Longs, so -label is overflow-safe.
      // r16: LAZY cut — materialized by the first consuming job (the
      // next round's broadcast/join or the final community aggregate)
      // instead of one serial driver job per round; measured 1.67 →
      // 1.61 s at sf0.1, and the checkpoint still materializes once
      labels = graft.Checkpointing.cut(
        votes.groupBy(col("dst"))
          .agg(max(struct(col("n"), (-col("label")).as("neg"))).as("m"))
          .select(col("dst").as("node"), (-col("m.neg")).as("label")),
        eager = false)
    }
    labels.groupBy(col("label")).agg(count(lit(1)).as("n_nodes"))
      .select(col("label").as("community"), col("n_nodes"))
      .orderBy(col("n_nodes").desc, col("community"))
  }

  def triangles(spark: SparkSession, dir: String, minSupport: Long = 2,
      maxBroadcastRows: Long = graft.plans.Hints.DefaultMaxBroadcastRows): DataFrame = {
    // materialize the support-pruned pair table once: the three
    // projections read checkpoint blocks instead of each re-planning
    // the basket fan-out (r8 got the same sharing via ReusedExchange;
    // the explicit cut additionally yields the exact pair count, which
    // size-gates the closure-join broadcasts — r9)
    val pairs = sharedFrequentPairs(spark, dir, minSupport)
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

  /** k-core decomposition of the co-purchase graph by synchronous
    * peeling: `rounds` rounds of "drop every node with degree < k",
    * reported as the per-round (n_nodes, n_edges) shrink curve — the
    * dense-core size/density profile one level above [[degreeDist]]
    * (round 0 is the unpeeled support-pruned graph; the curve reaching
    * a fixpoint means the k-core is found).
    *
    * Exact-integer semantics end to end (counts only — no floats), so
    * the oracle unrolls the same rounds with zero rounding contracts.
    * Scale shape: per round one partial-agg degree shuffle over the
    * current edge set plus two semi-joins against the O(nodes) keep
    * set (size-gated broadcasts, like every other loop here); edges
    * only ever SHRINK, so round cost is bounded by the support-pruned
    * pair table, which the session chain cache shares with the other
    * five graph queries. Each round's survivor set is cut, keeping the
    * plan O(1) deep.
    */
  def kcore(spark: SparkSession, dir: String, k: Int = 3, rounds: Int = 6,
      minSupport: Long = 2,
      maxBroadcastRows: Long = graft.plans.Hints.DefaultMaxBroadcastRows): DataFrame = {
    var e = sharedFrequentPairs(spark, dir, minSupport)
      .select(col("pa").as("a"), col("pb").as("b"))
    // n_edges directly off the (a<b) edge table; n_nodes off one
    // exploded distinct — both bounded one-row aggregates over blocks
    // already materialized by the per-round cut
    def snap(r: Int, ed: DataFrame): DataFrame =
      ed.select(explode(array(col("a"), col("b"))).as("node"))
        .agg(countDistinct(col("node")).as("n_nodes"),
          (count(lit(1)) / lit(2)).cast("long").as("n_edges"))
        .select(lit(r).cast("long").as("round_no"), col("n_nodes"), col("n_edges"))
    val nNodes0 = e.select(col("a")).union(e.select(col("b"))).distinct().count()
    var snaps = Seq(snap(0, e))
    for (r <- 1 to rounds) {
      val deg = e.select(explode(array(col("a"), col("b"))).as("node"))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      val keep = deg.filter(col("deg") >= k).select(col("node"))
      def kb(as: String) = graft.plans.Hints.broadcastIfUnder(
        keep.select(col("node").as(as)), nNodes0, maxBroadcastRows)
      // r16: LAZY cut (see labelProp) — each round's survivor set is
      // materialized once, by whichever of snap/next-round runs first
      e = graft.Checkpointing.cut(
        e.join(kb("a"), Seq("a"), "left_semi")
          .join(kb("b"), Seq("b"), "left_semi")
          .select(col("a"), col("b")), eager = false)
      snaps = snaps :+ snap(r, e)
    }
    snaps.reduce(_.union(_)).orderBy(col("round_no"))
  }

  /** HITS hubs & authorities on the DIRECTED customer→supplier trade
    * graph (`iters` synchronous rounds): customers score as hubs of
    * the suppliers they buy from, suppliers as authorities of the
    * customers that buy from them — the who-aggregates-whom reading
    * PageRank's single random-walk score flattens. Output is the
    * top-`topK` of each role with scores normalized to the role max.
    *
    * Exact cross-engine parity without float sums: scores live as
    * Longs, each round's vector is re-scaled into [2^29, 2^30) by a
    * RIGHT SHIFT of s = bitlen(max) − 30 bits, where bitlen is the
    * INTEGER bit length (= floor(log2)+1 — Long.numberOfLeadingZeros
    * here, length(printf('%b',·)) in the oracle; no float log whose
    * ulp at a power-of-2 boundary could flip the floor), so the
    * distributed Σ over in-/out-neighbors is an order-independent
    * Long sum bounded by deg_max·2^30 — safe while deg_max < 2^33,
    * far past any real degree. The final score is one scalar double
    * divide of two Longs, rounded r6.
    *
    * Scale shape: identical to [[pagerank]] — per half-round one
    * size-gated broadcast join of the O(nodes) score vector against
    * the materialized (session-shared) edge table plus one partial-agg
    * shuffle on the receiving side; the rescale max rides as a
    * broadcast one-row aggregate over the just-cut vector (r11 — zero
    * driver reads inside the loop, pagerank's hygiene). No sorts
    * inside the loop; the top-k is TakeOrdered on the final vectors.
    */
  def hits(spark: SparkSession, dir: String, iters: Int = 2, topK: Int = 20,
      maxBroadcastRows: Long = graft.plans.Hints.DefaultMaxBroadcastRows): DataFrame = {
    val ed = sharedEdges(spark, dir).filter(col("src") % 2 === 0)
    val nNodes = ed.select(col("src")).union(ed.select(col("dst"))).distinct().count()
    // rescale a score vector into [2^29, 2^30): shift by
    // bitlen(max) - 30 (never negative: vectors start at 2^30 and
    // sums only grow). The max rides CLUSTER-SIDE as a broadcast
    // one-row aggregate (r11 — no per-half-round driver head();
    // length(bin(x)) is the same integer bit length as the old
    // numberOfLeadingZeros and the oracle's length(printf('%b',·)))
    def rescaled(v: DataFrame, scoreCol: String): DataFrame =
      v.crossJoin(broadcast(v.agg(max(col(scoreCol)).as("_mx"))))
        .select(col("node"),
          expr(s"shiftright($scoreCol, greatest(0, length(bin(_mx)) - 30))")
            .as(scoreCol))
    var hubs = ed.select(col("src").as("node")).distinct()
      .select(col("node"), lit(1L << 30).as("h"))
    var auths: DataFrame = null
    for (_ <- 1 to iters) {
      val hb = graft.plans.Hints.broadcastIfUnder(hubs, nNodes, maxBroadcastRows)
      // r16: LAZY cuts — each half-round's vector materializes inside
      // the first job that consumes it (the rescale max broadcast of
      // the NEXT half-round) instead of one serial driver job per
      // half-round; measured 2.27 → 1.97 s at sf0.1, same blocks
      auths = rescaled(
        graft.Checkpointing.cut(
          ed.join(hb, ed("src") === hb("node"))
            .groupBy(col("dst")).agg(sum(col("h")).as("a"))
            .select(col("dst").as("node"), col("a")), eager = false), "a")
      val ab = graft.plans.Hints.broadcastIfUnder(auths, nNodes, maxBroadcastRows)
      hubs = rescaled(
        graft.Checkpointing.cut(
          ed.join(ab, ed("dst") === ab("node"))
            .groupBy(col("src")).agg(sum(col("a")).as("h"))
            .select(col("src").as("node"), col("h")), eager = false), "h")
    }
    // output normalization maxes also fold cluster-side (r11): one
    // broadcast one-row aggregate per vector instead of driver head()s
    def top(v: DataFrame, scoreCol: String, role: String): DataFrame =
      v.crossJoin(broadcast(v.agg(max(col(scoreCol)).as("_mx"))))
        .select(lit(role).as("role"), nodeName(col("node")).as("node"),
          col(scoreCol).as("raw"), col("_mx"))
        .orderBy(col("raw").desc, col("node").asc)
        .limit(topK)
        .select(col("role"), col("node"), col("raw"),
          r6(col("raw") / col("_mx").cast("double")).as("score"))
    // final ordering ties break on RAW (r11, ADVICE): the r6-rounded
    // score can tie across distinct raw values, and the oracle orders
    // by raw DESC — raw rides through the union and drops after sorting
    top(hubs, "h", "hub").union(top(auths, "a", "authority"))
      .orderBy(col("role"), col("raw").desc, col("node"))
      .select(col("role"), col("node"), col("score"))
  }
}
