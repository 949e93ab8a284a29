package graft

import org.scalatest.funsuite.AnyFunSuite

/** Locks in the audited physical-plan shapes (SURVEY.md §5 / §8): if a
  * refactor stops pushing a filter into the scan or drops a broadcast,
  * these fail even though results stay correct.
  */
class PlanShapeSpec extends AnyFunSuite {
  import SparkSuite._

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, Sf)
    df.collect() // finalize the adaptive plan
    df.queryExecution.executedPlan.toString
  }

  test("q1_agg pushes the date filter into the parquet scan and partial-aggregates") {
    val p = planOf("q1_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
    assert(p.contains("partial_sum"), p)
  }

  test("q3_join broadcasts the filtered dimension and avoids a global sort") {
    val p = planOf("q3_join")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("vs_knn_join plans the custom partial top-k before the rank shuffle") {
    val p = planOf("vs_knn_join")
    assert(p.contains("PartialTopK "), p)
  }

  test("column pruning reaches the scans (no full-width reads in q1)") {
    val p = planOf("q1_agg")
    // lineitem has 11 columns; q1 needs 6 — unused ones must not be scanned
    assert(p.contains("l_quantity"), p)
    assert(!p.contains("l_partkey") && !p.contains("l_suppkey") && !p.contains("l_tax"), p)
  }

  test("native vector expressions appear in the knn plan (not HOF fallbacks)") {
    val p = planOf("vs_knn_topk")
    assert(p.contains("dotproductexpr"), p)
    assert(!p.contains("zip_with"), p)
  }
}
