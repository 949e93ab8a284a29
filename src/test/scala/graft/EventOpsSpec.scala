package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.EventOps

class EventOpsSpec extends AnyFunSuite {
  import SparkSuite._

  test("sessionize conserves events and sessions are ordered") {
    val s = EventOps.sessionize(spark, Sf)
    val total = s.agg(sum("n_events")).head().getLong(0)
    assert(total === Tables.events(spark, Sf).count())
    assert(s.filter(col("end_us") < col("start_us")).count() === 0)
  }

  test("funnel stages are strictly ordered where present") {
    val f = EventOps.funnel(spark, Sf)
    assert(f.filter(col("click_us").isNotNull && col("click_us") <= col("view_us")).count() === 0)
    assert(f.filter(col("purchase_us").isNotNull && col("purchase_us") <= col("click_us")).count() === 0)
    // a stage can't exist without the previous one
    assert(f.filter(col("click_us").isNotNull && col("view_us").isNull).count() === 0)
  }

  test("json extraction aggregates every event") {
    val j = EventOps.jsonAgg(spark, Sf)
    assert(j.agg(sum("n")).head().getLong(0) === Tables.events(spark, Sf).count())
  }
}
