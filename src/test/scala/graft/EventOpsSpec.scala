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

  test("attribution: last click strictly precedes the purchase") {
    val a = EventOps.attribution(spark, Sf)
    assert(a.filter(col("attributed") && col("last_click_us") > col("purchase_us")).count() === 0)
    assert(a.count() === Tables.events(spark, Sf)
      .filter(col("event_type") === "purchase").count())
  }

  test("approx distinct is within the configured error of exact") {
    val r = graft.operators.Relational.approxDistinctRaw(spark, Sf)
      .withColumn("rel_err",
        abs(col("approx_parts") - col("exact_parts")) / col("exact_parts"))
    assert(r.filter(col("rel_err") > 0.1).count() === 0)
  }

  test("json extraction aggregates every event") {
    val j = EventOps.jsonAgg(spark, Sf)
    assert(j.agg(sum("n")).head().getLong(0) === Tables.events(spark, Sf).count())
  }
}
