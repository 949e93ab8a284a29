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

  test("event ngrams are 3-grams over the event alphabet with sane support") {
    val types = Tables.events(spark, Sf).select(col("event_type"))
      .distinct().collect().map(_.getString(0)).toSet
    val rows = EventOps.eventNgrams(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val parts = r.getString(0).split(" ")
      assert(parts.length == 3 && parts.forall(types.contains),
        s"gram '${r.getString(0)}' is not a 3-gram over the event alphabet")
      assert(r.getDouble(2) > 0 && r.getDouble(2) <= 1)
    }
    val sup = rows.map(_.getLong(1))
    assert(sup.sameElements(sup.sortBy(-_)), "not ordered by support")
  }

  test("rolling median matches a hand fold and resists a spike") {
    val rows = EventOps.rollingMedian(spark, Sf).collect().sortBy(_.getLong(0))
    assert(rows.nonEmpty)
    val revs = rows.map(_.getLong(1))
    rows.zipWithIndex.foreach { case (r, i) =>
      val frame = revs.slice(math.max(0, i - 6), i + 1).sorted
      assert(r.getLong(2) === frame.length.toLong)
      val med = frame((frame.length - 1) / 2) // lower middle, 0-based
      assert(r.getLong(3) === med, s"median mismatch at day ${r.getLong(0)}")
      assert(r.getBoolean(4) === (r.getLong(1) > 2 * med))
    }
    // robustness: the median of [m, m, m, m, m, m, 1e9·m] is still m
    val m = Array.fill(6)(100L) :+ 100000000000L
    assert(m.sorted.apply((m.length - 1) / 2) === 100L)
  }

  test("lag features are strictly backward-looking (no leakage)") {
    val rows = EventOps.lagFeatures(spark, Sf).collect()
    assert(rows.length == Tables.orders(spark, Sf).count())
    rows.filter(_.getLong(2) == 1L).foreach { r =>
      assert(r.isNullAt(3) && r.isNullAt(4),
        "first order must have null lag features")
    }
    // for a first order the rolling mean is its own value; recompute one
    // customer's chain end-to-end
    val c = rows.head.getLong(1)
    val chain = rows.filter(_.getLong(1) == c).sortBy(_.getLong(2))
    val vals = Tables.orders(spark, Sf).filter(col("o_custkey") === c)
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .select(col("o_totalprice")).collect()
      .map(r => math.floor(r.getDouble(0) * 100.0 + 0.5).toLong)
    def r6d(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    chain.zipWithIndex.foreach { case (r, i) =>
      val frame = vals.slice(math.max(0, i - 2), i + 1)
      assert(r.getDouble(5) == r6d(frame.sum / (100.0 * frame.length)),
        s"roll3 mismatch at idx ${i + 1} for customer $c")
      if (i > 0) assert(r.getDouble(3) == r6d(vals(i - 1) / 100.0))
    }
  }
}
