package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.plans.ScanShare

/** ScanShare bounds cached-block residency for the shared-scan entry
  * points (ADVICE r6: userOverlap / pmi / jsDivergence / vocabOverlap /
  * heaps persisted and never unpersisted, accumulating for the session
  * lifetime of a full-surface Bench run).
  */
class ScanShareSpec extends AnyFunSuite {
  import SparkSuite._
  import spark.implicits._

  test("enrollment is bounded: oldest scan is evicted past the cap") {
    ScanShare.drain()
    val frames = (0 until ScanShare.cap + 3).map { i =>
      ScanShare.shared(Seq(i, i + 1).toDF("x"))
    }
    assert(ScanShare.liveCount === ScanShare.cap)
    // the oldest (evicted) frames no longer hold storage
    frames.take(3).foreach(f => assert(f.storageLevel.useMemory === false))
    // the newest cap frames are still cached
    frames.drop(3).foreach(f => assert(f.storageLevel.useMemory === true))
    ScanShare.drain()
    assert(ScanShare.liveCount === 0)
    frames.foreach(f => assert(f.storageLevel.useMemory === false))
  }

  test("an evicted frame still computes correctly (recompute from lineage)") {
    ScanShare.drain()
    val first = ScanShare.shared(Seq(1, 2, 3).toDF("x"))
    first.count()
    (0 until ScanShare.cap).foreach(i => ScanShare.shared(Seq(i).toDF("x")))
    assert(first.storageLevel.useMemory === false)
    assert(first.agg(sum(col("x"))).head().getLong(0) === 6L)
    ScanShare.drain()
  }

  test("shared-scan entry points stay correct after a full drain mid-plan") {
    ScanShare.drain()
    val df = graft.operators.EventOps.userOverlap(spark, Sf)
    // evict everything the plan enrolled before it runs: the result must
    // be identical to a fresh cached run
    ScanShare.drain()
    val evicted = df.orderBy("type_a", "type_b").collect()
    val fresh = graft.operators.EventOps.userOverlap(spark, Sf)
      .orderBy("type_a", "type_b").collect()
    assert(evicted.toSeq === fresh.toSeq)
    ScanShare.drain()
  }
}
