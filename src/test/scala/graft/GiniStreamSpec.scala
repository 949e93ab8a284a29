package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.InequalityStream
import graft.operators.EventOps

/** Streaming inequality twin: the per-user totals stream must land on
  * exactly the batch totals (telescoping updates), the exact batch
  * gini/lorenz readout must hold on the streamed state, and the
  * fixed-size sketch must fold to the identical arrays as sketching
  * the final totals from scratch.
  */
class GiniStreamSpec extends AnyFunSuite {
  import SparkSuite._

  private def evCols = Seq("user_id", "event_type", "value", "ts")

  test("batch-mode fold: totals ≡ batch purchaseTotals, readout ≡ q_gini/q_lorenz") {
    val updates = InequalityStream.userTotals(
      Tables.events(spark, Sf).select(evCols.map(col): _*)).toDF()
    val got = InequalityStream.totalsOf(updates)
      .orderBy("user_id").collect().toSeq
    val want = EventOps.purchaseTotals(spark, Sf)
      .orderBy("user_id").collect().toSeq
    assert(got === want)
    val gotG = EventOps.giniFromTotals(InequalityStream.totalsOf(updates)).collect().toSeq
    assert(gotG === EventOps.gini(spark, Sf).collect().toSeq)
  }

  test("streamed totals across micro-batches ≡ batch, late/recurring users included") {
    val dir = Files.createTempDirectory("graft-gini").toString
    val ev = Tables.events(spark, Sf).select(evCols.map(col): _*)
    // three deliveries with users recurring across them (split by an
    // arbitrary non-user key so per-user totals must accumulate)
    ev.filter(md5(col("ts").cast("string")).startsWith("0"))
      .write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(ev.schema).parquet(dir)
    val q = InequalityStream.userTotals(stream)
      .writeStream.outputMode("update").format("memory").queryName("ginis").start()
    try {
      q.processAllAvailable()
      ev.filter(md5(col("ts").cast("string")).startsWith("1"))
        .write.mode("append").parquet(dir)
      q.processAllAvailable()
      ev.filter(!md5(col("ts").cast("string")).rlike("^[01]"))
        .write.mode("append").parquet(dir)
      q.processAllAvailable()
      val updates = spark.table("ginis")
      val got = InequalityStream.totalsOf(updates).orderBy("user_id").collect().toSeq
      val want = EventOps.purchaseTotals(spark, Sf).orderBy("user_id").collect().toSeq
      assert(got === want)
      // the graded readouts run UNCHANGED on the streamed state
      assert(EventOps.giniFromTotals(InequalityStream.totalsOf(updates)).collect().toSeq
        === EventOps.gini(spark, Sf).collect().toSeq)
      assert(EventOps.lorenzFromTotals(InequalityStream.totalsOf(updates)).collect().toSeq
        === EventOps.lorenz(spark, Sf).collect().toSeq)
      // the bounded sketch folded over the update log equals the sketch
      // of the final totals, array-for-array (add/remove are inverses)
      val fromUpdates = InequalityStream.GiniSketch.ofUpdates(
        updates.collect().iterator.map(r => InequalityStream.TotalUpdate(
          r.getLong(0), r.getLong(1), r.getLong(2))))
      val fromTotals = InequalityStream.GiniSketch.ofTotals(
        want.iterator.map(_.getLong(1)))
      assert(fromUpdates.counts.toSeq === fromTotals.counts.toSeq)
      assert(fromUpdates.sums.toSeq === fromTotals.sums.toSeq)
      // grouped-data gini is a lower bound of the exact coefficient,
      // and log2 buckets keep it close
      val exact = EventOps.gini(spark, Sf).head().getDouble(2)
      assert(fromUpdates.estimate <= exact + 1e-4,
        s"sketch ${fromUpdates.estimate} above exact $exact")
      assert(exact - fromUpdates.estimate <= 0.1,
        s"sketch ${fromUpdates.estimate} too far below exact $exact")
    } finally q.stop()
  }

  test("sketch add/remove are exact inverses under churn") {
    val sk = new InequalityStream.GiniSketch
    val rng = new scala.util.Random(7)
    val vals = Seq.fill(500)(1L + rng.nextInt(100000).toLong)
    vals.foreach(sk.add)
    // replace half the population, then undo the replacement
    val (repl, _) = vals.splitAt(250)
    repl.foreach { v => sk.remove(v); sk.add(v * 3) }
    repl.foreach { v => sk.remove(v * 3); sk.add(v) }
    val fresh = InequalityStream.GiniSketch.ofTotals(vals.iterator)
    assert(sk.counts.toSeq === fresh.counts.toSeq)
    assert(sk.sums.toSeq === fresh.sums.toSeq)
  }
}
