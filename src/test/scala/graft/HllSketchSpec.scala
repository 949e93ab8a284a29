package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.HllSketch

/** HLL aggregator: accuracy in both regimes, partitioning invariance,
  * and the property that makes it the pre-aggregation primitive —
  * merging per-slice sketches is byte-identical to sketching the union.
  */
class HllSketchSpec extends AnyFunSuite {
  import SparkSuite._

  test("small-range estimate (linear counting) is near-exact on event users") {
    val users = Tables.events(spark, Sf).select(col("user_id"))
    val exact = users.distinct().count().toDouble
    val est = HllSketch.estimate(HllSketch.build(users, col("user_id")))
    assert(math.abs(est - exact) / exact < 0.02, s"est=$est exact=$exact")
  }

  test("large-range estimate stays within 3×rsd of exact") {
    import spark.implicits._
    val n = 200000L
    val ids = spark.range(n).toDF("id")
    val est = HllSketch.estimate(HllSketch.build(ids, col("id")))
    val rsd = 1.04 / math.sqrt(HllSketch.M.toDouble)
    assert(math.abs(est - n) / n < 3 * rsd, s"est=$est exact=$n rsd=$rsd")
  }

  test("the sketch is partitioning-invariant") {
    val users = Tables.events(spark, Sf).select(col("user_id"))
    val a = HllSketch.build(users.repartition(7), col("user_id"))
    val b = HllSketch.build(users.coalesce(1), col("user_id"))
    assert(java.util.Arrays.equals(a, b))
  }

  test("merge of per-slice sketches is byte-identical to the sketch of the union") {
    val ev = Tables.events(spark, Sf)
    val types = ev.select("event_type").distinct().collect().map(_.getString(0))
    assert(types.length > 1)
    val parts = types.map(t =>
      HllSketch.build(ev.filter(col("event_type") === t), col("user_id")))
    val merged = parts.reduce(HllSketch.merge)
    val whole = HllSketch.build(ev, col("user_id"))
    assert(java.util.Arrays.equals(merged, whole))
    // and the merged estimate answers the rollup without a rescan
    val exact = ev.select("user_id").distinct().count().toDouble
    val est = HllSketch.estimate(merged)
    assert(math.abs(est - exact) / exact < 0.02)
  }

  test("streaming HLL converges to the batch sketch exactly and absorbs re-delivery") {
    val dir = java.nio.file.Files.createTempDirectory("graft-hllstream").toString
    val rows = Tables.events(spark, Sf)
      .select(col("event_type").as("grp"), xxhash64(col("user_id")).as("h"))
    rows.repartition(4).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(rows.schema)
      .option("maxFilesPerTrigger", 1) // force multiple micro-batches
      .parquet(dir)
    val q = graft.streaming.HllStream.distinctPerGroup(stream)
      .writeStream.outputMode("update").format("memory").queryName("hllstream").start()
    try {
      q.processAllAvailable()
      def latest(): Map[String, Double] = {
        val all = spark.table("hllstream")
          .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
        val last = all.groupBy(_._1).map { case (g, rs) => g -> rs.map(_._3).max }
        all.filter(r => last(r._1) == r._3).map(r => r._1 -> r._2).toMap
      }
      val streamed = latest()
      // byte-identical algebra: the streamed estimate EQUALS the batch
      // sketch estimate per group, not just approximates it
      val ev = Tables.events(spark, Sf)
      val types = ev.select("event_type").distinct().collect().map(_.getString(0))
      types.foreach { t =>
        val batch = HllSketch.estimate(
          HllSketch.build(ev.filter(col("event_type") === t), col("user_id")))
        assert(streamed(t) === batch, s"group $t: stream != batch")
      }
      // re-delivery of the same rows leaves every estimate unchanged
      rows.coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
      val redelivered = latest()
      types.foreach(t => assert(redelivered(t) === streamed(t), s"group $t changed"))
    } finally q.stop()
  }
}
