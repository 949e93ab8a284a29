package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.CohortLtvStream
import graft.operators.EventOps

/** Streaming cohort-LTV twin: summed deltas must equal the batch
  * matrix at every epoch, including when a late out-of-order event
  * moves a user's first-seen week earlier (cohort re-tier with full
  * retraction).
  */
class CohortLtvStreamSpec extends AnyFunSuite {
  import SparkSuite._

  private def evCols = Seq("user_id", "event_type", "value", "ts")

  test("batch-mode fold rolls up to the batch cohortLtv row-for-row") {
    val deltas = CohortLtvStream.deltas(
      Tables.events(spark, Sf).select(evCols.map(col): _*)).toDF()
    val got = CohortLtvStream.matrixOf(deltas).collect().toSeq
    val want = EventOps.cohortLtv(spark, Sf).collect().toSeq
    assert(got.size === want.size)
    got.zip(want).foreach { case (g, w) => assert(g === w) }
  }

  test("streamed deltas across micro-batches roll up to the batch matrix") {
    val dir = Files.createTempDirectory("graft-ltv").toString
    val ev = Tables.events(spark, Sf).select(evCols.map(col): _*)
    // deliver NEWEST weeks first: every user's true first week arrives
    // in a LATER batch, so re-tier retractions are guaranteed work, not
    // a lucky shuffle of the data
    ev.filter(col("ts") >= "2024-01-20").write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(ev.schema).parquet(dir)
    val q = CohortLtvStream.deltas(stream)
      .writeStream.outputMode("update").format("memory").queryName("ltvs").start()
    try {
      q.processAllAvailable()
      ev.filter(col("ts") >= "2024-01-10" && col("ts") < "2024-01-20")
        .write.mode("append").parquet(dir)
      q.processAllAvailable()
      ev.filter(col("ts") < "2024-01-10")
        .write.mode("append").parquet(dir)
      q.processAllAvailable()
      val got = CohortLtvStream.matrixOf(spark.table("ltvs")).collect().toSeq
      val want = EventOps.cohortLtv(spark, Sf).collect().toSeq
      assert(got.size === want.size)
      got.zip(want).foreach { case (g, w) => assert(g === w) }
      // re-tier retractions really happened (negative deltas exist):
      // chunk 1 withheld some users' first events, so later deliveries
      // must have moved cohorts
      assert(spark.table("ltvs").filter(col("d_users") < 0).count() > 0)
    } finally q.stop()
  }

  test("a late earlier event re-tiers the user and re-keys their cells") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-ltv-late").toString
    def rows(data: Seq[(Long, String, Double, String)]) = data
      .toDF("user_id", "event_type", "value", "ts0")
      .select(col("user_id"), col("event_type"), col("value"),
        col("ts0").cast("timestamp").as("ts"))
    // first delivery: a purchase establishes cohort week W
    rows(Seq((9001L, "purchase", 25.0, "2024-06-20 12:00:00")))
      .write.mode("overwrite").parquet(dir)
    val schema = rows(Seq((9001L, "view", 0.0, "2024-06-20 12:00:00"))).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = CohortLtvStream.deltas(stream)
      .writeStream.outputMode("update").format("memory").queryName("ltvl").start()
    try {
      q.processAllAvailable()
      val before = CohortLtvStream.matrixOf(spark.table("ltvl")).collect()
      assert(before.length === 1 && before.head.getLong(1) === 0L) // age 0
      // late view 3 weeks EARLIER: cohort moves back, the purchase cell
      // re-keys from age 0 to age 3
      rows(Seq((9001L, "view", 0.0, "2024-05-30 12:00:00")))
        .write.mode("append").parquet(dir)
      q.processAllAvailable()
      val after = CohortLtvStream.matrixOf(spark.table("ltvl")).collect()
      assert(after.length === 1)
      assert(after.head.getLong(0) === before.head.getLong(0) - 3L) // cohort −3 weeks
      assert(after.head.getLong(1) === 3L)                          // age re-keyed
      assert(after.head.getLong(2) === 1L)                          // still one user
      assert(after.head.getLong(3) === 1L)                          // one purchase
      assert(after.head.getDouble(4) === 25.0)                      // revenue intact
    } finally q.stop()
  }
}
