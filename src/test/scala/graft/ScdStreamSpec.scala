package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.ScdStream

/** Streaming SCD2 twin: emitted versions must match the batch builder
  * exactly once the watermark has passed them, and a version must never
  * be emitted while still mutable.
  */
class ScdStreamSpec extends AnyFunSuite {
  import SparkSuite._

  private def cols = Seq("event_id", "ts", "user_id", "props")

  test("streaming scd2 matches the batch builder row-for-row") {
    val dir = Files.createTempDirectory("graft-scd").toString
    val ev = Tables.events(spark, Sf).select(cols.map(col): _*)
    ev.repartition(4).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(ev.schema).parquet(dir)
    val q = ScdStream.scd2(stream)
      .writeStream.outputMode("append").format("memory").queryName("scds").start()
    try {
      q.processAllAvailable()
      // sentinel 1 (tier 39 ≠ any real tier) closes every user's open
      // version at 2030-01-01; sentinel 2 a month later pushes the
      // watermark past sentinel 1 so that close becomes final
      def sentinel(ts: String, off: Long, k: Int) = ev
        .groupBy("user_id").agg(max("event_id").as("event_id"))
        .select((col("event_id") + off).as("event_id"), expr(s"timestamp'$ts'").as("ts"),
          col("user_id"), lit(s"""{"k": $k}""").as("props"))
      sentinel("2030-01-01", 1000000L, 999).write.mode("append").parquet(dir)
      q.processAllAvailable()
      sentinel("2030-02-01", 2000000L, 999).write.mode("append").parquet(dir)
      q.processAllAvailable(); q.processAllAvailable()
      val cut = spark.sql("select unix_micros(timestamp'2029-01-01')").head().getLong(0)
      val got = spark.table("scds")
        .filter(col("valid_from_us") < cut)
        .withColumn("valid_to_us",
          when(col("valid_to_us") >= cut, lit(null)).otherwise(col("valid_to_us")))
        .select("user_id", "tier", "valid_from_us", "valid_to_us", "version")
        .orderBy("user_id", "version").collect().toSeq
      val want = graft.operators.EventOps.scd2(spark, Sf)
        .orderBy("user_id", "version").collect().toSeq
      assert(got.size === want.size)
      got.zip(want).foreach { case (g, w) => assert(g === w) }
    } finally q.stop()
  }

  test("batch-mode fold equals the batch operator including open versions") {
    val got = ScdStream.scd2(Tables.events(spark, Sf).select(cols.map(col): _*))
      .toDF().orderBy("user_id", "version").collect().toSeq
    val want = graft.operators.EventOps.scd2(spark, Sf)
      .orderBy("user_id", "version").collect().toSeq
    assert(got.size === want.size)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getLong(0) === w.getLong(0))
      assert(g.getLong(1) === w.getLong(1))
      assert(g.getLong(2) === w.getLong(2))
      assert(Option(g.get(3)) === Option(w.get(3)))
      assert(g.getLong(4) === w.getLong(4))
    }
  }

  test("a late within-watermark event retiers the pending region, never an emitted one") {
    val dir = Files.createTempDirectory("graft-scd-late").toString
    import spark.implicits._
    def rows(data: Seq[(Long, String, Long, Int)]) = data
      .toDF("event_id", "ts0", "user_id", "k")
      .select(col("event_id"), col("ts0").cast("timestamp").as("ts"),
        col("user_id"), concat(lit("{\"k\": "), col("k"), lit("}")).as("props"))
    rows(Seq((1L, "2024-06-01 10:00:00", 7001L, 10),
      (2L, "2024-06-01 10:05:00", 7001L, 10))).write.mode("overwrite").parquet(dir)
    val schema = rows(Seq((1L, "2024-06-01 10:00:00", 7001L, 10))).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = ScdStream.scd2(stream)
      .writeStream.outputMode("append").format("memory").queryName("scdl").start()
    try {
      q.processAllAvailable()
      // late event between the two (inside the 10-min watermark) with a
      // DIFFERENT tier: must split the run into three versions
      rows(Seq((3L, "2024-06-01 10:02:00", 7001L, 90))).write.mode("append").parquet(dir)
      q.processAllAvailable()
      // sentinel tier 3 ≠ the final real tier 0, so it closes version 3
      rows(Seq((4L, "2030-01-01 00:00:00", 7001L, 99),
        (5L, "2030-02-01 00:00:00", 7001L, 99))).write.mode("append").parquet(dir)
      q.processAllAvailable(); q.processAllAvailable()
      val cut = spark.sql("select unix_micros(timestamp'2029-01-01')").head().getLong(0)
      val got = spark.table("scdl").filter(col("valid_from_us") < cut)
        .orderBy("version")
        .select("tier", "version").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got === Seq((0L, 1L), (3L, 2L), (0L, 3L)), got)
    } finally q.stop()
  }

  test("null tiers (missing/malformed props) fold instead of killing the query") {
    import spark.implicits._
    // the non-nullable tuple encoding died on the first null tier (r9
    // review); nulls must behave as one attribute value, like the batch
    // operator's null-safe <=> run comparison
    val ev = Seq(
      (7L, 1L, "2024-01-01 00:00:00", """{"k": 10}"""),
      (7L, 2L, "2024-01-02 00:00:00", "{}"),          // null tier
      (7L, 3L, "2024-01-03 00:00:00", "not json"),    // null tier (merges)
      (7L, 4L, "2024-01-04 00:00:00", """{"k": 80}""")
    ).toDF("user_id", "event_id", "ts_s", "props")
      .select(col("user_id"), col("event_id"),
        col("ts_s").cast("timestamp").as("ts"), col("props"))
    val versions = ScdStream.scd2(ev).collect().sortBy(_.version)
    assert(versions.map(_.tier).toSeq === Seq(Some(0L), None, Some(3L)),
      versions.mkString(","))
    assert(versions(1).valid_from_us < versions(2).valid_from_us)
  }
}
