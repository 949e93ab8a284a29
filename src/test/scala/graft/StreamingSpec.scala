package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.streaming.{EventStream, SessionStream}
import java.nio.file.Files

/** Streaming specs drive the file source through real microbatches and
  * compare against the batch twin of each transform on the same data.
  */
class StreamingSpec extends AnyFunSuite {
  import SparkSuite._

  private def eventsBatch: DataFrame =
    Tables.events(spark, Sf).select("event_id", "ts", "user_id", "event_type", "value")

  private def tmp(): String =
    Files.createTempDirectory("graft-stream").toString

  test("windowed agg on a stream matches the batch result") {
    val dir = tmp()
    eventsBatch.repartition(4).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(eventsBatch.schema).parquet(dir)
    val q = EventStream.windowedAgg(stream)
      .writeStream.outputMode("complete").format("memory").queryName("winagg").start()
    try {
      q.processAllAvailable()
      val got = spark.table("winagg")
        .orderBy("w_start", "event_type").collect().toSeq
      val want = EventStream.windowedAgg(eventsBatch)
        .orderBy("w_start", "event_type").collect().toSeq
      assert(got === want)
    } finally q.stop()
  }

  test("streaming anomaly flags match the batch filter on the same data") {
    val dir = tmp()
    eventsBatch.repartition(4).write.mode("overwrite").parquet(dir)
    val stats = eventsBatch.groupBy("event_type")
      .agg(avg("value").as("mean"), stddev_pop(col("value")).as("std"))
    val stream = spark.readStream.schema(eventsBatch.schema).parquet(dir)
    val q = EventStream.anomalyStream(stream, stats, zMax = 2.0)
      .writeStream.outputMode("append").format("memory").queryName("anom").start()
    try {
      q.processAllAvailable()
      val got = spark.table("anom").orderBy("event_id").collect().toSeq
      val want = EventStream.anomalyStream(eventsBatch, stats, zMax = 2.0)
        .orderBy("event_id").collect().toSeq
      assert(got.nonEmpty && got === want)
    } finally q.stop()
  }

  test("a zero-variance training type flags nothing (no NaN flood)") {
    import spark.implicits._
    // std = 0: unguarded division gave NaN/Infinity, and NaN-is-greatest
    // ordering flagged EVERY event of the type (r9 review)
    val stats = Seq(("heartbeat", 1.0, 0.0), ("click", 5.0, 2.0))
      .toDF("event_type", "mean", "std")
    val ev = Seq((1L, "heartbeat", 1.0), (2L, "heartbeat", 99.0), (3L, "click", 50.0))
      .toDF("event_id", "event_type", "value")
    val got = graft.streaming.EventStream.anomalyStream(ev, stats, zMax = 3.0)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(got === Set(3L), s"only the real outlier may flag, got $got")
  }

  test("stateful streaming sessionization matches batch sessionize") {
    val dir = tmp()
    eventsBatch.repartition(4).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(eventsBatch.schema).parquet(dir)
    val q = SessionStream.sessionize(stream)
      .writeStream.outputMode("append").format("memory").queryName("sess").start()
    try {
      q.processAllAvailable()
      // push the watermark far past every open session so event-time
      // timeouts fire (sentinel events, then an extra batch to process
      // the timeout-only microbatch)
      val sentinel = eventsBatch.groupBy("user_id")
        .agg(max("event_id").as("event_id"))
        .select(col("event_id") + 1000000, expr("timestamp'2030-01-01'").as("ts"),
          col("user_id"), lit("sentinel").as("event_type"), lit(0.0).as("value"))
      sentinel.write.mode("append").parquet(dir)
      q.processAllAvailable()
      q.processAllAvailable()
      val got = spark.table("sess")
        .filter(col("start_us") < expr("unix_micros(timestamp'2029-01-01')"))
        .select("user_id", "start_us", "end_us", "n_events")
        .orderBy("user_id", "start_us").collect().toSeq
      val want = graft.operators.EventOps.sessionize(spark, Sf)
        .select(col("user_id"), col("start_us"), col("end_us"), col("n_events"))
        .orderBy("user_id", "start_us").collect().toSeq
      assert(got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        === want.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))))
    } finally q.stop()
  }

  test("stream-stream interval join matches the batch twin") {
    val dir = tmp()
    eventsBatch.repartition(4).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(eventsBatch.schema).parquet(dir)
    val q = EventStream.clickPurchaseJoin(stream)
      .writeStream.outputMode("append").format("memory").queryName("ssj").start()
    try {
      q.processAllAvailable()
      def key(df: org.apache.spark.sql.DataFrame) =
        df.select("click_id", "purchase_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = key(spark.table("ssj"))
      val want = key(EventStream.clickPurchaseJoin(eventsBatch))
      assert(got === want)
      assert(want.nonEmpty)
    } finally q.stop()
  }

  test("sliding windows emit one row per covering window") {
    val agg = EventStream.windowedAgg(eventsBatch, win = "1 hour", slide = Some("30 minutes"))
    val n1h = EventStream.windowedAgg(eventsBatch).agg(sum("n")).head().getLong(0)
    // each event falls in exactly 2 sliding windows
    assert(agg.agg(sum("n")).head().getLong(0) === 2 * n1h)
  }

  test("streaming dedup drops duplicate event_ids within the watermark") {
    val dir = tmp()
    // write the events twice -> every event_id duplicated
    eventsBatch.write.mode("overwrite").parquet(dir)
    eventsBatch.write.mode("append").parquet(dir)
    val stream = spark.readStream.schema(eventsBatch.schema).parquet(dir)
    val q = EventStream.dedupStream(stream)
      .writeStream.outputMode("append").format("memory").queryName("dedup").start()
    try {
      q.processAllAvailable()
      assert(spark.table("dedup").count() === eventsBatch.count())
    } finally q.stop()
  }

  test("late in-watermark events merge backward into the open session") {
    import spark.implicits._
    val dir = tmp()
    def write(rows: Seq[(Long, String)]): Unit =
      rows.toDF("user_id", "s").select(col("user_id"), col("s").cast("timestamp").as("ts"))
        .coalesce(1).write.mode("append").parquet(dir)
    write(Seq((9001L, "2024-06-01 10:04:00"), (9002L, "2024-06-01 10:06:00")))
    val stream = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType))))
      .parquet(dir)
    val q = SessionStream.sessionize(stream)
      .writeStream.outputMode("append").format("memory").queryName("late").start()
    try {
      q.processAllAvailable()
      // late event 4 min BEFORE user 9001's open session start, but well
      // inside the 10-min watermark (wm = 10:06 - 10min = 09:56)
      write(Seq((9001L, "2024-06-01 10:00:00")))
      q.processAllAvailable()
      write(Seq((9001L, "2030-01-01 00:00:00"), (9002L, "2030-01-01 00:00:00")))
      q.processAllAvailable(); q.processAllAvailable()
      val real = spark.table("late")
        .filter(col("start_us") < expr("unix_micros(timestamp'2029-01-01')"))
        .orderBy("user_id").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"))).toSeq
      // the late 10:00 event must extend 9001's session backwards (n=2),
      // not be dropped or split
      assert(real === Seq((9001L, 2L), (9002L, 1L)), real)
      val s9001 = spark.table("late").filter(col("user_id") === 9001
        && col("start_us") < expr("unix_micros(timestamp'2029-01-01')")).head()
      assert(s9001.getAs[Long]("start_us") ===
        spark.sql("select unix_micros(timestamp'2024-06-01 10:00:00')").head().getLong(0))
    } finally q.stop()
  }

  test("streaming top-k serving converges to the batch knn ranking") {
    import graft.streaming.TopKStream
    val dir = tmp()
    val emb = Tables.embeddings(spark, Sf).select("vec_id", "embedding")
    // feed the corpus in 3 chunks -> 3 microbatches of state updates
    emb.filter(col("vec_id") % 3 === 0).write.mode("append").parquet(dir)
    val queries = Tables.embeddings(spark, Sf).filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val stream = spark.readStream.schema(emb.schema).parquet(dir)
    val q = TopKStream.topKPerQuery(TopKStream.scoredStream(stream, queries), k = 5)
      .writeStream.outputMode("update").format("memory").queryName("topk").start()
    try {
      q.processAllAvailable()
      emb.filter(col("vec_id") % 3 === 1).write.mode("append").parquet(dir)
      q.processAllAvailable()
      emb.filter(col("vec_id") % 3 === 2).write.mode("append").parquet(dir)
      q.processAllAvailable()
      val latest = spark.table("topk")
        .withColumn("mx", max("epoch").over(
          org.apache.spark.sql.expressions.Window.partitionBy("query_id")))
        .filter(col("epoch") === col("mx"))
      val got = latest.select("query_id", "vec_id", "rnk").orderBy("query_id", "rnk")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val want = graft.operators.KnnSearch.knnJoin(spark, Sf, k = 5)
        .select("query_id", "vec_id", "rnk").orderBy("query_id", "rnk")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got === want)
    } finally q.stop()
  }

  test("streaming top-k dedups replayed vector ids across microbatches") {
    import graft.streaming.TopKStream
    val dir = tmp()
    val emb = Tables.embeddings(spark, Sf).select("vec_id", "embedding")
    emb.filter(col("vec_id") % 3 === 0).write.mode("append").parquet(dir)
    val queries = Tables.embeddings(spark, Sf).filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val stream = spark.readStream.schema(emb.schema).parquet(dir)
    val q = TopKStream.topKPerQuery(TopKStream.scoredStream(stream, queries), k = 5)
      .writeStream.outputMode("update").format("memory").queryName("topkdup").start()
    try {
      q.processAllAvailable()
      // second microbatch REPLAYS every %3==0 vector (at-least-once
      // delivery) alongside the rest of the corpus — replayed ids must
      // not occupy two top-k slots
      emb.write.mode("append").parquet(dir)
      q.processAllAvailable()
      val latest = spark.table("topkdup")
        .withColumn("mx", max("epoch").over(
          org.apache.spark.sql.expressions.Window.partitionBy("query_id")))
        .filter(col("epoch") === col("mx"))
      val got = latest.select("query_id", "vec_id", "rnk").orderBy("query_id", "rnk")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val want = graft.operators.KnnSearch.knnJoin(spark, Sf, k = 5)
        .select("query_id", "vec_id", "rnk").orderBy("query_id", "rnk")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got === want)
    } finally q.stop()
  }

  test("gap-broken session is retained until the watermark passes end+gap") {
    import spark.implicits._
    val dir = tmp()
    def write(rows: Seq[(Long, String)]): Unit =
      rows.toDF("user_id", "s").select(col("user_id"), col("s").cast("timestamp").as("ts"))
        .coalesce(1).write.mode("append").parquet(dir)
    // 10:00 then 10:31 -> 31-min gap breaks the session, but with a
    // 10-min watermark delay (wm = 10:21 after batch 2) the first
    // session is still mergeable: a late 10:25 event bridges BOTH into
    // one session. Eager emission would have already emitted the split
    // [10:00,10:00] that append mode cannot retract.
    write(Seq((7001L, "2024-06-01 10:00:00")))
    val stream = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType))))
      .parquet(dir)
    val q = SessionStream.sessionize(stream)
      .writeStream.outputMode("append").format("memory").queryName("gapheld").start()
    try {
      q.processAllAvailable()
      write(Seq((7001L, "2024-06-01 10:31:00")))
      q.processAllAvailable()
      write(Seq((7001L, "2024-06-01 10:25:00")))
      q.processAllAvailable()
      write(Seq((7001L, "2030-01-01 00:00:00")))
      q.processAllAvailable(); q.processAllAvailable()
      val real = spark.table("gapheld")
        .filter(col("start_us") < expr("unix_micros(timestamp'2029-01-01')"))
        .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"))).toSeq
      // exactly ONE session with all 3 events — the batch-twin answer
      assert(real === Seq((7001L, 3L)), real)
    } finally q.stop()
  }

  test("streaming misra-gries sketch keeps the guaranteed heavy hitters") {
    val k = 64
    val dir = tmp()
    val toks = Tables.documents(spark, Sf)
      .select(col("lang"), explode(graft.functions.TextFunctions.tokens(col("text"))).as("token"))
    toks.repartition(4).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(toks.schema).parquet(dir)
    val q = graft.streaming.SketchStream.heavyHitters(stream, k = k)
      .writeStream.outputMode("update").format("memory").queryName("mgsketch").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("mgsketch")
        .select("lang", "token", "est_count", "epoch")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      val lastEpoch = rows.groupBy(_._1).map { case (l, rs) => l -> rs.map(_._4).max }
      val finalRows = rows
        .filter(r => lastEpoch(r._1) == r._4)
        .map(r => (r._1, r._2) -> r._3).toMap
      val exact = toks.groupBy("lang", "token").agg(count(lit(1)).as("cnt"))
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val totals = exact.groupBy(_._1._1).map { case (l, m) => l -> m.values.sum }
      // the dominant token per lang is guaranteed to survive streaming
      totals.foreach { case (lang, n) =>
        val top = exact.filter(_._1._1 == lang).maxBy(m => (m._2, m._1._2))
        assert(top._2 > n / (k + 1), s"premise: $lang top token is heavy")
        assert(finalRows.contains((lang, top._1._2)), s"$lang top token missing from stream sketch")
      }
      // estimates obey the MG band on the streamed path too
      finalRows.foreach { case ((lang, tok), est) =>
        val truth = exact((lang, tok))
        assert(est <= truth && truth - est <= totals(lang) / (k + 1), s"$lang/$tok out of band")
      }
    } finally q.stop()
  }

  test("batch-mode sessionize (final flush) matches batch EventOps") {
    val got = SessionStream.sessionize(eventsBatch)
      .orderBy("user_id", "start_us")
      .collect().map(s => (s.user_id, s.start_us, s.end_us, s.n_events)).toSeq
    val want = graft.operators.EventOps.sessionize(spark, Sf)
      .orderBy("user_id", "start_us")
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("start_us"),
        r.getAs[Long]("end_us"), r.getAs[Long]("n_events"))).toSeq
    assert(got === want)
  }
}
