package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.cents

/** Structured-Streaming event analytics (SURVEY.md §2-F).
  *
  * The transform is expressed once and applies to either a batch or a
  * streaming DataFrame (watermark is attached only on streams) — the
  * Spark-idiomatic way to keep batch backfill and the live pipeline on
  * one code path. At scale the stream shuffles only the windowed
  * partial aggregates (map-side combine per microbatch).
  */
object EventStream {

  /** Streaming exact dedup: drop duplicate event_ids within the
    * watermark window — the streaming twin of the batch hash-dedup
    * (state is bounded by the watermark horizon, not the stream
    * length; the training-data ingestion guard).
    */
  def dedupStream(events: DataFrame): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark("event_id")
    else events.dropDuplicates("event_id")

  /** Stream-stream interval join: each purchase joined to same-user
    * clicks in the preceding 30 minutes. Both sides carry watermarks
    * and the join condition bounds event time on both ends, so state
    * for each side is evictable — the canonical watermarked
    * stream-stream join shape (works identically on batch inputs).
    */
  def clickPurchaseJoin(events: DataFrame): DataFrame = {
    def side(t: String, pfx: String) = {
      val s = events.filter(col("event_type") === t)
        .select(col("user_id").as(s"${pfx}_user"),
          col("event_id").as(s"${pfx}_id"), col("ts").as(s"${pfx}_ts"))
      if (events.isStreaming) s.withWatermark(s"${pfx}_ts", "10 minutes") else s
    }
    side("click", "click").join(side("purchase", "purchase"),
      expr("""click_user = purchase_user AND
              purchase_ts > click_ts AND
              purchase_ts <= click_ts + interval 30 minutes"""))
      .select(col("click_user").as("user_id"), col("click_id"), col("purchase_id"),
        col("click_ts"), col("purchase_ts"))
  }

  /** Streaming anomaly flagging: per-event-type reference stats (mean,
    * std — trained batch-side, e.g. by Relational.anomaly's moment
    * pass) broadcast into the stream; events beyond `zMax` standard
    * deviations are flagged. Stateless map-side work — no watermark, no
    * state store, scales to any event rate; the same expression runs on
    * a batch DataFrame for backfill (spec asserts batch≡stream).
    */
  def anomalyStream(events: DataFrame, stats: DataFrame,
      zMax: Double = 3.0): DataFrame =
    events.join(broadcast(stats), "event_type")
      // std = 0 (a constant-valued training type) must flag NOTHING: the
      // unguarded division gave NaN/Infinity, and Spark's NaN-is-greatest
      // ordering then flagged EVERY event of that type (r9 review); a
      // null z falls out of the >= filter
      .withColumn("z",
        when(col("std") > 0, (col("value") - col("mean")) / col("std")))
      .filter(abs(col("z")) >= zMax)
      .select(col("event_id"), col("event_type"), col("value"), col("z"))

  /** Tumbling (or sliding, if `slide` is set) window aggregation with a
    * 10-minute watermark for late data.
    */
  def windowedAgg(events: DataFrame, win: String = "1 hour",
      slide: Option[String] = None): DataFrame = {
    val e = if (events.isStreaming) events.withWatermark("ts", "10 minutes") else events
    val w = slide.map(s => window(col("ts"), win, s)).getOrElse(window(col("ts"), win))
    e.groupBy(w.as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(cents(col("value"), 1e2)).as("sum_value_cents"))
      .select(col("w.start").as("w_start"), col("w.end").as("w_end"),
        col("event_type"), col("n"), col("sum_value_cents"))
  }
}
