package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import graft.Tables
import graft.functions.VectorFunctions.r6

/** Event-stream batch analytics (SURVEY.md §2-E): sessionization,
  * funnel, JSON payload extraction. All timestamps are handled as epoch
  * microseconds (longs) so Spark/DuckDB comparisons are integer-exact.
  */
object EventOps {

  private def base(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        col("props"), unix_micros(col("ts")).as("us"))

  /** 30-minute-gap sessionization via lag + cumulative sum.
    * Scale: exactly one shuffle (on user_id); both window passes and the
    * final aggregation reuse that partitioning. This is the minimal data
    * movement the semantics allow.
    */
  def sessionize(spark: SparkSession, dir: String, gapMicros: Long = 30L * 60 * 1000000): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    base(spark, dir)
      .withColumn("prev", lag(col("us"), 1).over(w))
      .withColumn("is_new",
        when(col("prev").isNull || col("us") - col("prev") > gapMicros, 1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("is_new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("us")).as("start_us"),
        max(col("us")).as("end_us"))
      .withColumn("duration_s", r6((col("end_us") - col("start_us")) / lit(1000000.0)))
  }

  /** Session path mining: the most common event-type sequences
    * (clickstream paths) across 30-minute-gap sessions. Scale: one
    * shuffle on user_id shared by the session windows and the path
    * assembly (collect_list under the same partitioning); only the
    * (path, partial-count) rows move in the final frequency shuffle.
    */
  def eventPaths(spark: SparkSession, dir: String, topK: Int = 15,
      gapMicros: Long = 30L * 60 * 1000000): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val sess = base(spark, dir)
      .withColumn("prev", lag(col("us"), 1).over(w))
      .withColumn("is_new",
        when(col("prev").isNull || col("us") - col("prev") > gapMicros, 1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("is_new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    sess.groupBy(col("user_id"), col("session_id"))
      .agg(concat_ws(">",
        transform(
          array_sort(collect_list(struct(col("us"), col("event_id"), col("event_type")))),
          x => x.getField("event_type"))).as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path").asc)
      .limit(topK)
  }

  /** Banded range join: cross-user event pairs within 60 seconds,
    * counted by (earlier type, later type). A naive formulation is an
    * O(n²) time-interval cross join; banding each event into a
    * 60-second bucket and probing {own, previous} buckets turns it
    * into an equi-join with bounded fan-out (×2) — the standard
    * range-join blocking that survives any scale. Pairs are ordered by
    * (time, event_id), so each qualifying pair is generated exactly
    * once: same-bucket pairs via the own-bucket probe, cross-boundary
    * pairs via the previous-bucket probe.
    */
  def rangeJoinPairs(spark: SparkSession, dir: String,
      windowMicros: Long = 60L * 1000000): DataFrame = {
    // integer division for the band key — exact in both engines (double
    // division + cast would round differently)
    val ev = base(spark, dir).select(col("event_id"), col("user_id"),
      col("event_type"), col("us"), expr(s"us div $windowMicros").as("bk"))
    val first = ev.select(col("event_id").as("id_f"), col("user_id").as("user_f"),
      col("event_type").as("type_f"), col("us").as("us_f"), col("bk").as("probe"))
    val second = ev
      .select(col("event_id").as("id_s"), col("user_id").as("user_s"),
        col("event_type").as("type_s"), col("us").as("us_s"),
        explode(array(col("bk"), col("bk") - 1)).as("probe"))
    first.join(second, "probe")
      .filter((col("us_f") < col("us_s")
          || (col("us_f") === col("us_s") && col("id_f") < col("id_s")))
        && col("us_s") - col("us_f") <= windowMicros
        && col("user_f") =!= col("user_s"))
      .groupBy(col("type_f"), col("type_s"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** view → click → purchase funnel per user via conditional min-ts:
    * first view, first click after that view, first purchase after that
    * click. Scale: three partial-aggregations on user_id reusing one
    * shuffle partitioning; the per-user timestamp tables are tiny and
    * join-broadcastable.
    */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = base(spark, dir).select("user_id", "event_type", "us")
    val users = ev.select("user_id").distinct()
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("us").as("view_us"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("us") > col("view_us"))
      .groupBy("user_id").agg(min("us").as("click_us"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("us") > col("click_us"))
      .groupBy("user_id").agg(min("us").as("purchase_us"))
    users.join(v, Seq("user_id"), "left")
      .join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .select("user_id", "view_us", "click_us", "purchase_us")
  }

  /** As-of attribution: each purchase joined to the user's most recent
    * preceding click (the as-of-join pattern, expressed as an
    * ignore-nulls window over the merged stream — one shuffle on
    * user_id, no self-join). At 100 TB this beats a range self-join by
    * orders of magnitude: the "join" is a single sorted pass.
    */
  def attribution(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base(spark, dir)
      .withColumn("last_click_us",
        last(when(col("event_type") === "click", col("us")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("us").as("purchase_us"),
        col("last_click_us"),
        col("last_click_us").isNotNull.as("attributed"),
        r6((col("us") - col("last_click_us")) / lit(1000000.0)).as("lag_s"))
  }

  /** Cohort retention: users grouped by first-activity day, counted on
    * each subsequent day offset (0..7). All integer day arithmetic —
    * two shuffles (user cohort, then cohort×offset counts), both on
    * already-aggregated rows.
    */
  def retention(spark: SparkSession, dir: String, maxOffset: Int = 7): DataFrame = {
    val days = base(spark, dir)
      .select(col("user_id"), expr("us div 86400000000").as("day"))
      .distinct()
    val cohorts = days.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    days.join(cohorts, "user_id")
      .withColumn("k", col("day") - col("cohort_day"))
      .filter(col("k") <= maxOffset)
      .groupBy(col("cohort_day"), col("k"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  /** JSON property extraction + aggregation over the `props` payload.
    * Scale: extraction is per-row (codegen'd JsonPath), aggregation is
    * map-side partial.
    */
  def jsonAgg(spark: SparkSession, dir: String): DataFrame =
    base(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        max(col("k")).as("max_k"))
      .withColumn("avg_k", r6(col("sum_k") / (lit(1.0) * col("n"))))
      .select("event_type", "n", "sum_k", "max_k", "avg_k")

  /** A/B experiment readout: users are assigned a deterministic variant
    * (user_id mod 2 — the hash-bucket assignment every experimentation
    * platform uses), conversion is "user has a purchase event", and the
    * per-variant row reports users, converters, conversion rate and
    * purchase revenue.
    *
    * Scale: one shuffle on user_id for the per-user flags (partial-agg
    * combines map-side), then a 2-row aggregate. Revenue is integerized
    * per event before any sum (order-independent).
    */
  def abTest(spark: SparkSession, dir: String): DataFrame = {
    val perUser = base(spark, dir)
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("converted"),
        sum(when(col("event_type") === "purchase",
          graft.functions.VectorFunctions.cents(col("value"), 100.0))
          .otherwise(0L)).as("rev_cents"))
    perUser
      // pmod (always nonnegative) with the oracle written as
      // ((user_id % 2) + 2) % 2 — identical buckets for any ID sign,
      // not just the current nonnegative domain (ADVICE r4)
      .groupBy(pmod(col("user_id"), lit(2)).cast("long").as("variant"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("converted")).as("n_converted"),
        sum(col("rev_cents")).as("rev_cents"))
      .withColumn("conv_rate", r6(col("n_converted") / (lit(1.0) * col("n_users"))))
      .select("variant", "n_users", "n_converted", "conv_rate", "rev_cents")
  }

  /** Windowed funnel: view → first click within 7 days of the first
    * view → first purchase within 7 days of that click, reported as a
    * one-row conversion summary. The unbounded variant is [[funnel]];
    * real funnel analyses almost always bound each step.
    *
    * Scale: each stage is a shrinking user_id-keyed aggregate+join (the
    * same key every time, so the shuffle layout is reused); the final
    * summary is three broadcast-merged single-row aggregates.
    */
  def windowedFunnel(spark: SparkSession, dir: String,
      stepMicros: Long = 7L * 86400 * 1000000): DataFrame = {
    val e = base(spark, dir)
    val v = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("us")).as("view_us"))
    val c = e.filter(col("event_type") === "click").join(v, "user_id")
      .filter(col("us") > col("view_us") && col("us") <= col("view_us") + stepMicros)
      .groupBy(col("user_id")).agg(min(col("us")).as("click_us"))
    val p = e.filter(col("event_type") === "purchase").join(c, "user_id")
      .filter(col("us") > col("click_us") && col("us") <= col("click_us") + stepMicros)
      .groupBy(col("user_id")).agg(min(col("us")).as("purchase_us"))
    v.agg(count(lit(1)).as("n_view"))
      .crossJoin(broadcast(c.agg(count(lit(1)).as("n_click"))))
      .crossJoin(broadcast(p.agg(count(lit(1)).as("n_purchase"))))
      .withColumn("click_rate", r6(col("n_click") / (lit(1.0) * col("n_view"))))
      .withColumn("purchase_rate", r6(col("n_purchase") / (lit(1.0) * col("n_view"))))
      .select("n_view", "n_click", "n_purchase", "click_rate", "purchase_rate")
  }

  /** Salted two-stage aggregation over the (skew-prone) event_type key,
    * in the graded query surface: results are identical to a plain
    * groupBy — the oracle IS the plain GROUP BY — while the first
    * shuffle spreads each hot key over 16 reducers (SkewOps.saltedAgg;
    * deterministic salt, retry-safe).
    */
  def skewAgg(spark: SparkSession, dir: String): DataFrame =
    SkewOps.saltedAgg(
      base(spark, dir).select(col("event_id"), col("event_type"),
        graft.functions.VectorFunctions.cents(col("value"), 100.0).as("v_cents")),
      col("event_type"), col("v_cents"), spreadCols = Seq(col("event_id")))
      .select(col("key").as("event_type"), col("n"), col("sum_cents"))

  /** RFM segmentation: per-user Recency (days since last activity),
    * Frequency (events) and Monetary (purchase revenue), each scored
    * into quintiles against corpus-wide percentile thresholds, reported
    * as the (r, f, m) segment grid with user counts and revenue.
    *
    * Scale: per-user stats are one partial-agg shuffle; the 12
    * thresholds are a single 1-row aggregate broadcast back; scoring is
    * map-side. No global sort, no ntile — the rank-free formulation is
    * what survives 10⁹ users. Threshold compares are integerized
    * (×1e6, floor+0.5) so a last-ulp percentile difference between
    * engines cannot flip a bucket: quintile fractions of integer
    * inputs are multiples of 0.2, landing mid-gap after the +0.5.
    */
  def rfmSegments(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions.cents
    val e = base(spark, dir)
    val perUser = e.groupBy(col("user_id"))
      .agg(max(col("us")).as("last_us"),
        count(lit(1)).as("freq"),
        sum(when(col("event_type") === "purchase", cents(col("value"), 100.0))
          .otherwise(0L)).as("mon_cents"))
    val u = perUser.crossJoin(broadcast(e.agg(max(col("us")).as("max_us"))))
      .withColumn("rec_days", expr("(max_us - last_us) div 86400000000"))
    val th = u.agg(
      expr("percentile(rec_days, array(0.2, 0.4, 0.6, 0.8))").as("rp"),
      expr("percentile(freq, array(0.2, 0.4, 0.6, 0.8))").as("fp"),
      expr("percentile(mon_cents, array(0.2, 0.4, 0.6, 0.8))").as("mp"))
    def above(v: org.apache.spark.sql.Column, thArr: String): org.apache.spark.sql.Column =
      (0 until 4).map(i =>
        (v * 1000000L > cents(element_at(col(thArr), i + 1), 1e6)).cast("long"))
        .reduce(_ + _)
    u.crossJoin(broadcast(th))
      .withColumn("r_score", lit(5L) - above(col("rec_days"), "rp"))
      .withColumn("f_score", lit(1L) + above(col("freq"), "fp"))
      .withColumn("m_score", lit(1L) + above(col("mon_cents"), "mp"))
      .groupBy(col("r_score"), col("f_score"), col("m_score"))
      .agg(count(lit(1)).as("n_users"), sum(col("mon_cents")).as("mon_cents"))
  }

  /** CUSUM changepoint detection on the daily value series: the days
    * where the cumulative deviation from the global mean is most
    * extreme (level-shift candidates). Integer-exact: instead of
    * cum − d·mean (a rational), both sides are scaled by the day count
    * — S_d = D·prefix_d − d·total — so every compare is on longs.
    *
    * Scale: the corpus collapses to one row per DAY in a partial-agg
    * shuffle first; the global window then runs over that bounded
    * series (10⁴ rows for 30 years), never over events.
    */
  def changepoint(spark: SparkSession, dir: String, topK: Int = 3): DataFrame = {
    import graft.functions.VectorFunctions.cents
    val daily = base(spark, dir)
      .groupBy(expr("us div 86400000000").as("day"))
      .agg(sum(cents(col("value"), 100.0)).as("rev_cents"))
    val w = graft.functions.VectorFunctions.boundedWindow(col("day"))
    val tot = daily.agg(sum(col("rev_cents")).as("total"), count(lit(1)).as("nd"))
    daily
      .withColumn("cum", sum(col("rev_cents"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("idx", row_number().over(w).cast("long"))
      .crossJoin(broadcast(tot))
      .withColumn("s", col("nd") * col("cum") - col("idx") * col("total"))
      .withColumn("abs_s", abs(col("s")))
      .orderBy(col("abs_s").desc, col("day").asc)
      .limit(topK)
      .select("day", "rev_cents", "s", "abs_s")
  }

  /** DAU/MAU stickiness per day: daily active users over trailing-30-day
    * active users. The trailing distinct is computed WITHOUT a windowed
    * COUNT DISTINCT (which would re-sort events per day): each distinct
    * (user, active-day) row fans out to the ≤30 future days it keeps
    * the user "monthly-active" for — a bounded ×30 explode of the
    * already-deduplicated user-day table, then plain partial-agg
    * distinct counts. Only days with activity are reported.
    */
  def dauMau(spark: SparkSession, dir: String, windowDays: Int = 30): DataFrame = {
    val ud = base(spark, dir)
      .select(col("user_id"), expr("us div 86400000000").as("day"))
      .distinct()
    val mau = ud
      .select(col("user_id"),
        explode(sequence(col("day"), col("day") + (windowDays - 1))).as("cday"))
      .groupBy(col("cday"))
      .agg(countDistinct(col("user_id")).as("mau"))
    ud.groupBy(col("day"))
      // ud is already distinct on (user_id, day): a plain count equals
      // the distinct count without the two-phase distinct agg (r8)
      .agg(count(lit(1)).as("dau"))
      .join(mau, col("day") === col("cday"))
      .select(col("day"), col("dau"), col("mau"),
        r6(col("dau") / (lit(1.0) * col("mau"))).as("stickiness"))
  }

  /** Moving-average forecast backtest: each day's revenue predicted by
    * the trailing-7-day mean, with the absolute error — the baseline
    * every forecasting pipeline measures against. All-integer: the
    * forecast is (sum_prev·1e6) div n_prev and the error compares at
    * the same ×1e6-cents scale, so no rational mean ever materializes.
    * Only days with a full 7-day history are scored.
    *
    * Scale: one partial-agg shuffle to the bounded daily series, then
    * one window pass over it (same shape as [[changepoint]]).
    */
  def forecastSma(spark: SparkSession, dir: String, window: Int = 7): DataFrame = {
    import graft.functions.VectorFunctions.cents
    val daily = base(spark, dir)
      .groupBy(expr("us div 86400000000").as("day"))
      .agg(sum(cents(col("value"), 100.0)).as("rev_cents"))
    val w = graft.functions.VectorFunctions.boundedWindow(col("day")).rowsBetween(-window, -1)
    daily
      .withColumn("sum_prev", sum(col("rev_cents")).over(w))
      .withColumn("n_prev", count(lit(1)).over(w))
      .filter(col("n_prev") === window)
      .withColumn("forecast_e6", expr(s"(sum_prev * 1000000) div n_prev"))
      .withColumn("err_e6", abs(col("rev_cents") * 1000000L - col("forecast_e6")))
      .select("day", "rev_cents", "forecast_e6", "err_e6")
  }

  /** Holt linear-trend exponential smoothing backtest (α=1/2, β=1/4):
    * one-step-ahead forecasts ŷ_t = l_{t−1} + b_{t−1} over the daily
    * revenue series with level/trend recursion — the trend-aware
    * upgrade of [[forecastSma]], and the pattern SMA windows cannot
    * express (each state depends on ALL history, not a fixed frame).
    *
    * Scale shape: the corpus collapses to the bounded daily series in
    * one partial-agg shuffle; the recursion then runs as a sequential
    * fold over that bounded array (same boundedness argument as every
    * daily-series query here — a recursive scan is inherently serial,
    * so the right distributed form is "reduce to the small series,
    * then fold"). α and β are exact binary fractions, so the double
    * recursion is the same bit pattern in any IEEE engine — the DuckDB
    * oracle replays it with a recursive CTE and hash-matches.
    */
  def forecastHolt(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions.cents
    val daily = base(spark, dir)
      .groupBy(expr("us div 86400000000").as("day"))
      .agg(sum(cents(col("value"), 100.0)).as("rev_cents"))
    val rowT = ArrayType(StructType(Seq(
      StructField("day", LongType), StructField("actual", DoubleType),
      StructField("forecast", DoubleType), StructField("abs_err", DoubleType))))
    val folded = daily
      .agg(array_sort(collect_list(struct(col("day"), col("rev_cents")))).as("s"))
      .select(aggregate(col("s"),
        struct(lit(0.0).as("l"), lit(0.0).as("b"), lit(false).as("started"),
          array().cast(rowT).as("out")),
        (acc, x) => {
          val y = x.getField("rev_cents") / lit(100.0)
          val f = acc.getField("l") + acc.getField("b")
          val newL = lit(0.5) * y + lit(0.5) * f
          val newB = lit(0.25) * (newL - acc.getField("l")) +
            lit(0.75) * acc.getField("b")
          val row = struct(x.getField("day").as("day"), y.as("actual"),
            f.as("forecast"), abs(y - f).as("abs_err"))
          struct(
            when(acc.getField("started"), newL).otherwise(y).as("l"),
            when(acc.getField("started"), newB).otherwise(lit(0.0)).as("b"),
            lit(true).as("started"),
            when(acc.getField("started"),
              array_append(acc.getField("out"), row))
              .otherwise(acc.getField("out")).as("out"))
        },
        acc => acc.getField("out")).as("rows"))
      .select(explode(col("rows")).as("r"))
    folded.select(col("r.day").as("day"),
      r6(col("r.actual")).as("actual"),
      r6(col("r.forecast")).as("forecast"),
      r6(col("r.abs_err")).as("abs_err"))
  }

  /** Gaps-and-islands: per-user activity streaks. The classic
    * `day − row_number()` grouping converts consecutive active days
    * into a constant group key, so streaks fall out of two plain
    * aggregations — no self-join, no recursive CTE. Reports streak
    * count, longest streak and total active days per user.
    *
    * Scale: one shuffle on user_id (the window key); both follow-up
    * aggregations reuse that partitioning map-side.
    */
  def activityStreaks(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val ud = base(spark, dir)
      .select(col("user_id"), expr("us div 86400000000").as("day"))
      .distinct()
    ud.withColumn("grp", col("day") - row_number().over(w))
      .groupBy(col("user_id"), col("grp"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_streaks"),
        max(col("len")).as("longest_streak"),
        sum(col("len")).as("active_days"))
  }

  /** First-order Markov transition matrix over the event stream: counts
    * and probabilities of consecutive (from_type → to_type) transitions
    * per user (the next-event model behind session prediction).
    *
    * Scale: the same single user_id shuffle sessionize pays (lead under
    * the user window); transition counting is a partial-agg shuffle of
    * (from, to, partial-count) rows only; the probability normalization
    * runs on the aggregated k² rows.
    */
  def markovTransitions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    base(spark, dir)
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p", r6(col("n") /
        (lit(1.0) * sum(col("n")).over(Window.partitionBy(col("from_type"))))))
      .select("from_type", "to_type", "n", "p")
  }

  /** As-of join — the time-series operator Spark has no built-in for:
    * each purchase is joined to the MOST RECENT click at-or-before its
    * timestamp by the same user (the "price as of the trade" shape;
    * DuckDB mirrors it natively with `ASOF LEFT JOIN`).
    *
    * Implementation is the union + ordered carry-forward trick, NOT a
    * range join: tag clicks side=0 and purchases side=1, sort each
    * user's merged stream by (us, side, value), and carry the last
    * click's (us, value) forward with `last(..., ignoreNulls)`. Ties:
    * side puts an equal-timestamp click BEFORE the purchase (ASOF's
    * `>=` bound), and value-ascending makes the max-value click win
    * among clicks sharing (user, us) — the oracle pre-collapses those
    * with max(value), same result, no pre-aggregation shuffle here.
    *
    * Scale: exactly ONE shuffle (on user_id) regardless of time span or
    * click density — a banded range join would pay candidate fan-out
    * and a second dedup pass; this shape moves each event once and
    * never materializes a candidate pair.
    */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = base(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("us"), lit(0).as("side"),
        lit(null).cast("long").as("event_id"),
        lit(null).cast("double").as("pv"), col("value").as("cv"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("us"), lit(1).as("side"),
        col("event_id"), col("value").as("pv"),
        lit(null).cast("double").as("cv"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("side"), col("cv"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.unionByName(purchases)
      .withColumn("click_us",
        last(when(col("side") === 0, col("us")), ignoreNulls = true).over(w))
      .withColumn("click_val", last(col("cv"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("event_id"), col("user_id"), col("us"),
        r6(col("pv")).as("purchase_val"), col("click_us"),
        r6(col("click_val")).as("click_val"),
        (col("us") - col("click_us")).as("gap_us"))
  }

  /** Slowly-changing-dimension type-2 build: per user, collapse the
    * event stream into validity intervals of a derived attribute
    * (tier = props.k div 25), the warehouse primitive for "what was
    * this entity's state at time t". A change point opens a version
    * (valid_from = its event time) and the next change closes it
    * (valid_to = next valid_from; null while current); versions number
    * 1..n per user in time order.
    *
    * Scale: ONE user_id shuffle — the change-detection lag window and
    * the close/version window both partition by user_id over the same
    * sort, and the change filter shrinks rows between them, so Spark
    * reuses a single Exchange for the whole build.
    */
  def scd2(spark: SparkSession, dir: String): DataFrame = {
    val e = base(spark, dir)
      .select(col("user_id"), col("event_id"), col("us"),
        expr("cast(get_json_object(props, '$.k') as int) div 25").as("tier"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val starts = e
      .withColumn("chg", !(lag(col("tier"), 1).over(w) <=> col("tier")))
      .filter(col("chg"))
      .select(col("user_id"), col("tier"), col("us").as("valid_from_us"))
    val w2 = Window.partitionBy(col("user_id")).orderBy(col("valid_from_us"))
    starts
      .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(w2))
      .withColumn("version", row_number().over(w2).cast("long"))
      .select("user_id", "tier", "valid_from_us", "valid_to_us", "version")
  }

  /** Regular-grid gap-fill: the hourly event series per type with every
    * missing (type, hour) cell materialized as an explicit zero — the
    * resample step every downstream forecaster/anomaly model needs
    * (a model fed only observed rows silently treats "no data" as
    * "skip", not "zero").
    *
    * Scale: the corpus pays one partial-agg shuffle down to the bounded
    * (type × hour) series; the grid is `sequence()` over the global
    * [min, max] hour crossed with the distinct types — both tiny
    * aggregates — so the outer join runs on bounded inputs no matter
    * the event volume.
    */
  def gapFill(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions.cents
    val e = base(spark, dir)
      .select(col("event_type"), expr("us div 3600000000").as("hb"), col("value"))
    val hourly = e.groupBy(col("event_type"), col("hb"))
      .agg(count(lit(1)).as("cnt"), sum(cents(col("value"), 100.0)).as("vc"))
    val bounds = e.agg(min(col("hb")).as("lo"), max(col("hb")).as("hi"))
    val grid = e.select(col("event_type")).distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"), explode(sequence(col("lo"), col("hi"))).as("hb"))
    grid.join(hourly, Seq("event_type", "hb"), "left")
      .select(col("event_type"), col("hb"),
        coalesce(col("cnt"), lit(0L)).as("n"),
        r6(coalesce(col("vc"), lit(0L)) / lit(100.0)).as("val_sum"))
  }

  /** Hourly concurrent-session load: how many 30-minute-gap sessions
    * overlap each hour bucket, and how many start there — the capacity-
    * planning view of the session table.
    *
    * Scale: one user_id shuffle for sessionization (shared with
    * [[sessionize]]'s windows), then each session fans out ONLY to the
    * hour buckets it spans (bounded: a session is gap-bounded, so its
    * hour span is its duration, not the corpus size) and the count
    * groups on the bounded hour grid. The textbook sweep-line
    * (+1/−1 boundary events, running sum) needs a GLOBAL ordering —
    * a single-partition window at 100 TB; this bucketed form is
    * embarrassingly parallel and gives the same per-hour answer.
    */
  def concurrency(spark: SparkSession, dir: String): DataFrame = {
    sessionize(spark, dir)
      .select(
        expr("start_us div 3600000000").as("h0"),
        expr("end_us div 3600000000").as("h1"))
      .select(col("h0"), explode(sequence(col("h0"), col("h1"))).as("hour_id"))
      .groupBy(col("hour_id"))
      .agg(count(lit(1)).as("active_sessions"),
        sum(when(col("h0") === col("hour_id"), 1L).otherwise(0L)).as("started_sessions"))
  }

  /** Exponentially time-decayed user value (half-life 30 days,
    * anchored at the corpus's last event): the standard recency-
    * weighted LTV signal — a purchase today counts 1×, one 30 days ago
    * 0.5×, one 90 days ago 0.125×.
    *
    * Scale: the anchor is a 1-row aggregate broadcast into the scan,
    * the decayed contribution is per-row math integerized to 1e-6
    * BEFORE the sum (order-independent bigint sum — float summation
    * order must never decide a hash-matched result), and the per-user
    * rollup is ONE partial-agg shuffle. At 100 TB the anchor would be
    * a catalog watermark instead of a max() pass; nothing else changes.
    */
  def decayLtv(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions.cents
    val e = base(spark, dir).filter(col("event_type") === "purchase")
    val anchor = e.agg(max(col("us")).as("ref_us"))
    e.crossJoin(broadcast(anchor))
      .withColumn("decay",
        pow(lit(0.5), ((col("ref_us") - col("us")) / lit(86400000000.0)) / lit(30.0)))
      .withColumn("c_e6", cents(col("value") * col("decay"), 1e6))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(cents(col("value"), 100.0)).as("raw_c"),
        sum(col("c_e6")).as("dec_e6"))
      .select(col("user_id"), col("n_purchases"),
        r6(col("raw_c") / lit(100.0)).as("raw_value"),
        r6(col("dec_e6") / lit(1e6)).as("decayed_value"))
  }

  /** Revenue-concentration audit: the exact Gini coefficient of
    * per-user purchase value plus Lorenz top-decile/top-percentile
    * shares — the "how skewed is our revenue" one-row answer (and, on
    * a corpus table, the standard "how concentrated is our training
    * data per source" audit).
    *
    * Gini needs every user's global rank by value — the textbook
    * row_number() over an unpartitioned ORDER BY is a single-partition
    * window, a scale-killer at 10⁹ users. Here the rank is computed
    * DISTRIBUTED: users are range-bucketed by value (bucket = integer
    * t·B/(max+1), monotone in t, so bucket boundaries never split a
    * tie), per-bucket counts give each bucket's global rank offset (a
    * bounded ≤B-row running sum), and row_number runs partitioned BY
    * bucket. offset + within-bucket rank reproduces the global
    * (value, user_id) rank exactly. Everything else is 1-row
    * broadcasts and one partial-agg shuffle on user_id.
    *
    * Σ rank·value is accumulated as per-row integerized contributions
    * (rank/n)·(value/total) — order-independent bigint sums, no float
    * summation-order hazard; the bigint Σ r·x form would overflow past
    * ~10⁹ users · large totals.
    */
  /** Per-user purchase totals with their exact global ascending
    * (value, user_id) rank computed DISTRIBUTED (the range-bucket +
    * offset + partitioned row_number scheme [[gini]] documents):
    * columns (user_id, t cents, bkt, rank, mx, n, s). Shared by the
    * Gini/Lorenz concentration family.
    */
  /** Per-user purchase totals in value-cents — the substrate gini and
    * lorenz rank (and what streaming/InequalityStream maintains
    * incrementally; its readout shares [[giniFromTotals]] /
    * [[lorenzFromTotals]] so stream ≡ batch is exact by construction).
    */
  private[graft] def purchaseTotals(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions.cents
    base(spark, dir).filter(col("event_type") === "purchase")
      .groupBy(col("user_id")).agg(sum(cents(col("value"), 100.0)).as("t"))
  }

  private def rankedFromTotals(t: DataFrame, buckets: Int): DataFrame = {
    // two 1-row aggregates ride one pass over the (user-sized) totals
    val stats = t.agg(max(col("t")).as("mx"), count(lit(1)).as("n"),
      sum(col("t")).as("s"))
    val bucketed = t.crossJoin(broadcast(stats))
      .withColumn("bkt", expr(s"(t * $buckets) div (mx + 1)"))
    val offsets = bucketed.groupBy(col("bkt")).agg(count(lit(1)).as("nb"))
      .withColumn("off",
        coalesce(sum(col("nb")).over(graft.functions.VectorFunctions
          .boundedWindow(col("bkt")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("bkt"), col("off"))
    bucketed
      .withColumn("r_in", row_number().over(
        Window.partitionBy(col("bkt")).orderBy(col("t").asc, col("user_id").asc)))
      .join(broadcast(offsets), "bkt")
      .withColumn("rank", col("off") + col("r_in"))
  }

  def gini(spark: SparkSession, dir: String, buckets: Int = 1000): DataFrame =
    giniFromTotals(purchaseTotals(spark, dir), buckets)

  private[graft] def giniFromTotals(t: DataFrame, buckets: Int = 1000): DataFrame = {
    import graft.functions.VectorFunctions.cents
    rankedFromTotals(t, buckets)
      .withColumn("term_e9",
        cents((col("rank") / (lit(1.0) * col("n"))) * (col("t") / (lit(1.0) * col("s"))), 1e9))
      .withColumn("top10", col("rank") > col("n") - expr("n div 10"))
      .withColumn("top1", col("rank") > col("n") - expr("n div 100"))
      .groupBy(col("n"), col("s"))
      .agg(sum(col("term_e9")).as("st9"),
        sum(when(col("top10"), col("t")).otherwise(0L)).as("t10"),
        sum(when(col("top1"), col("t")).otherwise(0L)).as("t1"))
      .select(col("n").as("n_users"),
        r6(col("s") / lit(100.0)).as("total_value"),
        r6(lit(2.0) * (col("st9") / lit(1e9)) - (col("n") + lit(1L)) / (lit(1.0) * col("n")))
          .as("gini"),
        r6(col("t10") / (lit(1.0) * col("s"))).as("top10_share"),
        r6(col("t1") / (lit(1.0) * col("s"))).as("top1_share"))
  }

  /** Cohort LTV matrix: revenue by (signup-week cohort × weeks since
    * signup) with cohort sizes — the value companion of
    * [[retention]]'s presence matrix ("how much does the March cohort
    * spend in its 3rd week", the payback-period readout).
    *
    * Scale shape: one user_id shuffle for first-seen (a per-user min),
    * the purchase stream joins it co-keyed (same partitioning), value
    * integerized per row, and the rollup lands on the bounded
    * cohort × age grid.
    */
  def cohortLtv(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions.cents
    val e = base(spark, dir)
    val first = e.groupBy(col("user_id"))
      .agg(expr("min(us) div 604800000000").as("cohort_week"))
    val sizes = first.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("cohort_users"))
    e.filter(col("event_type") === "purchase")
      .join(first, "user_id")
      .select(col("cohort_week"),
        (expr("us div 604800000000") - col("cohort_week")).as("week_age"),
        cents(col("value"), 100.0).as("vc"))
      .groupBy(col("cohort_week"), col("week_age"))
      .agg(count(lit(1)).as("n_purchases"), sum(col("vc")).as("vc"))
      .join(broadcast(sizes), "cohort_week")
      .select(col("cohort_week"), col("week_age"), col("cohort_users"),
        col("n_purchases"),
        r6(col("vc") / lit(100.0)).as("revenue"),
        r6(col("vc") / lit(100.0) / col("cohort_users")).as("revenue_per_user"))
      .orderBy(col("cohort_week"), col("week_age"))
  }

  /** Repeat-purchase cadence: the distribution of gaps between a
    * user's consecutive purchases (count of repeat intervals, repeat
    * purchaser count, exact p50/p90 gap in seconds) — the
    * replenishment-cycle readout behind re-engagement timing.
    *
    * Scale shape: one user_id shuffle for the lag window (explicit
    * (us, event_id) tiebreak so both engines order identically); the
    * percentile aggregate runs over the gap table, which is at most
    * one row per purchase.
    */
  def repeatPurchase(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val gaps = base(spark, dir).filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("us"))
      .withColumn("prev", lag(col("us"), 1).over(w))
      .filter(col("prev").isNotNull)
      .select(col("user_id"), expr("(us - prev) div 1000000").as("gap_s"))
    gaps.agg(count(lit(1)).as("n_repeat_gaps"),
        countDistinct(col("user_id")).as("n_repeat_users"),
        r6(expr("percentile(gap_s, 0.5)")).as("p50_gap_s"),
        r6(expr("percentile(gap_s, 0.9)")).as("p90_gap_s"))
  }

  /** Time-to-convert through the view → click → purchase funnel:
    * per-user first view, first click AFTER that view, first purchase
    * AFTER that click, reported as conversion counts plus exact
    * p50/p90 latencies in seconds for each hop — the metric
    * [[funnel]]'s stage-presence counts can't answer ("how LONG does
    * conversion take").
    *
    * Scale shape: three per-user aggregates, each joined back on
    * user_id — the groupBy establishes the user partitioning and the
    * subsequent co-keyed joins/aggregates reuse it (no second
    * partitioning of the corpus); the final percentile aggregate runs
    * over the (user-sized, much smaller than events) delta table.
    */
  def funnelTime(spark: SparkSession, dir: String): DataFrame = {
    val e = base(spark, dir).select(col("user_id"), col("event_type"), col("us"))
    val fv = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("us")).as("fv"))
    val fc = e.filter(col("event_type") === "click").join(fv, "user_id")
      .filter(col("us") > col("fv"))
      .groupBy(col("user_id")).agg(min(col("us")).as("fc"), min(col("fv")).as("fv"))
    val fp = e.filter(col("event_type") === "purchase").join(fc, "user_id")
      .filter(col("us") > col("fc"))
      .groupBy(col("user_id"))
      .agg(min(col("us")).as("fp"), min(col("fc")).as("fc"), min(col("fv")).as("fv"))
    val deltas = fp
      .select(expr("(fc - fv) div 1000000").as("v2c_s"),
        expr("(fp - fc) div 1000000").as("c2p_s"))
    deltas.crossJoin(broadcast(fv.agg(count(lit(1)).as("n_view_users"))))
      .crossJoin(broadcast(fc.agg(count(lit(1)).as("n_clicked"))))
      .groupBy(col("n_view_users"), col("n_clicked"))
      .agg(count(lit(1)).as("n_converted"),
        r6(expr("percentile(v2c_s, 0.5)")).as("p50_view_click_s"),
        r6(expr("percentile(v2c_s, 0.9)")).as("p90_view_click_s"),
        r6(expr("percentile(c2p_s, 0.5)")).as("p50_click_purchase_s"),
        r6(expr("percentile(c2p_s, 0.9)")).as("p90_click_purchase_s"))
      .select(col("n_view_users"), col("n_clicked"), col("n_converted"),
        col("p50_view_click_s"), col("p90_view_click_s"),
        col("p50_click_purchase_s"), col("p90_click_purchase_s"))
  }

  /** Day-of-week × hour load grid: event counts and value share per
    * calendar cell — the seasonality heatmap behind capacity planning
    * and anomaly baselines ("is Tuesday 9am always like this").
    *
    * Scale shape: the calendar keys are PURE integer arithmetic on
    * epoch micros (epoch day 0 = Thursday, so dow = (day+3) % 7 with
    * 0 = Monday) — no calendar/timezone functions, so both engines
    * compute bit-identical keys; one partial-agg shuffle onto the
    * bounded 168-cell grid, total broadcast as a 1-row aggregate.
    */
  def seasonalDow(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions.cents
    val cells = base(spark, dir)
      .select(expr("((us div 86400000000) + 3) % 7").as("dow"),
        expr("(us div 3600000000) % 24").as("hour"),
        cents(col("value"), 100.0).as("vc"))
      .groupBy(col("dow"), col("hour"))
      .agg(count(lit(1)).as("n_events"), sum(col("vc")).as("vc"))
    val total = cells.agg(sum(col("n_events")).as("tn"))
    cells.crossJoin(broadcast(total))
      .select(col("dow"), col("hour"), col("n_events"),
        r6(col("vc") / lit(100.0)).as("value_sum"),
        r6(col("n_events") / (lit(1.0) * col("tn"))).as("share"))
      .orderBy(col("dow"), col("hour"))
  }

  /** Daily new-vs-returning user accounting — the growth ledger
    * (every active user each day is exactly one of the two).
    *
    * Scale shape: ONE user_id shuffle collapses the corpus to each
    * user's sorted active-day array (bounded by the time span, not
    * activity); "first day" is element 0 of that array, so no join
    * against a first-seen table; the rollup runs on the bounded day
    * grid. The naive two-aggregation form (distinct user-days ⋈
    * per-user min) pays a second shuffle for the join — this shape
    * never re-partitions.
    */
  def newVsReturning(spark: SparkSession, dir: String): DataFrame =
    base(spark, dir)
      .select(col("user_id"), expr("us div 86400000000").as("day"))
      .groupBy(col("user_id"))
      .agg(array_sort(collect_set(col("day"))).as("days"))
      .select(element_at(col("days"), 1).as("fd"), explode(col("days")).as("day"))
      .groupBy(col("day"))
      .agg(sum(when(col("fd") === col("day"), 1L).otherwise(0L)).as("new_users"),
        sum(when(col("fd") < col("day"), 1L).otherwise(0L)).as("returning_users"))
      .orderBy(col("day"))

  /** Robust outlier screen per event type: median, MAD, and the count
    * of modified-z outliers (Iglewicz–Hoaglin: |0.6745·(x−med)/MAD| >
    * 3.5) — the heavy-tail-safe upgrade of [[anomaly]]'s mean/stddev
    * z-score, which a single whale purchase can silently widen until
    * real outliers pass.
    *
    * Scale shape: two exact-percentile aggregates (median, then MAD
    * with the per-type median joined broadcast) + one flagging pass —
    * three scans, all group stats broadcast. Spark's exact
    * `percentile` buffers each group's values like the established
    * `q_percentiles` surface; at extreme per-group cardinality swap in
    * `approx_percentile` and re-tune the oracle gate to a tolerance
    * check (the q_approx_quantile pattern).
    */
  def madOutliers(spark: SparkSession, dir: String): DataFrame = {
    val e = base(spark, dir).select(col("event_type"), col("value"))
    val med = e.groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5)").as("med"))
    val mad = e.join(broadcast(med), "event_type")
      .groupBy(col("event_type"))
      .agg(expr("percentile(abs(value - med), 0.5)").as("mad"))
    val rz = abs(lit(0.6745) * (col("value") - col("med")) / col("mad"))
    e.join(broadcast(med), "event_type").join(broadcast(mad), "event_type")
      .groupBy(col("event_type"))
      .agg(
        r6(min(col("med"))).as("med_value"),
        r6(min(col("mad"))).as("mad_value"),
        sum(when(col("mad") > 0 && rz > 3.5, 1L).otherwise(0L)).as("n_outliers"),
        r6(max(when(col("mad") > 0, rz))).as("max_abs_rz"))
      .orderBy(col("event_type"))
  }

  /** Audience-overlap matrix: for every pair of event types, how many
    * users do both, with per-type audience sizes and Jaccard — the
    * cross-sell / feature-adjacency readout (and, on a corpus table,
    * the cross-SOURCE user/document overlap audit).
    *
    * Scale shape: ONE user_id shuffle collapses the corpus to a
    * per-user type SET (bounded by the type vocabulary, not activity);
    * pair generation is in-row combinatorics on that tiny sorted array
    * (the corpus never self-joins), and the totals/pair rollups run on
    * type-vocabulary-sized tables joined broadcast.
    */
  def userOverlap(spark: SparkSession, dir: String): DataFrame = {
    val ts = base(spark, dir)
      .groupBy(col("user_id"))
      .agg(array_sort(collect_set(col("event_type"))).as("ts"))
      // consumed by both the totals and the pair rollup — lazy persist
      // shares one corpus shuffle between the two traversals
      .transform(graft.plans.ScanShare.shared)
    val totals = ts.select(explode(col("ts")).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("u"))
    val pairs = ts.select(explode(flatten(transform(col("ts"), (a, i) =>
        transform(slice(col("ts"), i + 2, size(col("ts"))), b =>
          struct(a.as("ta"), b.as("tb")))))).as("p"))
      .groupBy(col("p.ta").as("type_a"), col("p.tb").as("type_b"))
      .agg(count(lit(1)).as("users_both"))
    pairs
      .join(broadcast(totals.select(col("t").as("type_a"), col("u").as("users_a"))), "type_a")
      .join(broadcast(totals.select(col("t").as("type_b"), col("u").as("users_b"))), "type_b")
      .select(col("type_a"), col("type_b"), col("users_a"), col("users_b"),
        col("users_both"),
        r6(col("users_both") /
          (lit(1.0) * (col("users_a") + col("users_b") - col("users_both"))))
          .as("jaccard"))
  }

  /** The full Lorenz curve at decile resolution: for each value decile
    * (poorest 10% of users → richest 10%), the user count, value share
    * and cumulative share — [[gini]]'s two headline shares generalized
    * to the whole distribution (the "bottom half holds 8%" table).
    *
    * Rides the same distributed rank; the decile id is integer
    * ((rank−1)·10) div n, so deciles differ by at most one user and
    * both engines bucket identically. The rollup and the cumulative
    * window run on the bounded 10-row grid.
    */
  def lorenz(spark: SparkSession, dir: String, buckets: Int = 1000): DataFrame =
    lorenzFromTotals(purchaseTotals(spark, dir), buckets)

  private[graft] def lorenzFromTotals(t: DataFrame, buckets: Int = 1000): DataFrame = {
    val w = graft.functions.VectorFunctions.boundedWindow(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rankedFromTotals(t, buckets)
      .withColumn("decile", expr("((rank - 1) * 10) div n"))
      .groupBy(col("decile"), col("s"))
      .agg(count(lit(1)).as("n_users"), sum(col("t")).as("tv"))
      .withColumn("cum_tv", sum(col("tv")).over(w))
      .select(col("decile"), col("n_users"),
        r6(col("tv") / lit(100.0)).as("value"),
        r6(col("tv") / (lit(1.0) * col("s"))).as("share"),
        r6(col("cum_tv") / (lit(1.0) * col("s"))).as("cum_share"))
      .orderBy(col("decile"))
  }

  /** Frequent behavioral n-grams: every length-3 sub-path of each
    * user's full event-type sequence, scored by USER support (a user
    * counts once per gram) — the sub-path mining layer between
    * [[eventPaths]] (whole-session strings) and [[markovTransitions]]
    * (single steps). The native one-pass shingler from the text family
    * does the k-gram construction — the same expression serves prose
    * shingling and behavioral mining.
    *
    * Scale shape: one shuffle collapses events to per-user ordered
    * sequences (bounded by per-user activity); gram construction is
    * map-side (distinct within user by construction, so support =
    * plain count); the gram agg shuffles O(distinct grams) partials and
    * the top-k is a TakeOrdered, never a global sort.
    */
  def eventNgrams(spark: SparkSession, dir: String, topK: Int = 20): DataFrame = {
    val seqs = base(spark, dir)
      .groupBy(col("user_id"))
      .agg(transform(
        array_sort(collect_list(struct(col("us"), col("event_id"), col("event_type")))),
        x => x.getField("event_type")).as("seq"))
    val nUsers = seqs.agg(count(lit(1)).as("n_users_total"))
    seqs.select(col("user_id"),
        explode(graft.functions.TextExprs.shingles(col("seq"))).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("n_users"))
      .crossJoin(broadcast(nUsers))
      .select(col("gram"), col("n_users"),
        r6(col("n_users") / (lit(1.0) * col("n_users_total"))).as("user_share"))
      .orderBy(col("n_users").desc, col("gram"))
      .limit(topK)
  }

  /** Point-in-time lag features per order — the feature-engineering
    * pattern every training pipeline needs: previous order value, days
    * since the previous order, and a 3-order rolling mean, all strictly
    * backward-looking (no leakage: every feature is computable at the
    * order's own timestamp).
    *
    * Scale shape: exactly one shuffle (on the customer key); all three
    * features ride the same partitioned window ordering, and the
    * rolling mean divides the frame's integerized sum by its row count
    * so the mirror is bit-exact.
    */
  def lagFeatures(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("us"), col("o_orderkey"))
    val wRoll = w.rowsBetween(-2, Window.currentRow)
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("us"),
        graft.functions.VectorFunctions.cents(col("o_totalprice"), 100.0).as("vc"))
      .select(col("o_orderkey"), col("o_custkey"),
        row_number().over(w).cast("long").as("order_idx"),
        r6(lag(col("vc"), 1).over(w) / 100.0).as("prev_value"),
        ((col("us") - lag(col("us"), 1).over(w)) / lit(86400000000L))
          .cast("long").as("days_since_prev"),
        r6(sum(col("vc")).over(wRoll) /
          (lit(100.0) * count(lit(1)).over(wRoll))).as("roll3_value"))
  }

  /** Exact 7-day rolling MEDIAN of daily revenue with a 2× spike flag —
    * the robust-trend companion of [[forecastSma]]: one fat day barely
    * moves the median where it drags the mean a seventh of its weight
    * (the q_mad_outliers argument applied to the time axis). The median
    * is the LOWER middle of the sorted frame — rank-based, zero
    * interpolation, so integer cents flow end to end and both engines
    * pick the identical element.
    *
    * Scale shape: the corpus collapses to the bounded daily grid in one
    * partial-agg shuffle; the frame sort runs on ≤`window` values per
    * grid row. Same boundedness contract as every daily-series query.
    */
  def rollingMedian(spark: SparkSession, dir: String, window: Int = 7): DataFrame = {
    import graft.functions.VectorFunctions.cents
    val daily = base(spark, dir)
      .groupBy(expr("us div 86400000000").as("day"))
      .agg(sum(cents(col("value"), 100.0)).as("rev_cents"))
    val w = graft.functions.VectorFunctions.boundedWindow(col("day"))
      .rowsBetween(-(window - 1), Window.currentRow)
    daily
      .withColumn("frame", array_sort(collect_list(col("rev_cents")).over(w)))
      .withColumn("n_frame", size(col("frame")).cast("long"))
      .withColumn("roll_med_cents",
        element_at(col("frame"), expr("CAST((n_frame + 1) div 2 AS INT)")))
      .select(col("day"), col("rev_cents"), col("n_frame"), col("roll_med_cents"),
        (col("rev_cents") > col("roll_med_cents") * 2L).as("spike"))
  }

  /** Kaplan–Meier survival curve of customer lifetimes: lifetime =
    * first order → last order in 30-day buckets; a customer whose last
    * order predates the corpus horizon by > `censorDays` "churned"
    * (event), everyone else is right-censored. Per lifetime bucket:
    * at-risk count, events, censored, and the KM survival estimate
    * S(t) = Π (1 − dᵢ/nᵢ) — the standard retention-economics curve.
    *
    * Numeric contract: the survival product is folded in INTEGER
    * arithmetic (S_e9 ← S_e9·(n−d) div n, seeded at 1e9) so the
    * sequential recurrence is bit-identical in Spark and DuckDB — a
    * double Π (or exp∘Σ∘ln) would be at the mercy of libm ulps. Safe
    * while n_risk < 9.2e9 (long overflow bound; at more users, widen
    * to BigInt).
    *
    * Scale shape: the corpus collapses to per-customer (first, last)
    * in one shuffle, then to one row per lifetime bucket — bounded by
    * the TIME SPAN (≤ ~80 monthly buckets for years of data), not the
    * corpus. The suffix risk counts and the sequential KM fold run on
    * the driver over that bounded aggregate (the same "bounded
    * metadata" contract as index centroids): a WITH RECURSIVE twin
    * was measured re-executing the whole upstream once per bucket
    * (Spark re-plans an uncached view inside each recursion step), so
    * the inherently-sequential tail of a bounded curve belongs on the
    * driver, not in the plan.
    */
  def survival(spark: SparkSession, dir: String, censorDays: Int = 90,
      bucketDays: Int = 30): DataFrame = {
    val dayUs = 86400000000L
    val u = Tables.orders(spark, dir)
      // cast is a no-op on TIMESTAMP and a same-micros reinterpret on
      // the NTZ parquet flavor (session TZ is pinned to UTC)
      .select(col("o_custkey"), unix_micros(col("o_orderdate").cast("timestamp")).as("us"))
      .groupBy(col("o_custkey"))
      .agg(min(col("us")).as("f"), max(col("us")).as("l"))
    val horizon = u.agg(max(col("l")).as("mx"))
    val curve = u.crossJoin(broadcast(horizon))
      .select(expr(s"(l - f) div ${bucketDays * dayUs}").as("dur"),
        (col("l") < col("mx") - lit(censorDays * dayUs)).cast("long").as("churned"))
      .groupBy(col("dur"))
      .agg(count(lit(1)).as("n_total"), sum(col("churned")).as("n_event"))
      .orderBy(col("dur"))
      .collect() // bounded: one row per occupied lifetime bucket
    val suffixRisk = curve.map(_.getLong(1)).scanRight(0L)(_ + _)
    var sE9 = 1000000000L
    val folded = curve.zipWithIndex.map { case (r, i) =>
      val (nTotal, nEvent, nRisk) = (r.getLong(1), r.getLong(2), suffixRisk(i))
      // sE9 ≤ 1e9, so the product overflows Long once nRisk-nEvent
      // nears ~9.2e9 customers; enforce the documented bound instead
      // of wrapping silently (and diverging from DuckDB's HUGEINT)
      require(nRisk < Long.MaxValue / 1000000000L,
        s"KM integer fold: n_risk=$nRisk exceeds the Long-safe bound; widen to BigInt")
      sE9 = sE9 * (nRisk - nEvent) / nRisk // trunc-div ≡ SQL DIV on nonnegatives
      (r.getLong(0), nRisk, nEvent, nTotal - nEvent,
        math.floor(sE9 / 1.0e9 * 1.0e6 + 0.5) / 1.0e6)
    }.toSeq
    spark.createDataFrame(folded)
      .toDF("duration_months", "n_risk", "n_event", "n_cens", "survival")
  }
}
