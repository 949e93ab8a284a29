package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incrementally-maintained cohort-LTV matrix: the streaming twin of
  * [[graft.operators.EventOps.cohortLtv]] via `flatMapGroupsWithState`.
  *
  * Semantics to preserve: a user's cohort is the week of their FIRST
  * event of any type — and an out-of-order event can move that first
  * week EARLIER, which re-tiers the user (their cohort membership and
  * every one of their purchase cells shift). Append-only aggregation
  * gets this wrong; this operator emits signed DELTAS instead:
  *
  *  - size rows (week_age = -1): ±1 cohort membership,
  *  - cell rows (week_age ≥ 0): ±(n, value-cents) per
  *    (cohort_week, week_age) cell,
  *
  * and a re-tier emits the full retraction of the user's old cells
  * plus their re-keyed re-assertion. Summing deltas therefore equals
  * the batch matrix at every epoch, late events included — the same
  * retraction discipline ScdStream uses, expressed as algebra instead
  * of emission timing.
  *
  * State per user: cohort week + the user's own (week_age → n, vc)
  * cells — bounded by the weeks the user has been active, not by
  * event count. One shuffle on user_id; the delta table rolls up onto
  * the (cohort × age) grid exactly like the batch rollup.
  */
object CohortLtvStream extends Serializable {

  case class LtvDelta(cohort_week: Long, week_age: Long,
      d_users: Long, d_n: Long, d_vc: Long)
  case class LtvState(cohort: Long, ages: Map[Long, (Long, Long)])

  private val WeekUs = 604800000000L

  /** `events` needs (user_id long, event_type string, value double,
    * ts timestamp) — the batch operator's inputs.
    */
  def deltas(events: DataFrame): Dataset[LtvDelta] = {
    val spark = events.sparkSession
    import spark.implicits._
    // integer `div`, exactly the batch operator's week arithmetic
    // (double `/` could round a quotient across a week boundary)
    val typed = events.select(col("user_id"),
        expr(s"unix_micros(ts) div $WeekUs").as("week"),
        (col("event_type") === "purchase").as("buy"),
        coalesce(graft.functions.VectorFunctions.cents(col("value"), 100.0), lit(0L))
          .as("vc"))
      .as[(Long, Long, Boolean, Long)]

    def fn(user: Long, it: Iterator[(Long, Long, Boolean, Long)],
        state: GroupState[LtvState]): Iterator[LtvDelta] = {
      val evs = it.toSeq
      val out = scala.collection.mutable.ArrayBuffer.empty[LtvDelta]
      val st = state.getOption
      var cohort = st.map(_.cohort).getOrElse(Long.MaxValue)
      var ages = st.map(_.ages).getOrElse(Map.empty[Long, (Long, Long)])
      val minWeek = evs.map(_._2).min
      if (st.isEmpty) {
        cohort = minWeek
        out += LtvDelta(cohort, -1L, 1L, 0L, 0L)
      } else if (minWeek < cohort) {
        // late event precedes the known first week: re-tier the user —
        // retract membership and every cell, re-assert shifted
        val shift = cohort - minWeek
        out += LtvDelta(cohort, -1L, -1L, 0L, 0L)
        out += LtvDelta(minWeek, -1L, 1L, 0L, 0L)
        ages.foreach { case (age, (n, vc)) =>
          out += LtvDelta(cohort, age, 0L, -n, -vc)
          out += LtvDelta(minWeek, age + shift, 0L, n, vc)
        }
        ages = ages.map { case (age, v) => (age + shift) -> v }
        cohort = minWeek
      }
      evs.filter(_._3).foreach { case (_, week, _, vc) =>
        val age = week - cohort
        val (n0, v0) = ages.getOrElse(age, (0L, 0L))
        ages = ages.updated(age, (n0 + 1L, v0 + vc))
        out += LtvDelta(cohort, age, 0L, 1L, vc)
      }
      state.update(LtvState(cohort, ages))
      out.iterator
    }

    typed.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(fn)
  }

  /** Roll an LtvDelta log up to the batch matrix — column-for-column
    * [[graft.operators.EventOps.cohortLtv]]'s output, so the
    * equivalence spec compares rows directly.
    */
  def matrixOf(deltas: DataFrame): DataFrame = {
    import graft.functions.VectorFunctions.r6
    import org.apache.spark.sql.expressions.Window
    // ONE pass: the delta log collapses onto the (cohort × age) grid,
    // and cohort sizes ride a window over that bounded grid (size rows
    // carry week_age = -1, cell rows d_users = 0) — no self-join, so
    // the log is scanned once even when it is a streaming sink table
    val grid = deltas
      .groupBy(col("cohort_week"), col("week_age"))
      .agg(sum(col("d_users")).as("du"),
        sum(col("d_n")).as("n_purchases"), sum(col("d_vc")).as("vc"))
    grid
      .withColumn("cohort_users",
        sum(col("du")).over(Window.partitionBy(col("cohort_week"))))
      .filter(col("week_age") >= 0L && col("n_purchases") > 0 &&
        col("cohort_users") > 0)
      .select(col("cohort_week"), col("week_age"), col("cohort_users"),
        col("n_purchases"),
        r6(col("vc") / lit(100.0)).as("revenue"),
        r6(col("vc") / lit(100.0) / col("cohort_users")).as("revenue_per_user"))
      .orderBy(col("cohort_week"), col("week_age"))
  }
}
