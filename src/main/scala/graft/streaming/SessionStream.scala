package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization (SURVEY.md §2-F): 30-min-gap
  * session windows via `flatMapGroupsWithState` with an event-time
  * timeout — the streaming twin of the batch
  * [[graft.operators.EventOps.sessionize]].
  *
  * State per user is the set of sessions that could still change: a
  * session is emitted ONLY once the watermark passes its end+gap — a
  * late (within-watermark) event with ts ≤ end+gap could still merge
  * into it, and an append-mode emission cannot be retracted, so eager
  * emission would produce split/duplicate sessions the batch twin never
  * does. Until the watermark catches up that is O(pending sessions) per
  * user, shrinking back to one as it advances; shuffled once on
  * user_id.
  */
object SessionStream extends Serializable {

  case class Session(user_id: Long, start_us: Long, end_us: Long, n_events: Long)
  case class OpenSession(start_us: Long, end_us: Long, n_events: Long)
  case class SessState(sessions: Seq[OpenSession])

  val GapMicros: Long = 30L * 60 * 1000000

  private def micros(t: java.sql.Timestamp): Long =
    (t.getTime / 1000) * 1000000L + t.getNanos / 1000

  /** `events` needs (user_id long, ts timestamp). On a stream, open
    * sessions flush via event-time timeout; on a batch input they flush
    * at end-of-group (no future data by definition).
    */
  def sessionize(events: DataFrame): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val finalFlush = !events.isStreaming
    val base = events.select(col("user_id"), col("ts"))
    val withWm = if (events.isStreaming) base.withWatermark("ts", "10 minutes") else base
    val typed = withWm.as[(Long, java.sql.Timestamp)]

    def fn(user: Long, it: Iterator[(Long, java.sql.Timestamp)],
        state: GroupState[SessState]): Iterator[Session] = {
      // interval-merge: late (but within-watermark) events may precede
      // any retained session, so retained sessions and the batch events
      // are merged as one sorted timeline rather than appended — an
      // event arriving before a retained session's start extends it
      // backwards or bridges two retained sessions into one, exactly as
      // the batch twin would. (On timeout `it` is empty and this merge
      // is the identity on the retained sessions.)
      val intervals = state.getOption.map(_.sessions).getOrElse(Seq.empty) ++
        it.map(e => { val t = micros(e._2); OpenSession(t, t, 1) })
      val merged = intervals.sortBy(s => (s.start_us, s.end_us))
        .foldLeft(List.empty[OpenSession]) {
          case (cur :: done, s) if s.start_us - cur.end_us <= GapMicros =>
            OpenSession(cur.start_us, math.max(cur.end_us, s.end_us),
              cur.n_events + s.n_events) :: done
          case (acc, s) => s :: acc
        }.reverse
      if (merged.isEmpty) { if (state.exists) state.remove(); Iterator.empty }
      else if (finalFlush) {
        if (state.exists) state.remove()
        merged.iterator.map(s => Session(user, s.start_us, s.end_us, s.n_events))
      } else {
        // a session is final only once the watermark passes end+gap: any
        // not-yet-dropped late event has ts ≥ watermark (the boundary
        // ts == watermark is ADMITTED), so it can merge into a session
        // iff ts ≤ end+gap, i.e. iff end+gap ≥ watermark — finality is
        // the STRICT end+gap < watermark (the ≤ boundary could split a
        // session batch sessionize would merge; r9 review)
        val wmUs = state.getCurrentWatermarkMs() * 1000
        val (fin, kept) = merged.partition(s => s.end_us + GapMicros < wmUs)
        if (kept.isEmpty) { if (state.exists) state.remove() }
        else {
          state.update(SessState(kept))
          // wake when the earliest retained session becomes final; clamp
          // strictly past the watermark (µs→ms truncation could otherwise
          // land exactly on it, which setTimeoutTimestamp rejects)
          state.setTimeoutTimestamp(math.max(
            kept.map(_.end_us).min / 1000 + GapMicros / 1000, wmUs / 1000 + 1))
        }
        fin.iterator.map(s => Session(user, s.start_us, s.end_us, s.n_events))
      }
    }

    typed.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(fn)
  }
}
