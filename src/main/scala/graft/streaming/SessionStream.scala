package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization (SURVEY.md §2-F): 30-min-gap
  * session windows via `flatMapGroupsWithState` with an event-time
  * timeout — the streaming twin of the batch
  * [[graft.operators.EventOps.sessionize]].
  *
  * State per user is a single open session (constant size); closed
  * sessions are emitted as soon as a new event breaks the gap, and the
  * final open session is emitted when the watermark passes its
  * timeout. Scale: state is O(active users), shuffled once on user_id.
  */
object SessionStream extends Serializable {

  case class Session(user_id: Long, start_us: Long, end_us: Long, n_events: Long)
  case class OpenSession(start_us: Long, end_us: Long, n_events: Long)

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
        state: GroupState[OpenSession]): Iterator[Session] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator(Session(user, s.start_us, s.end_us, s.n_events))
      } else {
        // interval-merge: late (but within-watermark) events may precede
        // the open session, so the state session and the batch events are
        // merged as one sorted timeline rather than appended — an event
        // arriving before the open session's start extends it backwards
        // or forms an earlier session, exactly as the batch twin would.
        val intervals =
          state.getOption.toSeq.map(s => OpenSession(s.start_us, s.end_us, s.n_events)) ++
            it.map(e => { val t = micros(e._2); OpenSession(t, t, 1) })
        val merged = intervals.sortBy(s => (s.start_us, s.end_us))
          .foldLeft(List.empty[OpenSession]) {
            case (cur :: done, s) if s.start_us - cur.end_us <= GapMicros =>
              OpenSession(cur.start_us, math.max(cur.end_us, s.end_us),
                cur.n_events + s.n_events) :: done
            case (acc, s) => s :: acc
          }.reverse
        if (merged.isEmpty) Iterator.empty
        else {
          val (closed, open) =
            if (finalFlush) (merged, None) else (merged.init, Some(merged.last))
          open match {
            case Some(s) =>
              state.update(s)
              state.setTimeoutTimestamp(s.end_us / 1000 + GapMicros / 1000)
            case None => state.remove()
          }
          closed.iterator.map(s => Session(user, s.start_us, s.end_us, s.n_events))
        }
      }
    }

    typed.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(fn)
  }
}
