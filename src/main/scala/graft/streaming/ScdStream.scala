package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incrementally-maintained SCD type-2 dimension (SURVEY.md §2-F): the
  * streaming twin of [[graft.operators.EventOps.scd2]] via
  * `flatMapGroupsWithState` — each user's event stream folds into
  * attribute-validity intervals, and a version is emitted exactly once,
  * when it can no longer change.
  *
  * Emission discipline (append mode cannot retract): below the
  * watermark the change structure is FROZEN — any still-admissible late
  * event has ts ≥ watermark and can therefore only create/destroy
  * change points at or above it — so a version is final iff its CLOSE
  * (the next change's timestamp) is below the watermark. State retains
  * the last not-yet-closed change point plus the raw events at or above
  * the watermark (a late insert can retier any of them); everything
  * below the watermark collapses to its change points. Per user that is
  * O(volatile events), shrinking as the watermark advances; shuffled
  * once on user_id.
  */
object ScdStream extends Serializable {

  case class Version(user_id: Long, tier: Option[Long], valid_from_us: Long,
      valid_to_us: Option[Long], version: Long)
  case class Ev(us: Long, event_id: Long, tier: Long)
  case class ScdState(pending: Seq[Ev], nextVersion: Long, lastTier: Option[Long])

  /** Null tiers (missing/malformed props) ride through the primitive
    * state tuples as this sentinel — far outside the int-div-25 range —
    * and are mapped back to NULL on emit. The batch twin treats a null
    * tier as its own attribute value (the null-safe `<=>` run
    * comparison); sentinel equality reproduces that merging exactly,
    * where the previous non-nullable encoding KILLED the stream on the
    * first null (r9 review).
    */
  private val NullTier = Long.MinValue

  private def tierOut(t: Long): Option[Long] =
    if (t == NullTier) None else Some(t)

  private def micros(t: java.sql.Timestamp): Long =
    (t.getTime / 1000) * 1000000L + t.getNanos / 1000

  /** Collapse an ordered event run to its change points, given the tier
    * in effect before the first event.
    */
  private def changePoints(before: Option[Long], evs: Seq[Ev]): Seq[Ev] =
    evs.foldLeft((before, List.empty[Ev])) { case ((cur, acc), e) =>
      if (cur.contains(e.tier)) (cur, acc) else (Some(e.tier), e :: acc)
    }._2.reverse

  /** `events` needs (user_id long, event_id long, ts timestamp,
    * props json string). On a batch input every version flushes at
    * end-of-group (the last one open, valid_to null), matching the
    * batch operator row-for-row.
    */
  def scd2(events: DataFrame): Dataset[Version] = {
    val spark = events.sparkSession
    import spark.implicits._
    val finalFlush = !events.isStreaming
    val base = events.select(col("user_id"), col("event_id"), col("ts"),
      coalesce(expr("cast(get_json_object(props, '$.k') as int) div 25"),
        lit(NullTier)).as("tier"))
    val withWm = if (events.isStreaming) base.withWatermark("ts", "10 minutes") else base
    val typed = withWm.as[(Long, Long, java.sql.Timestamp, Long)]

    def fn(user: Long, it: Iterator[(Long, Long, java.sql.Timestamp, Long)],
        state: GroupState[ScdState]): Iterator[Version] = {
      val st = state.getOption.getOrElse(ScdState(Seq.empty, 1L, None))
      val merged = (st.pending ++ it.map(e => Ev(micros(e._3), e._2, e._4)))
        .sortBy(e => (e.us, e.event_id))
      if (merged.isEmpty) { if (state.exists) state.remove(); Iterator.empty }
      else if (finalFlush) {
        if (state.exists) state.remove()
        val chg = changePoints(st.lastTier, merged)
        val closes = chg.drop(1).map(e => Some(e.us)) :+ None
        chg.zip(closes).zipWithIndex.iterator.map { case ((c, to), i) =>
          Version(user, tierOut(c.tier), c.us, to, st.nextVersion + i)
        }
      } else {
        val wmUs = state.getCurrentWatermarkMs() * 1000
        // below the watermark the run structure is final: collapse it;
        // at/above it any event may yet become (or stop being) a change
        // point under late inserts, so keep those raw
        val (stable, volatile) = merged.partition(_.us < wmUs)
        val chg = changePoints(st.lastTier, stable)
        // every stable change except the last is closed by its stable
        // successor → emit; the last stays pending (its close is still
        // unknown — the next change may land anywhere above it)
        val emit = if (chg.isEmpty) Seq.empty
          else chg.zip(chg.drop(1)).map { case (c, nxt) => (c, nxt.us) }
        val out = emit.zipWithIndex.map { case ((c, to), i) =>
          Version(user, tierOut(c.tier), c.us, Some(to), st.nextVersion + i)
        }
        val keptTier = if (emit.nonEmpty) Some(emit.last._1.tier) else st.lastTier
        val kept = chg.takeRight(1) ++ volatile
        if (kept.isEmpty && out.isEmpty && state.exists) state.remove()
        else {
          state.update(ScdState(kept, st.nextVersion + out.size, keptTier))
          // wake when the watermark next passes a retained event (a
          // pending close may become final without new input); clamp
          // strictly past the current watermark
          if (kept.nonEmpty)
            state.setTimeoutTimestamp(math.max(
              kept.map(_.us).min / 1000 + 1, wmUs / 1000 + 1))
        }
        out.iterator
      }
    }

    typed.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(fn)
  }
}
