package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incrementally-maintained inequality analytics: the streaming twin of
  * the batch `q_gini` / `q_lorenz` surface
  * ([[graft.operators.EventOps.gini]]/lorenz).
  *
  * Two layers, both bounded:
  *
  *  1. [[userTotals]] — per-user running purchase totals via
  *     `flatMapGroupsWithState`; state is ONE long per user (the
  *     established per-key pattern — ScdStream holds more). Each
  *     update row carries (old, new) so every downstream consumer can
  *     maintain itself by +new/−old replacement, and the totals
  *     telescope: Σ(new−old) per user over ANY delivery order equals
  *     the current total, so the exact batch readout
  *     (EventOps.giniFromTotals / lorenzFromTotals — the SAME code
  *     path the graded queries run) applies to the streamed state at
  *     any epoch. Stream ≡ batch is exact, not approximate.
  *
  *  2. [[GiniSketch]] — a FIXED-size log₂-bucket histogram (64
  *     counts + 64 sums, ~1 KiB) folded +new/−old from the update
  *     stream. It answers "how unequal right now" without touching
  *     the user-sized totals at all — the 100 TB shape, where the
  *     readout must not rescan state. Grouped-data gini over bucket
  *     means is a provable LOWER bound of the exact coefficient
  *     (grouping removes within-bucket spread, ≤ 2× in a log₂
  *     bucket); GiniStreamSpec pins both the exact fold identity
  *     (sketch of stream ≡ sketch of final totals, array-equal) and
  *     the estimate's bound against the exact gini.
  */
object InequalityStream extends Serializable {

  /** One per-user state transition: the consumer replaces `old_cents`
    * with `new_cents` (old = 0 on first sight).
    */
  case class TotalUpdate(user_id: Long, old_cents: Long, new_cents: Long)

  /** `events` needs (user_id long, event_type string, value double) —
    * the same columns the batch purchaseTotals aggregates; value is
    * integerized to cents with the identical expression.
    */
  def userTotals(events: DataFrame): Dataset[TotalUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"),
        // null purchase values ride as 0 like CohortLtvStream — the
        // non-nullable tuple field otherwise kills the stream (r9 review)
        coalesce(graft.functions.VectorFunctions.cents(col("value"), 100.0),
          lit(0L)).as("vc"))
      .as[(Long, Long)]

    def fn(user: Long, it: Iterator[(Long, Long)],
        state: GroupState[Long]): Iterator[TotalUpdate] = {
      val old = state.getOption.getOrElse(0L)
      var add = 0L
      while (it.hasNext) add += it.next()._2
      val now = old + add
      state.update(now)
      Iterator.single(TotalUpdate(user, old, now))
    }

    purchases.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(fn)
  }

  /** Current totals from an update log: Σ(new−old) telescopes to the
    * latest total per user regardless of how many epochs contributed.
    * Feed the result straight to EventOps.giniFromTotals /
    * lorenzFromTotals for the exact batch readout.
    */
  def totalsOf(updates: DataFrame): DataFrame =
    updates.groupBy(col("user_id"))
      .agg(sum(col("new_cents") - col("old_cents")).as("t"))
      .filter(col("t") > 0)

  /** Fixed-size incremental inequality sketch: 64 log₂ buckets of
    * (count, sum). `add`/`remove` are exact inverses, so folding an
    * update stream +new/−old lands on the identical arrays as
    * sketching the final totals from scratch.
    */
  final class GiniSketch extends Serializable {
    val counts = new Array[Long](64)
    val sums = new Array[Long](64)

    private def bucket(v: Long): Int =
      if (v <= 0) 0 else 63 - java.lang.Long.numberOfLeadingZeros(v)

    def add(v: Long): Unit = if (v > 0) { val b = bucket(v); counts(b) += 1; sums(b) += v }
    def remove(v: Long): Unit = if (v > 0) { val b = bucket(v); counts(b) -= 1; sums(b) -= v }
    def update(u: TotalUpdate): Unit = { remove(u.old_cents); add(u.new_cents) }
    def merge(o: GiniSketch): GiniSketch = {
      var i = 0
      while (i < 64) { counts(i) += o.counts(i); sums(i) += o.sums(i); i += 1 }
      this
    }

    /** Grouped-data gini over bucket means:
      * Σᵢⱼ nᵢnⱼ|μᵢ−μⱼ| / (2N²μ̄) — a lower bound of the exact
      * coefficient (within-bucket spread is discarded; a log₂ bucket
      * bounds it by 2×). O(64²), state never rescanned.
      */
    def estimate: Double = {
      val n = counts.sum
      val s = sums.map(_.toDouble).sum
      if (n < 2 || s <= 0) return 0.0
      var acc = 0.0
      var i = 0
      while (i < 64) {
        if (counts(i) > 0) {
          val mi = sums(i).toDouble / counts(i)
          var j = 0
          while (j < 64) {
            if (counts(j) > 0) {
              val mj = sums(j).toDouble / counts(j)
              acc += counts(i).toDouble * counts(j).toDouble * math.abs(mi - mj)
            }
            j += 1
          }
        }
        i += 1
      }
      acc / (2.0 * n.toDouble * s)
    }
  }

  object GiniSketch {
    def ofTotals(totals: Iterator[Long]): GiniSketch = {
      val sk = new GiniSketch
      totals.foreach(sk.add)
      sk
    }

    def ofUpdates(updates: Iterator[TotalUpdate]): GiniSketch = {
      val sk = new GiniSketch
      updates.foreach(sk.update)
      sk
    }
  }
}
