package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.HllSketch

/** Streaming distinct-count sketches: per group, the state is ONE 4 KiB
  * HLL register array — never the key set — folded per micro-batch with
  * the same register-max algebra as the batch Aggregator
  * ([[graft.functions.HllSketch]]). Because register-wise max is a
  * commutative idempotent monoid, the streamed sketch is BYTE-IDENTICAL
  * to a batch sketch of everything seen so far: re-delivered keys are
  * absorbed (idempotent), arrival order is irrelevant (commutative),
  * and the spec can assert stream ≡ batch exactly, not approximately.
  *
  * This is the live twin of the batch `q_approx_distinct` surface:
  * bounded state forever, no watermark needed (registers never grow),
  * Update-mode emission of the running estimate after every batch.
  */
object HllStream extends Serializable {

  case class DistinctEst(grp: String, est_distinct: Double, epoch: Long)
  case class HllState(epoch: Long, regs: Array[Byte])

  /** `rows` needs (grp string, h long) — h pre-hashed with `xxhash64`
    * on the Catalyst side, the same hash the batch build uses.
    */
  def distinctPerGroup(rows: DataFrame): Dataset[DistinctEst] = {
    val spark = rows.sparkSession
    import spark.implicits._
    val agg = new HllSketch.HllAgg()

    def fn(grp: String, it: Iterator[(String, Long)],
        state: GroupState[HllState]): Iterator[DistinctEst] = {
      val prev = state.getOption.getOrElse(HllState(0L, agg.zero))
      // fold the micro-batch through the SAME reduce as the batch
      // Aggregator, starting from the persisted registers
      val regs = it.foldLeft(prev.regs.clone())((b, r) => agg.reduce(b, r._2))
      val next = HllState(prev.epoch + 1, regs)
      state.update(next)
      Iterator.single(DistinctEst(grp, HllSketch.estimate(regs), next.epoch))
    }

    rows.select(col("grp"), col("h")).as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(fn)
  }
}
