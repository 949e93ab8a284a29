package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming heavy hitters via the Misra–Gries sketch: per group
  * (e.g. language), the state is at most k counters — NOT the
  * vocabulary — updated per micro-batch with the same
  * reduce/merge algebra as the batch Aggregator
  * ([[graft.functions.MisraGries]]), so the streamed sketch inherits
  * the same guarantee: any token with true frequency > N/(k+1)
  * survives, and est ≤ true ≤ est + N/(k+1) (Agarwal et al.,
  * "Mergeable Summaries"). Update-mode output emits the current top-N
  * after every batch, tagged with an epoch.
  *
  * This is the sketch the batch `text_heavy_sketch` query runs,
  * deployed at the stream: bounded state forever, no watermark needed
  * (counters never grow past k).
  */
object SketchStream extends Serializable {

  case class HitEst(lang: String, token: String, est_count: Long, rnk: Long, epoch: Long)
  case class SketchState(epoch: Long, tokens: Array[String], counts: Array[Long])

  /** `tokens` needs (lang string, token string). */
  def heavyHitters(tokens: DataFrame, k: Int = 64, topN: Int = 5): Dataset[HitEst] = {
    val spark = tokens.sparkSession
    import spark.implicits._
    val mg = new graft.functions.MisraGries(k)

    def fn(lang: String, it: Iterator[(String, String)],
        state: GroupState[SketchState]): Iterator[HitEst] = {
      val prev = state.getOption.getOrElse(SketchState(0L, Array.empty, Array.empty))
      val prevMap = prev.tokens.zip(prev.counts).toMap
      // fold the micro-batch through the SAME reduce the batch
      // Aggregator uses, starting from the persisted counters
      val merged = it.foldLeft(prevMap)((buf, r) => mg.reduce(buf, r._2))
      val next = SketchState(prev.epoch + 1,
        merged.keys.toArray, merged.keys.toArray.map(merged))
      state.update(next)
      merged.toSeq.sortBy { case (t, c) => (-c, t) }.take(topN)
        .zipWithIndex.iterator.map { case ((t, c), i) =>
          HitEst(lang, t, c, i + 1L, next.epoch)
        }
    }

    tokens.select(col("lang"), col("token")).as[(String, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(fn)
  }
}
