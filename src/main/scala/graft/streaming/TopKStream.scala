package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.VectorFunctions.dot

/** Streaming top-k serving (SURVEY.md §9 → done): maintain the running
  * top-k corpus matches per query over an embedding stream. State per
  * query is the bounded top-k list (O(k), never the corpus); each
  * microbatch merges its scored rows into the state and emits the
  * updated ranking (Update mode). The batch twin is KnnSearch.knnJoin —
  * the spec proves the final streamed ranking equals it.
  */
object TopKStream extends Serializable {

  case class Hit(query_id: Long, vec_id: Long, score: Double, rnk: Long, epoch: Long)
  // primitive arrays keep the state encoder codegen-friendly
  case class QState(epoch: Long, scores: Array[Double], ids: Array[Long])

  /** `scored` needs (query_id long, vec_id long, score double) — e.g. a
    * stream-static join of incoming vectors against the broadcast query
    * set. Emits the per-query top-k after every state update, tagged
    * with an epoch so consumers (and the spec) can take the latest.
    */
  def topKPerQuery(scored: DataFrame, k: Int = 5): Dataset[Hit] = {
    val spark = scored.sparkSession
    import spark.implicits._

    def fn(qid: Long, it: Iterator[(Long, Long, Double)],
        state: GroupState[QState]): Iterator[Hit] = {
      val prev = state.getOption.getOrElse(QState(0L, Array.empty, Array.empty))
      // merge batch into the bounded list under (score DESC, vec_id ASC);
      // dedup by vec_id first (keep best score) — at-least-once sources
      // can deliver a vector in more than one microbatch and a replayed
      // id must not occupy two top-k slots (it would push a distinct id
      // out of the ranking the batch twin keeps)
      val merged = (prev.scores.zip(prev.ids) ++ it.map(r => (r._3, r._2)))
        .groupMapReduce(_._2)(_._1)(math.max)
        .toArray.map { case (v, sc) => (sc, v) }
        .sortBy { case (s, v) => (-s, v) }
        .take(k)
      val next = QState(prev.epoch + 1, merged.map(_._1), merged.map(_._2))
      state.update(next)
      merged.zipWithIndex.iterator.map { case ((s, v), i) =>
        Hit(qid, v, s, i + 1L, next.epoch)
      }
    }

    scored.select(col("query_id"), col("vec_id"), col("score"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(fn)
  }

  /** Convenience: score an embedding stream against a (small, static)
    * query set — the stream side never shuffles; the query set is a
    * broadcast stream-static join.
    */
  def scoredStream(vectors: DataFrame, queries: DataFrame): DataFrame =
    vectors.join(broadcast(queries), expr("true"))
      .select(col("query_id"), col("vec_id"),
        dot(col("embedding"), col("qvec")).as("score"))
}
