package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitter sketch as a mergeable typed `Aggregator`:
  * at most `k` counters per group; any item with true frequency
  * > N/(k+1) is guaranteed to survive, and every estimate satisfies
  * est ≤ true ≤ est + N/(k+1). The mergeable form (counter sum, then
  * subtract the (k+1)-largest count and keep positives — Agarwal et
  * al., "Mergeable Summaries") makes it a partial-agg-friendly
  * distributed sketch: counters shuffle, tokens never re-scan.
  *
  * Unlike the exact heavy-hitter query (full token groupBy), the state
  * is O(k) per group regardless of vocabulary size — the form that
  * works in Structured Streaming state or at 10¹² tokens.
  */
class MisraGries(k: Int) extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], x: String): Map[String, Long] =
    buf.get(x) match {
      case Some(c) => buf.updated(x, c + 1L)
      case None if buf.size < k => buf.updated(x, 1L)
      // classic decrement-all step; the incoming item is absorbed
      case None => buf.flatMap { case (t, c) => if (c > 1L) Some(t -> (c - 1L)) else None }
    }

  override def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] = {
    val m = b1 ++ b2.map { case (t, c) => t -> (b1.getOrElse(t, 0L) + c) }
    if (m.size <= k) m
    else {
      // deterministic shrink: subtract the (k+1)-largest counter value,
      // keep strictly-positive survivors (a pure function of counts)
      val cut = m.values.toSeq.sorted(Ordering[Long].reverse).drop(k).headOption.getOrElse(0L)
      m.flatMap { case (t, c) => if (c - cut > 0L) Some(t -> (c - cut)) else None }
    }
  }

  override def finish(r: Map[String, Long]): Seq[(String, Long)] =
    r.toSeq.sortBy { case (t, c) => (-c, t) }

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
}
