package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Deterministic consistent sampling as a mergeable sketch: keep the k
  * lexicographically-smallest md5 hashes per group (bottom-k / KMV
  * sketch). Unlike reservoir sampling this is order-independent — any
  * partial-aggregation tree yields the same result, so a distributed
  * sample is reproducible run to run AND expressible as a SQL oracle
  * (rank over md5). The same sketch estimates distinct counts and
  * powers consistent cross-dataset sampling (same ids sampled
  * everywhere) — the property an LLM-data pipeline needs for held-out
  * splits.
  *
  * Custom typed `Aggregator` (the codegen-friendly user-facing
  * aggregation extension point), registered per query via `udaf`.
  */
class BottomKSketch(k: Int) extends Aggregator[String, List[String], Seq[String]] {

  override def zero: List[String] = Nil

  // sorted ascending, length ≤ k
  private def insert(buf: List[String], h: String): List[String] = {
    if (buf.length >= k && buf.last <= h) buf
    else {
      val (lt, ge) = buf.span(_ < h)
      if (ge.headOption.contains(h)) buf // set semantics on exact dup hash
      else (lt ::: h :: ge).take(k)
    }
  }

  override def reduce(buf: List[String], a: String): List[String] = insert(buf, a)

  override def merge(b1: List[String], b2: List[String]): List[String] =
    b2.foldLeft(b1)(insert)

  override def finish(r: List[String]): Seq[String] = r

  override def bufferEncoder: Encoder[List[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[String]]()
  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}
