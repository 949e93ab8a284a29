package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.PqIndex

/** The PQ candidate-generation tuning table (vs_pq_recall): structural
  * bounds plus the one ordering that is mathematically guaranteed —
  * for a fixed probe set the candidate pool only grows with
  * `candidates`, and a true top-k member in the pool always survives
  * the exact rerank (nothing outside the true top-k can outscore it),
  * so hits = |true top-k ∩ pool| is monotone in the candidate cut.
  * (Recall vs nprobe is NOT asserted: a wider probe set can displace
  * pool members through the approx cut, so it is only monotone in
  * expectation — that's exactly why the tuning table exists.)
  */
class PqRecallSpec extends AnyFunSuite {
  import SparkSuite._

  private lazy val rows = PqIndex.pqRecallReport(spark, Sf).collect()
    .map(r => (r.getInt(0), r.getInt(1)) ->
      ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap

  test("one row per configuration; recall bounded; every sampled query counted") {
    assert(rows.keySet === Set((1, 50), (2, 50), (3, 50), (3, 20)))
    val nq = Tables.embeddings(spark, Sf).filter(col("vec_id") % 100 === 0).count()
    rows.values.foreach { case (q, hits, rec) =>
      assert(q === nq, "every query must be counted even with zero hits")
      assert(hits >= 0L && hits <= q * 10)
      assert(rec >= 0.0 && rec <= 1.0)
      assert(math.abs(rec - hits.toDouble / (q * 10)) < 1e-6)
    }
  }

  test("a wider candidate pool never loses recall at fixed nprobe") {
    assert(rows((3, 20))._2 <= rows((3, 50))._2)
  }

  test("the widest configuration finds something") {
    assert(rows((3, 50))._3 > 0.0)
  }
}
