package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** The dedup threshold-sweep tuning table: monotone in the threshold
  * (a stricter cut can only shrink the hit set), internally consistent
  * with the drop rule it predicts, and bounded.
  */
class DedupSweepSpec extends AnyFunSuite {
  import SparkSuite._

  private lazy val rows = Dedup.thresholdSweep(spark, Sf).collect()
    .map(r => r.getDouble(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
    .sortBy(_._1)

  test("one row per threshold; all counts monotone non-increasing") {
    assert(rows.map(_._1) === Seq(0.5, 0.6, 0.7, 0.8, 0.9))
    rows.sliding(2).foreach { case Array((tl, a), (th, b)) =>
      assert(a._1 >= b._1, s"n_pairs not monotone between $tl and $th")
      assert(a._2 >= b._2, s"n_docs_dropped not monotone between $tl and $th")
      assert(a._3 >= b._3, s"chars_dropped not monotone between $tl and $th")
    }
    rows.foreach { case (t, (_, _, _, frac)) =>
      assert(frac >= 0.0 && frac <= 1.0, s"frac out of range at $t")
    }
  }

  test("the 0.8 row equals what dropDecisions actually drops at 0.8") {
    val sweep08 = rows.toMap.apply(0.8)
    val dropped = Dedup.dropDecisions(spark, Sf, threshold = 0.8)
      .select("drop_doc").distinct().count()
    assert(sweep08._2 === dropped,
      s"sweep predicts ${sweep08._2} dropped docs, drop rule removes $dropped")
  }
}
