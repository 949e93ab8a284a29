package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, EventOps}

/** KM survival + containment-dedup invariants (round 9). */
class SurvivalContainmentSpec extends AnyFunSuite {
  import SparkSuite._

  test("survival: curve shape invariants and exact KM recurrence") {
    val rows = EventOps.survival(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    // risk set shrinks as lifetimes grow; survival is a nonincreasing
    // probability
    rows.sliding(2).foreach { case Array((_, n1, _, _, s1), (_, n2, _, _, s2)) =>
      assert(n2 < n1, "risk set must strictly shrink across buckets")
      assert(s2 <= s1, "survival must be nonincreasing")
    case _ => ()
    }
    assert(rows.forall { case (_, _, _, _, s) => s > 0 && s <= 1 })
    // events + censored exhaust the population
    val nCust = Tables.orders(spark, Sf).select(col("o_custkey")).distinct().count()
    assert(rows.map(r => r._3 + r._4).sum == nCust)
    // replay the integer fold the recursive CTE declares
    var sE9 = 1000000000L
    rows.foreach { case (_, nRisk, nEvent, _, s) =>
      sE9 = sE9 * (nRisk - nEvent) / nRisk
      val expect = math.floor(sE9 / 1e9 * 1e6 + 0.5) / 1e6
      assert(s == expect, s"survival $s != folded $expect")
    }
  }

  test("containment: every reported pair is exact, and an asymmetric plant is found") {
    val sets = Dedup.docShingles(spark, Sf).collect()
      .groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getString(1)).toSet }
    val rows = Dedup.containment(spark, Sf).collect()
    assert(rows.nonEmpty, "no contained pairs found at sf0.001")
    rows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val inter = sets(a).intersect(sets(b)).size
      assert(r.getLong(2) == inter, s"n_inter mismatch for ($a,$b)")
      assert(r.getLong(3) == sets(a).size && r.getLong(4) == sets(b).size)
      val expect = math.floor(inter.toDouble / math.min(sets(a).size, sets(b).size) * 1e6 + 0.5) / 1e6
      assert(r.getDouble(5) == expect)
      assert(r.getDouble(5) >= 0.5)
    }
  }

  test("containment dominates jaccard, strictly on unequal-size pairs") {
    // overlap coefficient ≥ jaccard always; strictly greater whenever
    // the two shingle sets differ in size — the asymmetry this
    // operator exists to measure
    val rows = Dedup.containment(spark, Sf, minContainment = 0.5).collect()
    var strict = 0
    rows.foreach { r =>
      val (ni, na, nb) = (r.getLong(2), r.getLong(3), r.getLong(4))
      val jac = ni.toDouble / (na + nb - ni)
      val cont = ni.toDouble / math.min(na, nb)
      assert(cont >= jac)
      if (na != nb) { assert(cont > jac); strict += 1 }
    }
    assert(strict > 0, "every reported pair had equal-size sets — nothing asymmetric to test")
  }
}
