package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Relational

/** Skyline + decile-lift invariants (round 9). */
class SkylineLiftSpec extends AnyFunSuite {
  import SparkSuite._

  test("skyline: returned points are exactly the undominated set (brute force)") {
    // date as ISO string: lexicographic == chronological, and agnostic
    // to the parquet timestamp flavor (NTZ reads as LocalDateTime)
    val pts = Tables.orders(spark, Sf)
      .select(col("o_totalprice"), col("o_orderdate").cast("string")).collect()
      .map(r => (r.getDouble(0), r.getString(1))).distinct
    val brute = pts.filter { case (p, d) =>
      !pts.exists { case (p2, d2) =>
        p2 >= p && d2 <= d && (p2 > p || d2 < d)
      }
    }.toSet
    val got = Relational.skyline(spark, Sf).collect()
      .map(r => r.getDouble(0)).toSet
    assert(got == brute.map(_._1),
      s"skyline prices ${got.toList.sorted} != brute ${brute.map(_._1).toList.sorted}")
  }

  test("skyline: result is invariant to the pruning grid width") {
    val a = Relational.skyline(spark, Sf, bucketWidth = 10000.0).collect().toSeq
    val b = Relational.skyline(spark, Sf, bucketWidth = 2500.0).collect().toSeq
    val c = Relational.skyline(spark, Sf, bucketWidth = 1e9).collect().toSeq
    assert(a == b && a == c,
      "grid width changed the skyline — pruning is not sound/complete")
  }

  test("decileLift: deciles partition customers, ties stay together, shares reach 1") {
    val rows = Relational.decileLift(spark, Sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 10L),
      "expected exactly deciles 1..10 in order")
    val nCust = Tables.customer(spark, Sf).count()
    assert(rows.map(_.getLong(1)).sum == nCust,
      "decile sizes must partition the customer set")
    val lastShare = rows.last.getDouble(4)
    assert(math.abs(lastShare - 1.0) < 1e-9, s"final cum share $lastShare != 1")
    val shares = rows.map(_.getDouble(4))
    assert(shares.zip(shares.tail).forall { case (x, y) => y >= x },
      "cumulative revenue share must be nondecreasing")
    val lastLift = rows.last.getDouble(5)
    assert(math.abs(lastLift - 1.0) < 1e-9, s"full-population lift $lastLift != 1")
  }

  test("decileLift: equal balances never straddle a decile boundary") {
    // rebuild the per-customer assignment the operator derives: every
    // distinct balance must map to exactly one decile, and the top
    // decile must hold the maximum balance
    val c = Tables.customer(spark, Sf)
      .select(col("c_custkey"), col("c_acctbal")).collect()
      .map(r => (r.getLong(0), math.floor(r.getDouble(1) * 100.0 + 0.5).toLong))
    val n = c.length
    val cum = c.map(_._2).sorted.zipWithIndex
      .groupBy(_._1).map { case (v, xs) => v -> (xs.map(_._2).max + 1) }
    val dec = cum.map { case (v, cm) =>
      v -> (10L - math.floor((cm - 1) * 10.0 / n).toLong)
    }
    assert(dec.values.toSet.subsetOf((1L to 10L).toSet))
    assert(dec(c.map(_._2).max) == 1L, "max balance must be decile 1")
    assert(dec(c.map(_._2).min) == 10L, "min balance must be decile 10")
  }
}
