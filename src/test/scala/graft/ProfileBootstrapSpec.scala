package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Relational

/** Column-profile + BRR bootstrap invariants (round 9). */
class ProfileBootstrapSpec extends AnyFunSuite {
  import SparkSuite._

  test("profile stats agree with direct computation") {
    val li = Tables.lineitem(spark, Sf)
    val n = li.count()
    val rows = Relational.profile(spark, Sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.size == 5)
    rows.values.foreach { r =>
      assert(r.getLong(1) == n, s"${r.getString(0)}: n != table count")
      assert(r.getLong(2) == 0, "this data has no nulls")
      assert(r.getDouble(4) <= r.getDouble(6) && r.getDouble(6) <= r.getDouble(5),
        s"${r.getString(0)}: avg outside [min,max]")
      assert(r.getDouble(7) > 0 && r.getDouble(7) <= 1)
    }
    val dq = li.select(col("l_quantity")).distinct().count()
    assert(rows("l_quantity").getLong(3) == dq, "exact distinct mismatch")
    val modeCnt = li.groupBy(col("l_partkey")).count()
      .agg(max(col("count"))).head().getLong(0)
    val expShare = math.floor(modeCnt.toDouble / n * 1e6 + 0.5) / 1e6
    assert(rows("l_partkey").getDouble(7) == expShare, "mode share mismatch")
  }

  test("bootstrapCi replays exactly from a JVM md5 recomputation") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String) =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val orders = Tables.orders(spark, Sf)
      .select(col("o_orderkey"), col("o_totalprice")).collect()
      .map(r => (md5hex(r.getLong(0).toString),
        math.floor(r.getDouble(1) * 100.0 + 0.5).toLong))
    val reps = 64
    val means = (0 until reps).map { rep =>
      val half = orders.filter { case (h, _) =>
        val ch = h.charAt(rep / 2)
        if (rep % 2 == 0) ch <= '7' else ch >= '8'
      }
      require(half.nonEmpty)
      rep -> half.map(_._2).sum * 100 / half.length
    }
    // complementary halves partition the corpus split by split
    (0 until reps / 2).foreach { s =>
      val lo = orders.count(_._1.charAt(s) <= '7')
      assert(lo > 0 && lo < orders.length,
        s"split $s is degenerate — md5 chars not balanced")
    }
    val sorted = means.sortBy(m => (m._2, m._1)).map(_._2)
    val mbar = orders.map(_._2).sum * 100 / orders.length
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val row = Relational.bootstrapCi(spark, Sf).head()
    assert(row.getLong(0) == orders.length)
    assert(row.getLong(1) == reps.toLong)
    assert(row.getDouble(2) == r6(mbar / 1e4))
    val ss = means.map(m => (m._2 - mbar) * (m._2 - mbar)).sum
    assert(row.getDouble(3) == r6(math.sqrt(ss / 64.0) / 1e4))
    assert(row.getDouble(4) == r6(sorted(3) / 1e4))   // rank 4
    assert(row.getDouble(5) == r6(sorted(31) / 1e4))  // rank 32
    assert(row.getDouble(6) == r6(sorted(60) / 1e4))  // rank 61
    assert(row.getDouble(4) <= row.getDouble(5) && row.getDouble(5) <= row.getDouble(6))
  }
}
