package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.ArrayExprs

/** The native in-basket pair fan-out must reproduce the nested
  * transform/slice/flatten formulation element-for-element (order
  * included) — the HOF is the semantic definition the oracles mirror.
  */
class ArrayExprsSpec extends AnyFunSuite {
  import SparkSuite._
  import spark.implicits._

  private def hofPairs(parts: Column): Column =
    flatten(transform(parts, (a, i) =>
      transform(slice(parts, i + 2, size(parts)), b =>
        struct(a.as("pa"), b.as("pb")))))

  test("orderedPairs == nested-transform HOF on every corpus basket") {
    val baskets = Tables.lineitem(spark, Sf)
      .groupBy(col("l_orderkey"))
      .agg(array_sort(collect_set(col("l_partkey"))).as("parts"))
    val bad = baskets
      .select(ArrayExprs.orderedPairs(col("parts")).as("n"),
        hofPairs(col("parts")).as("h"))
      .filter(col("n") =!= col("h")).count()
    assert(bad === 0L)
  }

  test("edge cases: empty, singleton, null array") {
    val rows = Seq(Some(Seq.empty[Long]), Some(Seq(7L)), Some(Seq(3L, 5L, 9L)), None)
      .toDF("xs")
      .select(ArrayExprs.orderedPairs(col("xs")).as("n"), hofPairs(col("xs")).as("h"))
      .collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1), s"nullness: $r")
      if (!r.isNullAt(0)) assert(r.getSeq[Any](0) === r.getSeq[Any](1), s"pairs: $r")
    }
    // the 3-element case explicitly: (3,5), (3,9), (5,9) in order
    val three = rows(2).getSeq[org.apache.spark.sql.Row](0)
    assert(three.map(p => (p.getLong(0), p.getLong(1))) ===
      Seq((3L, 5L), (3L, 9L), (5L, 9L)))
  }

  test("a basket whose pair count exceeds Int.MaxValue fails loudly, not wrapped") {
    // 65_537 elements → 2_147_516_416 pairs > Int.MaxValue: the Int
    // product used to go negative (NegativeArraySizeException at best,
    // a truncated pair array at worst — ADVICE r8)
    val xs = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array.tabulate(65537)(_.toLong))
    val e = intercept[IllegalArgumentException] { ArrayExprs.orderedPairsArr(xs) }
    assert(e.getMessage.contains("cap or salt"))
    // just under the boundary stays exact: n=3 sanity via the same entry
    val small = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array(3L, 5L, 9L))
    assert(ArrayExprs.orderedPairsArr(small).numElements() === 3)
  }

  test("sortedIntersectCount == size(array_intersect) on corpus doc shingle-hash sets") {
    // the containment verify kernel: sorted distinct 60-bit md5-prefix
    // hash arrays, native merge-count vs the HOF set intersection
    val sets = Tables.fanOut(Tables.documents(spark, Sf))
      .select(col("doc_id"),
        array_sort(array_distinct(transform(
          graft.functions.TextExprs.shingles(
            graft.functions.TextFunctions.tokens(col("text"))),
          s => conv(substring(md5(s), 1, 15), 16, 10).cast("long")))).as("sh"))
      .limit(200)
    val a = sets.select(col("doc_id").as("ia"), col("sh").as("sh_a"))
    val b = sets.select(col("doc_id").as("ib"), col("sh").as("sh_b"))
    val bad = a.crossJoin(b).filter(col("ia") < col("ib"))
      .select(
        ArrayExprs.sortedIntersectCount(col("sh_a"), col("sh_b")).as("n"),
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("long").as("h"))
      .filter(col("n") =!= col("h")).count()
    assert(bad === 0L)
  }

  test("sortedIntersectCount edge cases: empty, disjoint, identical, null") {
    val rows = Seq(
      (Some(Seq.empty[Long]), Some(Seq(1L, 2L))),
      (Some(Seq(1L, 3L, 5L)), Some(Seq(2L, 4L, 6L))),
      (Some(Seq(1L, 3L, 5L)), Some(Seq(1L, 3L, 5L))),
      (Some(Seq(1L, 3L, 5L)), Some(Seq(3L, 5L, 9L))),
      (None, Some(Seq(1L))))
      .toDF("xs", "ys")
      .select(ArrayExprs.sortedIntersectCount(col("xs"), col("ys")).as("n"))
      .collect()
    assert(rows(0).getLong(0) === 0L)
    assert(rows(1).getLong(0) === 0L)
    assert(rows(2).getLong(0) === 3L)
    assert(rows(3).getLong(0) === 2L)
    assert(rows(4).isNullAt(0))
  }
}
