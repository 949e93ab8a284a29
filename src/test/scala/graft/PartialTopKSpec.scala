package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.KnnSearch
import graft.plans.PartialTopK

class PartialTopKSpec extends AnyFunSuite {
  import SparkSuite._

  test("knnJoin with partial top-k equals the plain window formulation") {
    def key(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("query_id", "rnk").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(key(KnnSearch.knnJoin(spark, Sf)) === key(KnnSearch.knnJoinPlain(spark, Sf)))
  }

  test("the custom exec is planned and bounds rows before the shuffle") {
    val df = KnnSearch.knnJoin(spark, Sf, k = 3)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartialTopK "), plan) // exec nodeName strips the Exec suffix
  }

  test("NULL and NaN scores rank exactly as the desc window does") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // per group: NaNs (rank first in DESC), finite values, NULLs (rank
    // last) — more rows than k of each flavor so ordering inside each
    // flavor matters too
    val rows: Seq[(Long, Option[Double], Long)] = (0 until 60).map { i =>
      val g = (i % 3).toLong
      val s = (i / 3) % 5 match {
        case 0 => Some(Double.NaN)
        case 1 => None
        case _ => Some((i * 37 % 23).toDouble)
      }
      (g, s, i.toLong)
    }
    val df = rows.toDF("g", "s", "t").repartition(4)
    val w = Window.partitionBy("g").orderBy(desc("s"), asc("t"))
    def topk(in: org.apache.spark.sql.DataFrame): Set[(Long, String, Long, Int)] =
      in.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 4)
        .select("g", "s", "t", "rnk").collect()
        // stringify the score: NaN != NaN under boxed equality, which
        // would make set comparison fail on identical contents
        .map(r => (r.getLong(0), if (r.isNullAt(1)) "null" else r.getDouble(1).toString,
          r.getLong(2), r.getInt(3))).toSet
    assert(topk(PartialTopK(df, "g", "s", "t", 4)) === topk(df))
  }

  test("partial top-k alone keeps at most k rows per group per partition") {
    import spark.implicits._
    val df = (0 until 1000).map(i => (i % 7L, i.toDouble, i.toLong))
      .toDF("g", "s", "t").repartition(4)
    val kept = PartialTopK(df, "g", "s", "t", 2)
      .groupBy("g").agg(count(lit(1)).as("n"))
    // ≤ k × numPartitions per group, and the true top-2 always survive
    assert(kept.filter(col("n") > 2 * 4).count() === 0)
    val surviving = PartialTopK(df, "g", "s", "t", 2).select("s").collect()
      .map(_.getDouble(0)).toSet
    (0 until 7).foreach { g =>
      val top2 = (0 until 1000).filter(_ % 7 == g).map(_.toDouble).sorted.reverse.take(2)
      top2.foreach(v => assert(surviving(v), s"group $g lost top value $v"))
    }
  }
}
