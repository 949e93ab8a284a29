package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.Bucketing

class BucketingSpec extends AnyFunSuite {
  import SparkSuite._

  test("join of co-bucketed tables runs without any Exchange") {
    val li = Tables.lineitem(spark, Sf).select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, Sf).select("o_orderkey", "o_totalprice")
    Bucketing.writeBucketed(li, "li_b", "l_orderkey")
    Bucketing.writeBucketed(o, "o_b", "o_orderkey")
    // force the shuffle-join path: broadcast would make bucketing moot
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = Bucketing.bucketedJoin(spark, "li_b", "o_b", "l_orderkey", "o_orderkey")
        .filter(col("l_quantity") > 0) // force a real plan, not a count-only shortcut
      val n = j.count()
      assert(n === li.join(o, li("l_orderkey") === o("o_orderkey")).count())
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS o_b")
    }
  }
}
