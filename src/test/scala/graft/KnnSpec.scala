package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{IvfIndex, KnnSearch}

class KnnSpec extends AnyFunSuite {
  import SparkSuite._

  test("topK: the query vector is its own nearest neighbor (unit norms)") {
    val top = KnnSearch.topK(spark, Sf).collect()
    assert(top.head.getAs[Long]("vec_id") === 0L)
    val scores = top.map(_.getAs[Double]("score"))
    assert(scores.sameElements(scores.sortBy(-_.toDouble)), "scores not descending")
  }

  test("knnJoin returns exactly k rows per query with ranks 1..k") {
    val k = KnnSearch.knnJoin(spark, Sf, k = 5)
    val per = k.groupBy("query_id").agg(count(lit(1)).as("n"), max("rnk").as("mx"))
    assert(per.filter(col("n") =!= 5 || col("mx") =!= 5).count() === 0)
  }

  test("rangeSearch scores respect the threshold") {
    assert(KnnSearch.rangeSearch(spark, Sf).filter(col("score") < 0.249999).count() === 0)
  }

  test("rerank labels follow logit thresholds") {
    val r = KnnSearch.rerank(spark, Sf)
    assert(r.filter(col("label") === "green" && col("logit") < 2.0).count() === 0)
    assert(r.filter(col("label") === "red" && col("logit") >= 0.5).count() === 0)
    assert(r.count() === 20)
  }

  test("IVF assignment covers every vector exactly once") {
    val a = IvfIndex.assign(spark, Sf)
    val n = Tables.embeddings(spark, Sf).count()
    assert(a.count() === n)
    assert(a.select("vec_id").distinct().count() === n)
  }

  test("IVF search results all come from probed clusters and rank <= brute force") {
    val ivf = IvfIndex.search(spark, Sf).collect()
    assert(ivf.length === 10)
    // every IVF hit must appear in the brute-force scoring with same score
    val brute = KnnSearch.topK(spark, Sf, k = 500).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("score")).toMap
    ivf.foreach { r =>
      val v = r.getAs[Long]("vec_id")
      assert(math.abs(brute(v) - r.getAs[Double]("score")) < 1e-9)
    }
  }
}
