package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{BatchedEncoder, BatchedScorer, IvfIndex, SearchApi}

/** searchIndexed: the full serving path (encoder seam → persisted
  * partition-pruned IVF index → scorer seam → filters) must equal the
  * brute-force [[SearchApi.search]] exactly when every cluster is
  * probed, degrade to a consistently-ranked subset at small nprobe,
  * and keep the partition pruning in the plan.
  */
class IndexedSearchSpec extends AnyFunSuite {
  import SparkSuite._

  private lazy val indexPath = {
    val p = java.nio.file.Files.createTempDirectory("graft-svc-idx").toString
    IvfIndex.writeIndex(spark, Sf, p)
    p
  }
  private lazy val nClusters =
    spark.read.parquet(s"$indexPath/centroids").count().toInt

  test("probing every cluster reproduces brute-force search exactly") {
    val brute = SearchApi.search(spark, Sf, "vector search data pipelines")
      .collect().toSeq
    val indexed = SearchApi.searchIndexed(spark, Sf, indexPath,
      "vector search data pipelines", nprobe = nClusters).collect().toSeq
    assert(brute.nonEmpty)
    assert(indexed === brute)
  }

  test("both model seams compose on the indexed path") {
    val a = SearchApi.searchIndexed(spark, Sf, indexPath, "distributed joins",
      nprobe = nClusters, minLogit = Some(-5.0), lang = Some("en"),
      encoder = new BatchedEncoder(batchSize = 3),
      scorer = new BatchedScorer(batchSize = 3)).collect().toSeq
    val b = SearchApi.search(spark, Sf, "distributed joins",
      minLogit = Some(-5.0), lang = Some("en")).collect().toSeq
    assert(a === b)
  }

  test("small nprobe returns a subset of the brute-force pool, ranked consistently") {
    // brute covers the WHOLE corpus so every returned id MUST be present
    // — Option.forall on a missing id would pass vacuously (ADVICE r7)
    val n = Tables.embeddings(spark, Sf).count().toInt
    val brute = SearchApi.search(spark, Sf, "vector search data pipelines",
      retrieveK = n).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val narrow = SearchApi.searchIndexed(spark, Sf, indexPath,
      "vector search data pipelines", nprobe = 2).collect()
    assert(narrow.nonEmpty)
    narrow.foreach { r =>
      val (id, score) = (r.getLong(0), r.getDouble(1))
      // every ANN hit is a real doc with the exact brute-force score
      assert(brute.contains(id), s"ANN returned unknown doc $id")
      assert(brute(id) === score, s"doc $id: ANN score $score != brute ${brute(id)}")
    }
    // rerank order is internally consistent (logit desc)
    val byRank = narrow.sortBy(_.getLong(5))
    assert(byRank.map(_.getDouble(2)).toSeq ===
      byRank.map(_.getDouble(2)).sortBy(-(_: Double)).toSeq)
  }

  test("the index scan prunes to the probed partitions") {
    val q = SearchApi.defaultEncoder.encodeQuery(spark, "partition pruning proof")
    val plan = IvfIndex.searchIndex(spark, indexPath, q, nprobe = 2, k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), s"no partition pruning in:\n$plan")
  }
}
