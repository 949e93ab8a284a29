package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.BloomFilter

/** Bloom aggregator + relational probe: no false negatives, bounded
  * false positives, partitioning-invariant build, and the incremental
  * dedup helper must equal the plain anti-join exactly.
  */
class BloomFilterSpec extends AnyFunSuite {
  import SparkSuite._

  private val M = 1 << 16
  private val K = 5

  test("no false negatives: every inserted key probes true") {
    val docs = Tables.documents(spark, Sf).select(col("doc_id"))
    val bits = BloomFilter.build(docs, col("doc_id"), M, K)
    assert(docs.filter(!BloomFilter.mightContain(bits, col("doc_id"), M, K)).count() === 0)
  }

  test("false-positive rate on disjoint keys stays near theory") {
    import spark.implicits._
    val docs = Tables.documents(spark, Sf).select(col("doc_id"))
    val n = docs.count()
    val bits = BloomFilter.build(docs, col("doc_id"), M, K)
    val probeN = 20000
    val disjoint = (1 to probeN).map(i => 1000000L + i).toDF("doc_id")
    val fp = disjoint.filter(BloomFilter.mightContain(bits, col("doc_id"), M, K)).count()
    val theory = math.pow(1.0 - math.exp(-K.toDouble * n / M), K)
    assert(fp.toDouble / probeN <= theory * 3 + 0.003,
      s"fp=${fp.toDouble / probeN} theory=$theory")
  }

  test("the bit array is partitioning-invariant (merge is a true OR-monoid)") {
    val docs = Tables.documents(spark, Sf).select(col("doc_id"))
    val a = BloomFilter.build(docs.repartition(7), col("doc_id"), M, K)
    val b = BloomFilter.build(docs.repartition(2), col("doc_id"), M, K)
    assert(a.toSeq === b.toSeq)
  }

  test("newAgainstCorpus equals the exact anti-join") {
    import spark.implicits._
    val existing = Tables.documents(spark, Sf).select(col("doc_id"))
    // incoming: half overlapping, half new
    val incoming = existing.limit(100)
      .unionByName((1 to 150).map(i => 2000000L + i).toDF("doc_id"))
    val got = BloomFilter.newAgainstCorpus(existing, incoming, "doc_id", M, K)
      .collect().map(_.getLong(0)).sorted.toSeq
    val want = incoming.join(existing, Seq("doc_id"), "left_anti")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got === want)
    assert(got.forall(_ >= 2000000L))
  }
}
