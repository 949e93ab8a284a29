package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Dedup

class DedupSpec extends AnyFunSuite {
  import SparkSuite._

  lazy val lsh = Dedup.minhashLsh(spark, Sf).cache()
  lazy val jac = Dedup.ngramJaccard(spark, Sf).cache()

  test("LSH candidates include high-jaccard near-dup pairs") {
    assert(jac.filter(col("jaccard") >= 0.5).count() > 0,
      "planted near-dups (J>=0.8 exist in the corpus) not surfaced by LSH")
  }

  test("jaccard is within [0,1] and n_inter <= min shingle count") {
    assert(jac.filter(col("jaccard") < 0 || col("jaccard") > 1).count() === 0)
  }

  test("pairs are canonical (doc_a < doc_b) and unique") {
    assert(lsh.filter(col("doc_a") >= col("doc_b")).count() === 0)
    assert(lsh.count() === lsh.select("doc_a", "doc_b").distinct().count())
  }

  test("simhash near-dup pairs have low hamming and same lang") {
    val p = Dedup.simhashPairs(spark, Sf)
    assert(p.filter(col("hamming") > 8).count() === 0)
    assert(p.count() > 0)
  }

  test("exact chunk dedup finds duplicated chunks with copies > 1") {
    val e = Dedup.exactChunks(spark, Sf)
    assert(e.filter(col("n_copies") <= 1).count() === 0)
    assert(e.count() > 0)
  }

  test("connected components: edges stay within a component, id is the min member") {
    val comp = Dedup.components(spark, Sf).cache()
    val edges = Dedup.ngramJaccard(spark, Sf).filter(col("jaccard") >= 0.5)
      .select("doc_a", "doc_b")
    val ca = comp.select(col("doc_id").as("doc_a"), col("component").as("comp_a"))
    val cb = comp.select(col("doc_id").as("doc_b"), col("component").as("comp_b"))
    assert(edges.join(ca, "doc_a").join(cb, "doc_b")
      .filter(col("comp_a") =!= col("comp_b")).count() === 0)
    // component id is a member and the minimum of its group
    assert(comp.groupBy("component").agg(min("doc_id").as("mn"))
      .filter(col("component") =!= col("mn")).count() === 0)
  }

  test("embedding near-dup pairs are same-cluster with cos >= threshold") {
    val e = Dedup.embedCosine(spark, Sf)
    assert(e.filter(col("cos_sim") < 0.349999).count() === 0)
  }

  test("components with a reliable checkpoint dir matches the default and truncates lineage") {
    val ckpt = java.nio.file.Files.createTempDirectory("graft-comp-ckpt").toString
    val withCkpt = Dedup.components(spark, Sf, checkpointDir = Some(ckpt))
    val default = Dedup.components(spark, Sf)
    assert(withCkpt.collect().toSet === default.collect().toSet)
    // the loop's label plan was cut at the checkpoint: the final plan
    // reads the checkpointed RDD, not the unrolled join chain
    val plan = withCkpt.queryExecution.optimizedPlan.toString
    assert(plan.contains("LogicalRDD") || plan.contains("Scan ExistingRDD"), plan)
    // and the reliable checkpoint actually wrote to the requested dir
    val wrote = java.nio.file.Files.walk(java.nio.file.Path.of(ckpt))
      .filter(p => java.nio.file.Files.isRegularFile(p)).count()
    assert(wrote > 0, s"no checkpoint files under $ckpt")
  }
}
