package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Pipeline, TextAnalysis}

/** End-to-end pipeline composition: the per-document decision stage
  * shares ONE corpus scan (the q_dataset_card pattern generalized), and
  * the packed shards are exactly the survivors of the composed filter.
  */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  import SparkSuite.Sf

  test("decision stage is one scan, zero shuffle") {
    val plan = Pipeline.scanDecisions(spark, Sf).queryExecution.executedPlan.toString
    assert("FileScan|Scan parquet".r.findAllIn(plan).size == 1,
      s"expected exactly one corpus scan:\n$plan")
    // Tables.fanOut's RoundRobin repartition (input-split widening for
    // the single-file test tables) is the one allowed Exchange; no
    // key-hash shuffle may appear
    assert("Exchange (?!RoundRobinPartitioning)".r.findAllIn(plan).isEmpty,
      s"decision scan must not key-shuffle:\n$plan")
  }

  test("shards partition the survivors and respect the budget greedily") {
    val decisions = Pipeline.docDecisions(spark, Sf).cache()
    val shards = Pipeline.run(spark, Sf).cache()
    val keptDocs = decisions.filter(col("kept") === 1)
    // every kept doc lands in exactly one shard; token totals conserved
    assert(shards.agg(sum("n_docs")).head().getLong(0) == keptDocs.count())
    assert(shards.agg(sum("n_tokens")).head().getLong(0) ==
      keptDocs.agg(sum("n_toks")).head().getLong(0))
    // greedy packing: shard indexes per source are contiguous from 0
    val bySource = shards.groupBy("source")
      .agg(min("shard").as("lo"), max("shard").as("hi"), count(lit(1)).as("n"))
    assert(bySource.filter(col("lo") =!= 0 || col("hi") =!= col("n") - 1).count() == 0)
    // doc ranges of consecutive shards never overlap (deterministic order)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("shard")
    val overl = shards.withColumn("prev_last", lag("last_doc", 1).over(w))
      .filter(col("prev_last").isNotNull && col("first_doc") <= col("prev_last"))
    assert(overl.count() == 0)
    decisions.unpersist(); shards.unpersist()
  }

  test("r13: the BPE-budget flag switches the packing counter, not the decisions") {
    val ws = Pipeline.run(spark, Sf)
    val bpe = Pipeline.run(spark, Sf, bpeBudget = true)
    // decisions are identical: both pack exactly the kept docs
    assert(ws.agg(sum("n_docs")).head().getLong(0) ===
      bpe.agg(sum("n_docs")).head().getLong(0))
    // the committed documents head fully merges under the artifact
    // (BpeSpec pins that), so on THIS corpus the budgets coincide —
    // the flag's counter is proven live on the identifier corpus by
    // q_pack_bpe's graded divergence; here we pin the plumbing: the
    // materialized layout equals the reported stats under the flag
    val out = java.nio.file.Files.createTempDirectory("graft-shards-bpe").toString
    Pipeline.writeShards(spark, Sf, out, bpeBudget = true)
    val written = spark.read.parquet(out)
      .withColumn("shard", col("shard").cast("long"))
      .groupBy(col("source"), col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sorted.toSeq
    val stats = bpe
      .select(col("source"), col("shard"), col("n_docs"), col("n_tokens"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sorted.toSeq
    assert(written === stats)
  }

  test("composed decision agrees with the standalone stages") {
    val d = Pipeline.docDecisions(spark, Sf)
    val q = TextAnalysis.quality(spark, Sf).select(col("doc_id"), col("quality"))
    val drops = Dedup.dropDecisions(spark, Sf).select(col("drop_doc"))
    // any doc kept by the pipeline must pass the standalone quality
    // query's threshold and be absent from the standalone drop list
    val joined = d.filter(col("kept") === 1)
      .join(q, "doc_id")
      .join(drops, col("doc_id") === col("drop_doc"), "left")
    assert(joined.filter(col("quality") < 0.4 || col("drop_doc").isNotNull).count() == 0)
  }
}
