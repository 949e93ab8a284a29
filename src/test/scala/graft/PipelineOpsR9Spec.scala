package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{TextAnalysis, TrainingMix}

/** Invariants for the second-wave r9 pipeline operators: DSIR
  * importance weights, CCNet perplexity terciles, and the
  * deterministic shard shuffle.
  */
class PipelineOpsR9Spec extends AnyFunSuite {
  import SparkSuite._

  test("shard shuffle is a permutation: dense per-shard positions, every doc once") {
    val s = TrainingMix.shardShuffle(spark, Sf)
    val nDocs = Tables.documents(spark, Sf).count()
    assert(s.count() === nDocs)
    assert(s.select("doc_id").distinct().count() === nDocs)
    // positions within each shard are exactly 1..n_shard (dense, no
    // gaps, no repeats): max pos == count == distinct pos count
    val byShard = s.groupBy("shard")
      .agg(count(lit(1)).as("n"), max("pos").as("mx"),
        countDistinct("pos").as("nd"), min("pos").as("mn"))
    assert(byShard.filter(col("mx") =!= col("n") || col("nd") =!= col("n")
      || col("mn") =!= 1L).count() === 0)
    // deterministic: a re-run under a different partitioning is identical
    val again = TrainingMix.shardShuffle(spark, Sf)
      .repartition(7).withColumnRenamed("pos", "pos2").withColumnRenamed("shard", "shard2")
    assert(s.join(again, "doc_id")
      .filter(col("pos") =!= col("pos2") || col("shard") =!= col("shard2"))
      .count() === 0)
  }

  test("shard shuffle is invariant in the prefix depth (the 100 TB knob)") {
    // deeper sub-bucketing re-sizes the sort partitions, never the result
    val d2 = TrainingMix.shardShuffle(spark, Sf, prefixChars = 2)
    val d4 = TrainingMix.shardShuffle(spark, Sf, prefixChars = 4)
      .withColumnRenamed("pos", "pos4").withColumnRenamed("shard", "shard4")
    assert(d2.join(d4, "doc_id")
      .filter(col("pos") =!= col("pos4") || col("shard") =!= col("shard4"))
      .count() === 0)
  }

  test("shard shuffle rank matches the direct per-shard sort") {
    // the bounded-offset formulation must equal a plain window over h
    import org.apache.spark.sql.expressions.Window
    val hx = "0123456789abcdef"
    val direct = Tables.documents(spark, Sf)
      .select(col("doc_id"), md5(col("doc_id").cast("string")).as("h"))
      .select(col("doc_id"), col("h"),
        (expr(s"instr('$hx', substring(h, 1, 1)) - 1") % 8).cast("long").as("shard"))
      .withColumn("pos_direct", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))).cast("long"))
    val s = TrainingMix.shardShuffle(spark, Sf)
    assert(s.join(direct, Seq("doc_id", "shard"))
      .filter(col("pos") =!= col("pos_direct")).count() === 0)
  }

  test("dsir separates target from off-target where the evidence is") {
    val top = TextAnalysis.dsirWeights(spark, Sf).collect()
    assert(top.length === 20)
    // scores are a proper descending ranking
    val scores = top.map(_.getDouble(3))
    assert(scores.sameElements(scores.sorted.reverse))
    // on this corpus the STRONG evidence is negative (off-target docs
    // carry distinctly non-en tokens; en docs mostly share vocabulary),
    // so the information-bearing tail is the bottom: rank ascending and
    // the worst docs must be overwhelmingly non-en
    val bottom = TextAnalysis.dsirWeights(spark, Sf, topK = 500).collect()
      .sortBy(_.getDouble(3)).take(20)
    val enBottom = bottom.count(_.getString(1) == "en").toDouble / bottom.length
    assert(enBottom <= 0.2, s"${enBottom * 100}% of the worst DSIR docs are en")
  }

  test("dsir mean score orders languages: the target lang scores highest") {
    def meanByLang(target: String): Map[String, Double] =
      TextAnalysis.dsirWeights(spark, Sf, targetLang = target, topK = 500)
        .groupBy("lang")
        .agg((sum(col("dsir_score") * col("n_toks")) / sum("n_toks")).as("m"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val en = meanByLang("en")
    assert(en.keys.forall(l => en("en") >= en(l)),
      s"en-target per-token mean should peak at en: $en")
    val de = meanByLang("de")
    assert(de.keys.forall(l => de("de") >= de(l)),
      s"de-target per-token mean should peak at de: $de")
  }

  test("dsir direction survives finer feature resolution (bucketChars=3)") {
    val en = TextAnalysis.dsirWeights(spark, Sf, topK = 500, bucketChars = 3)
      .groupBy("lang")
      .agg((sum(col("dsir_score") * col("n_toks")) / sum("n_toks")).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(en.keys.forall(l => en("en") >= en(l)),
      s"en-target per-token mean should peak at en at 4096 buckets: $en")
  }

  test("ppl buckets form exact terciles and conserve docs and tokens") {
    val b = TextAnalysis.pplBuckets(spark, Sf)
    val nDocs = Tables.documents(spark, Sf).count()
    val agg = b.agg(sum("n_docs"), sum("n_toks")).head()
    assert(agg.getLong(0) === nDocs)
    // tercile sizes are n/3 ± ties: each bucket within 10% of a third
    val perBucket = b.groupBy("bucket").agg(sum("n_docs").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perBucket.keySet === Set("head", "middle", "tail"))
    perBucket.values.foreach(n =>
      assert(math.abs(n - nDocs / 3.0) <= nDocs * 0.1, s"bucket sizes $perBucket"))
    // score ranges are ordered: tail < middle < head (no overlap)
    val rng = b.groupBy("bucket")
      .agg(min("score_min").as("lo"), max("score_max").as("hi")).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(rng("tail")._2 <= rng("middle")._1)
    assert(rng("middle")._2 <= rng("head")._1)
  }
}
