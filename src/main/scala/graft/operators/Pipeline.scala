package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.TextFunctions.tokens

/** The end-to-end curation pipeline a 100 TB corpus owner actually
  * runs: clean/score → language agreement → Gopher repetition rules →
  * near-dup drop list → weighted mix → token-budget shard packing —
  * composed so every per-document decision is computed in ONE corpus
  * scan (PipelineSpec asserts the single-scan, zero-shuffle plan of the
  * decision stage), with only the (tiny) drop list joining in from the
  * banded MinHash chain.
  *
  * This generalizes the q_dataset_card scan-sharing pattern across the
  * whole keep/drop surface: at 100 TB the difference between one scan
  * and four is the pipeline's cost, and every stage here is the same
  * code path its standalone graded query uses (quality = text_quality,
  * langid = text_langid, gopher = text_gopher, mix = q_mix_weighted,
  * drops = dedup_drop, packing = q_pack_sequences).
  */
object Pipeline {

  /** Per-document curation metrics — ONE scan, no joins, no shuffle:
    * token count, quality sigmoid, predicted language, Gopher keep,
    * and the consistent-hash mix decision, all per-row column math.
    */
  def scanDecisions(spark: SparkSession, dir: String): DataFrame =
    scanWith(spark, dir, keepToks = false)

  /** The decision scan, optionally carrying the token array through so
    * a downstream budget pass (the BPE packer) stays in the SAME
    * single scan instead of re-reading the corpus.
    */
  private def scanWith(spark: SparkSession, dir: String,
      keepToks: Boolean): DataFrame = {
    val wIdx = pmod(substring(col("source"), 4, 16).cast("int"), lit(4))
    val thr = element_at(
      array(lit("40000000"), lit("80000000"), lit("c0000000"), lit("zzzzzzzz")),
      wIdx + 1)
    val cols = Seq(col("doc_id"), col("lang"), col("source"),
      size(tokens(col("text"))).cast("long").as("n_toks"),
      TextAnalysis.predLang(col("text")).as("pred_lang"),
      TextAnalysis.qualityScore(col("text")).as("quality"),
      TextAnalysis.gopherStats(col("text")).getField("keep").as("gopher_keep"),
      (substring(md5(concat(col("source"), lit(":"), col("doc_id").cast("string"))),
        1, 8) < thr).as("mix_kept"))
    val selected = if (keepToks) cols :+ tokens(col("text")).as("toks") else cols
    Tables.fanOut(Tables.documents(spark, dir)).select(selected: _*)
  }

  /** The composed keep decision per document: quality ≥ threshold ∧
    * langid agreement ∧ Gopher keep ∧ not near-dup-dropped ∧ mix-kept.
    * The drop list is verified near-dups only — corpus-tiny, so AQE
    * broadcasts the left join.
    */
  def docDecisions(spark: SparkSession, dir: String,
      minQuality: Double = 0.4): DataFrame =
    decisionsTok(spark, dir, minQuality, bpeBudget = false)

  /** The composed keep decision with the packing token counter
    * selectable: whitespace (`bpeBudget = false`, the graded default)
    * or the committed BPE artifact (r13, r12 verdict #3 — the trainer
    * consumes TOKENIZER tokens; the keep decision itself is identical,
    * only what n_toks COUNTS switches). The BPE pass rides the same
    * single decision scan (the token array is carried through, never a
    * second corpus read).
    */
  private def decisionsTok(spark: SparkSession, dir: String,
      minQuality: Double, bpeBudget: Boolean): DataFrame = {
    // single-pass consumer: skip the chain's eager barrier (the r5
    // unconditional barrier doubled pipeline_filter under the driver)
    val drops = Dedup.dropDecisions(spark, dir, eagerCand = false).select(col("drop_doc"))
    val scan =
      if (!bpeBudget) scanWith(spark, dir, keepToks = false)
      else TextAnalysis.addBpeTokenCount(scanWith(spark, dir, keepToks = true),
          "toks", "n_bpe")
        .drop("toks", "n_toks")
        .withColumnRenamed("n_bpe", "n_toks")
    scan
      .join(drops, col("doc_id") === col("drop_doc"), "left")
      .withColumn("kept",
        when(col("quality") >= minQuality && col("pred_lang") === col("lang")
          && col("gopher_keep") === 1 && col("drop_doc").isNull && col("mix_kept"),
          1L).otherwise(0L))
      .select("doc_id", "source", "n_toks", "kept")
  }

  /** The pipeline's product: surviving documents greedily packed into
    * token-budget training shards per source (deterministic — the
    * trainer rebuilds the shard map from (source, doc_id) alone),
    * reported as per-shard stats. Packing shuffles once, on `source`
    * (the window key); everything upstream is the one decision scan
    * plus the broadcast drop list.
    */
  def run(spark: SparkSession, dir: String, minQuality: Double = 0.4,
      budget: Long = TrainingMix.ShardBudget,
      bpeBudget: Boolean = false): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    decisionsTok(spark, dir, minQuality, bpeBudget)
      .filter(col("kept") === 1)
      .withColumn("cum_before", coalesce(sum(col("n_toks")).over(w), lit(0L)))
      .withColumn("shard", floor(col("cum_before") / lit(budget.toDouble)).cast("long"))
      .groupBy(col("source"), col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
  }

  /** Materialize the pipeline: write surviving docs shard-partitioned
    * (source=…/shard=…) so the trainer's reader prunes by directory.
    */
  def writeShards(spark: SparkSession, dir: String, outPath: String,
      minQuality: Double = 0.4, budget: Long = TrainingMix.ShardBudget,
      bpeBudget: Boolean = false): Unit = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val kept = decisionsTok(spark, dir, minQuality, bpeBudget)
      .filter(col("kept") === 1)
      .withColumn("cum_before", coalesce(sum(col("n_toks")).over(w), lit(0L)))
      .withColumn("shard", floor(col("cum_before") / lit(budget.toDouble)).cast("long"))
      .select("doc_id", "source", "shard", "n_toks")
    kept.join(Tables.documents(spark, dir).select("doc_id", "text"), "doc_id")
      .write.mode("overwrite").partitionBy("source", "shard").parquet(outPath)
  }
}
