package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.TextAnalysis
import graft.sources.Ingest

/** Live training-data ingestion: a document stream is quality-filtered
  * in-flight (the same per-row quality/langid projections the batch
  * pipeline_filter uses — stateless, so the stream holds no state) and
  * appended to the corpus idempotently per micro-batch via the
  * anti-join in Ingest.appendCorpus.
  *
  * The combination gives exactly-once corpus growth under BOTH failure
  * modes: the file source's checkpoint dedupes re-read source files,
  * and the content-level anti-join dedupes re-delivered doc_ids across
  * batches (a re-crawled document arriving in a later file does not
  * duplicate). One code path with the batch filter — at 100 TB the
  * backfill and the live tail run the same projections.
  */
object DocStream {

  /** The in-flight keep rule (stateless — mirrors pipeline_filter's
    * quality ∧ langid-agreement stages; the near-dup stage needs corpus
    * state and runs downstream in batch).
    */
  def qualityFilter(docs: DataFrame, minQuality: Double = 0.4): DataFrame =
    docs
      .withColumn("quality", TextAnalysis.qualityScore(col("text")))
      .withColumn("pred_lang", TextAnalysis.predLang(col("text")))
      .filter(col("quality") >= minQuality && col("pred_lang") === col("lang"))
      .drop("quality", "pred_lang")

  /** Per-row DSIR score from a batch-trained bucket LUT — the
    * importance-resampling companion of [[qualityFilter]] and
    * EventStream.anomalyStream's batch-trained-stats-into-stream
    * pattern. The ≤256-entry LUT (TextAnalysis.dsirLut, collected as
    * bounded model metadata) folds into a literal map, so scoring is a
    * stateless per-row projection: no explode, no join, no state store
    * — the stream shape a 100 TB live tail needs, and the identical
    * expression scores batch backfills (spec proves equality to the
    * batch explode+join formulation doc-for-doc).
    *
    * Buckets unseen at training time score 0 (no evidence either way —
    * the add-one-smoothed LUT covers every bucket the training corpus
    * produced, so this only triggers on genuinely novel vocabulary).
    */
  def dsirScore(lut: Array[(Long, Long)], bucketChars: Int = 2)
      (text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    // one MapType literal (not 2·|lut| expression nodes), so the knob
    // scales to the 16^4 regime without blowing up the plan
    require(lut.nonEmpty && lut.length <= 65536, s"dsir LUT has ${lut.length} entries")
    require(lut.length <= math.pow(16, bucketChars).toLong,
      s"dsir LUT has ${lut.length} entries but bucketChars=$bucketChars addresses only " +
        s"${math.pow(16, bucketChars).toLong} buckets — LUT trained at a deeper resolution?")
    val m = typedlit(lut.toMap)
    val perTok = transform(graft.functions.TextFunctions.tokens(text),
      t => coalesce(element_at(m, TextAnalysis.dsirBucket(t, bucketChars)), lit(0L)))
    aggregate(perTok, lit(0L), (acc, x) => acc + x).as("dsir_e6")
  }

  /** In-flight domain selection: keep stream docs whose DSIR log weight
    * clears `minScoreE6` (integerized 1e6, matching the LUT).
    * `bucketChars` must match the resolution the LUT was trained at
    * (forwarded to dsirScore, whose capacity require catches a LUT
    * deeper than the depth scored here).
    */
  def dsirFilter(docs: DataFrame, lut: Array[(Long, Long)],
      minScoreE6: Long, bucketChars: Int = 2): DataFrame =
    docs.withColumn("dsir_e6", dsirScore(lut, bucketChars)(col("text")))
      .filter(col("dsir_e6") >= minScoreE6)

  /** Stream documents into the corpus: filter in-flight, then append
    * only never-seen doc_ids per micro-batch.
    */
  def ingestStream(spark: SparkSession, docs: DataFrame, corpusPath: String,
      checkpoint: String, minQuality: Double = 0.4): StreamingQuery =
    qualityFilter(docs, minQuality)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Ingest.appendCorpus(batch, corpusPath): Unit
      }
      .start()
}
