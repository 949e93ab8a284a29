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
