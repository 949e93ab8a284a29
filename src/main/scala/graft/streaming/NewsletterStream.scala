package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.Newsletter

/** Streaming variant of the reference's ingest front door: newly
  * downloaded HTML issues land in a directory; the file stream picks
  * each up exactly once (source checkpoint), converts HTML → markdown
  * and parses the categorized chunks IN-FLIGHT — both are stateless
  * per-row column ops, the same code path the batch Ingest.fromHtml /
  * Newsletter.parseNewsletter run, so backfill and live tail cannot
  * drift — and appends chunk rows to a parquet sink.
  *
  * At 100 TB-pipeline scale this is the shape you want: no state store
  * (nothing to grow), exactly-once from the source checkpoint + append
  * sink, and a parse that re-runs identically in batch for repair.
  * NewsletterStreamSpec proves stream ≡ batch on the same files and
  * exactly-once across restarts.
  */
object NewsletterStream {

  /** HTML directory → streaming chunk rows (doc_id, category, idx,
    * text, source, source_name, date). The file transform is
    * Ingest.htmlDocs — the batch reader's exact code path.
    */
  def chunkStream(spark: SparkSession, htmlPath: String): DataFrame = {
    val files = spark.readStream
      .format("text")
      .option("wholetext", "true")
      .load(htmlPath)
      .select(input_file_name().as("path"), col("value").as("html"))
    Newsletter.parseNewsletter(graft.sources.Ingest.htmlDocs(files),
      mdCol = "md_text", dateCol = "issue_date")
  }

  /** Run the ingest: append parsed chunks to `chunksPath`, exactly once
    * per source file.
    */
  def ingestStream(spark: SparkSession, htmlPath: String, chunksPath: String,
      checkpoint: String): StreamingQuery =
    chunkStream(spark, htmlPath)
      .writeStream
      .format("parquet")
      .option("path", chunksPath)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .start()
}
