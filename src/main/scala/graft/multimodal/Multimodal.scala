package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal column plumbing (SURVEY.md §2-G): treat media as opaque
  * `binary` payloads with typed metadata, and run the (stubbed) decoder
  * batch-wise per partition — the exact shape a real image/audio model
  * UDF needs (schema, partitioning, batch size), with the model call
  * replaced by a deterministic fake since no media libs ship in this
  * environment.
  *
  * Scale: the payload column is only materialized inside the decode
  * stage (never shuffled wide); metadata filters prune at the parquet
  * scan before bytes are read.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte], width: Int, height: Int)
  case class MediaFeatures(doc_id: Long, byte_len: Long, width: Long, height: Long,
      feat_sum: Long, n_batch: Long)

  val BatchSize = 64

  /** Attach a binary payload + typed metadata to each document (stand-in
    * for reading real image bytes; deterministic).
    */
  def withBinary(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      ((col("n_chars") % 64) * 10 + 10).cast("int").as("width"),
      ((col("n_chars") % 48) * 10 + 10).cast("int").as("height"))

  /** STUB decoder: a real implementation would decode image bytes and
    * run a vision model per batch; here it derives deterministic
    * features from the raw bytes. The batching shape (partition iterator
    * → fixed-size batches → per-batch "model call") is real.
    */
  private def decodeBatch(batch: Seq[MediaRow]): Seq[MediaFeatures] =
    batch.map { r =>
      val head = r.payload.take(16)
      MediaFeatures(r.doc_id, r.payload.length.toLong, r.width.toLong, r.height.toLong,
        head.map(_.toLong & 0xff).sum, batch.size.toLong)
    }

  /** Batched partition-wise feature extraction over the binary column. */
  def decodeFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media: Dataset[MediaRow] = withBinary(Tables.documents(spark, dir)).as[MediaRow]
    media.mapPartitions(it => it.grouped(BatchSize).flatMap(decodeBatch))
      .toDF()
  }
}
