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

  /** Metadata-level resize: recompute target dimensions preserving
    * aspect ratio, payload untouched (a real pipeline would hand the
    * (payload, target) pairs to the decoder batch). Pure column math —
    * no bytes move until the decode stage consumes them.
    */
  def resize(media: DataFrame, maxSide: Int = 128): DataFrame = {
    val scaleNum = lit(maxSide)
    val longSide = greatest(col("width"), col("height"))
    media
      .withColumn("scale_num", scaleNum)
      .withColumn("rs_width", ((col("width") * scaleNum) / longSide).cast("int"))
      .withColumn("rs_height", ((col("height") * scaleNum) / longSide).cast("int"))
      .drop("scale_num")
  }

  /** Frame sampling for audio/video-like payloads: split the byte
    * stream into fixed-size frames and keep every `stride`-th one —
    * the Spark-side plumbing (explode with positional index, pruned
    * payload slices) is real; a codec would replace `substring`.
    */
  def frameSample(media: DataFrame, frameBytes: Int = 32, stride: Int = 4): DataFrame = {
    val nFrames = ceil(length(col("payload")) / lit(frameBytes.toDouble)).cast("int")
    // sequence(0, -1) would DESCEND ([0,-1]) on an empty payload
    val idx = when(nFrames > 0, sequence(lit(0), nFrames - 1))
      .otherwise(array().cast("array<int>"))
    media
      .withColumn("frame_idx", explode(idx))
      .filter(col("frame_idx") % stride === 0)
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        expr(s"substring(payload, cast(frame_idx * $frameBytes + 1 as int), $frameBytes)")
          .as("frame"))
      .withColumn("frame_len", length(col("frame")).cast("long"))
  }
}
