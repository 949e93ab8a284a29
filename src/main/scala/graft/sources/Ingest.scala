package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.Chunker

/** Ingest surface (SURVEY.md §1 step 1-2, the Spark re-expression of
  * the reference's crawl→parse→markdown ingest): read raw document
  * batches from JSONL / CSV / plain text, normalize into the canonical
  * documents schema, and write the corpus partitioned for downstream
  * pruning.
  *
  * Scale: schema is supplied explicitly (no inference pass over 100 TB)
  * and cleaning is per-row column math; the partitioned writer gives
  * `lang=` directory pruning to every downstream lang-filtered query.
  */
object Ingest {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType)))

  /** Cleanup + derived columns shared by all formats. */
  def normalize(raw: DataFrame): DataFrame =
    raw.withColumn("text", Chunker.cleanText(col("text")))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .filter(col("text").isNotNull && length(col("text")) > 0)

  def fromJsonl(spark: SparkSession, path: String): DataFrame =
    normalize(spark.read.schema(docSchema).json(path))

  def fromCsv(spark: SparkSession, path: String): DataFrame =
    normalize(spark.read.option("header", "true").schema(docSchema).csv(path))

  /** Plain-text lines: one document per line, synthetic ids. */
  def fromText(spark: SparkSession, path: String, source: String): DataFrame =
    normalize(spark.read.text(path)
      .select(monotonically_increasing_id().as("doc_id"),
        col("value").as("text"), lit("und").as("lang"), lit(source).as("source")))

  /** Canonical corpus layout: parquet partitioned by lang. */
  def writeCorpus(docs: DataFrame, path: String): Unit =
    docs.write.mode("overwrite").partitionBy("lang").parquet(path)
}
