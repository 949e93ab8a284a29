package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions.r6

/** Document ingest/chunk pipeline (SURVEY.md §2-B), the Spark
  * re-expression of the reference's markdown→chunks step
  * (reference pipeline/utils.py:93-187 parse_newsletter,
  * pipeline/embeddings_assets.py:79-88 tabulate).
  *
  * All steps are narrow (per-row explode/map) — embarrassingly parallel,
  * no shuffle except where a per-category index genuinely requires one.
  */
object Chunker {

  val ChunkWords = 20

  /** Split each document into fixed-size word chunks with
    * (doc_id, chunk_idx, chunk_hash, n_words). The chunk text is carried
    * as md5 so the verify output stays compact; `chunkedText` below
    * exposes the raw text variant for downstream embedding.
    */
  def chunk(spark: SparkSession, dir: String): DataFrame =
    chunkedText(Tables.documents(spark, dir))
      .select(col("doc_id"), col("chunk_idx"), md5(col("chunk_text")).as("chunk_hash"),
        col("n_words"))

  /** Raw chunk rows (doc_id, chunk_idx, chunk_text, n_words). */
  def chunkedText(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val nChunks = ceil(size(toks) / lit(ChunkWords.toDouble)).cast("long")
    docs
      .select(col("doc_id"), toks.as("toks"), nChunks.as("nc"))
      .select(col("doc_id"), col("toks"),
        // sequence(0, -1) would DESCEND on an empty doc — guard to []
        explode(when(col("nc") > 0, sequence(lit(0L), col("nc") - 1))
          .otherwise(array().cast("array<long>"))).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        concat_ws(" ",
          slice(col("toks"), (col("chunk_idx") * ChunkWords + 1).cast("int"), lit(ChunkWords)))
          .as("chunk_text"),
        size(slice(col("toks"), (col("chunk_idx") * ChunkWords + 1).cast("int"), lit(ChunkWords)))
          .cast("long").as("n_words"))
  }

  /** Content-defined chunking: a cut point opens wherever the rolling
    * hash of the local token window hits the boundary condition — here,
    * first md5 nibble of (previous token ⊕ current token) < 2, i.e.
    * boundary probability 1/8 → ~8-token expected chunks. Unlike
    * fixed-size chunking, CDC boundaries re-synchronize after an
    * insertion/deletion, so chunk-level dedup still matches the
    * unchanged remainder of an edited document (the rsync/LBFS
    * property; ChunkerSpec proves it).
    *
    * Shape: posexplode → lag + running-sum windows partitioned by
    * doc_id (the sessionize pattern on text) → per-chunk aggregate.
    * One shuffle on doc_id — chunking genuinely needs doc-local order.
    */
  def chunkCdc(spark: SparkSession, dir: String): DataFrame =
    cdcChunks(Tables.fanOut(Tables.documents(spark, dir)))

  /** CDC over any (doc_id, text) DataFrame — split out so specs can
    * feed edited documents and assert boundary re-synchronization.
    */
  def cdcChunks(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val wCum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
      .withColumn("prev", lag(col("tok"), 1).over(w))
      .withColumn("bound",
        when(col("prev").isNotNull &&
          expr("instr('0123456789abcdef', substring(md5(concat(prev, ' ', tok)), 1, 1))") <= 2,
          1L).otherwise(0L))
      .withColumn("chunk_idx", sum(col("bound")).over(wCum))
      .groupBy(col("doc_id"), col("chunk_idx"))
      .agg(count(lit(1)).as("n_words"),
        md5(concat_ws(" ",
          transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
            x => x.getField("tok")))).as("chunk_hash"))
  }

  /** Sectionize/categorize: deterministic category tag (idea / quote /
    * question — the reference's chunk categories, utils.py:106-185)
    * derived from the first token's md5 nibble, per-category running
    * index, metadata propagation (source, lang).
    */
  def parse(spark: SparkSession, dir: String): DataFrame = {
    val first = element_at(tokens(col("text")), 1)
    val nib = expr("instr('0123456789abcdef', substring(md5(first_tok), 1, 1)) - 1")
    val cat = when(col("nib") % 3 === 0, "idea")
      .when(col("nib") % 3 === 1, "quote")
      .otherwise("question")
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("lang"), first.as("first_tok"))
      .withColumn("nib", nib)
      .withColumn("category", cat)
      .withColumn("cat_idx",
        row_number().over(Window.partitionBy(col("category")).orderBy(col("doc_id"))).cast("long"))
      .select("doc_id", "category", "cat_idx", "source", "lang")
  }

  /** Text cleanup: strip markdown link markup `[label](url)` → label,
    * collapse whitespace runs, trim (reference utils.py:83-90
    * clean_links / trim_empty_lines).
    */
  def cleanText(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    trim(regexp_replace(
      regexp_replace(text, "\\[([^\\]]*)\\]\\([^)]*\\)", "$1"),
      "\\s+", " "))

  def clean(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), md5(cleanText(col("text"))).as("clean_hash"),
        length(cleanText(col("text"))).cast("long").as("n_chars_clean"))

  /** Corpus stats per source (the tabulate step): doc counts, char
    * volume, averages, language spread. Map-side partial agg only.
    */
  def stats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"), col("lang"), col("n_chars"), size(tokens(col("text"))).cast("long").as("n_toks"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("lang")).as("n_langs"),
        sum(col("n_chars")).as("sum_chars"),
        sum(col("n_toks")).as("sum_toks"))
      .withColumn("avg_chars", r6(col("sum_chars") / (lit(1.0) * col("n_docs"))))
      .withColumn("avg_toks", r6(col("sum_toks") / (lit(1.0) * col("n_docs"))))
      .select("source", "n_docs", "n_langs", "sum_chars", "sum_toks", "avg_chars", "avg_toks")
}
