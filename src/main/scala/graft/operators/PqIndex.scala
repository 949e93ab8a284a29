package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.VectorFunctions._

/** Product quantization (SURVEY.md §9 → done): the 64-dim space is
  * split into `NumSub` 16-dim subspaces, each with a `NumCodes`-entry
  * codebook; a vector compresses to NumSub byte codes (16× smaller than
  * float32). Search scores against the codebook reconstruction
  * (asymmetric distance computation) — at scale the per-query
  * code→partial-score lookup table is broadcast and the corpus scan
  * reads only the code columns.
  *
  * Codebooks here are deterministic data samples (ids c*17, the PQ
  * analogue of IvfIndex's seed centroids; k-means per subspace is the
  * production refinement), which keeps the whole pipeline
  * oracle-checkable.
  */
object PqIndex {

  val NumSub = 4
  val SubDim = 16
  val NumCodes = 16

  /** (s, code, cvec): subspace codebooks sampled from the corpus. */
  def codebooks(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val subs = broadcast((0 until NumSub).toDF("s"))
    Tables.embeddings(spark, dir)
      .filter(col("vec_id") % 17 === 0 && col("vec_id") < NumCodes * 17)
      .select(expr("vec_id div 17").as("code"), col("embedding"))
      .crossJoin(subs)
      .select(col("s"), col("code"),
        expr(s"slice(embedding, s * $SubDim + 1, $SubDim)").as("cvec"))
  }

  /** (vec_id, s, subvec): corpus split into subvectors. */
  private def subvectors(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val subs = broadcast((0 until NumSub).toDF("s"))
    Tables.fanOut(Tables.embeddings(spark, dir).select("vec_id", "embedding"))
      .crossJoin(subs)
      .select(col("vec_id"), col("s"),
        expr(s"slice(embedding, s * $SubDim + 1, $SubDim)").as("subvec"))
  }

  /** PQ encoding: nearest codeword per subspace (argmin d², tiebreak
    * code) → (vec_id, s, code).
    */
  def encode(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("vec_id"), col("s"))
      .orderBy(col("d2").asc, col("code").asc)
    subvectors(spark, dir)
      .join(broadcast(codebooks(spark, dir)), "s")
      .withColumn("d2", dist2(col("subvec"), col("cvec")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("vec_id", "s", "code")
  }

  /** Two-stage ANN: PQ approximate scores select a candidate set
    * (ordered on the exact integer partial sums — fully deterministic),
    * then only the candidates are re-ranked with the exact dot product.
    * At scale stage one reads byte codes only; the float vectors are
    * fetched for `candidates` rows, not the corpus.
    */
  def searchRerank(spark: SparkSession, dir: String, candidates: Int = 50,
      k: Int = 10): DataFrame = {
    val (q, approx) = approxScores(spark, dir)
    val cand = approx
      .orderBy(col("approx_e9").desc, col("vec_id").asc)
      .limit(candidates)
    cand.join(Tables.embeddings(spark, dir).select("vec_id", "embedding"), "vec_id")
      .crossJoin(broadcast(q))
      .withColumn("exact", dot(col("embedding"), col("qvec")))
      .orderBy(col("exact").desc, col("vec_id").asc)
      .limit(k)
      .select(col("vec_id"), r6(col("exact")).as("exact_score"),
        r6(col("approx_e9") / 1e9).as("approx_score"))
  }

  /** Query projection + ADC lookup table + per-vector approx integer
    * scores — shared by both search surfaces.
    */
  private def approxScores(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val q = Tables.embeddings(spark, dir).filter(col("vec_id") === 0)
      .select(col("embedding").as("qvec"))
    val lut = codebooks(spark, dir).crossJoin(broadcast(q))
      .select(col("s"), col("code"),
        dot(expr(s"slice(qvec, s * $SubDim + 1, $SubDim)"), col("cvec")).as("part"))
    val approx = encode(spark, dir)
      .join(broadcast(lut), Seq("s", "code"))
      .groupBy(col("vec_id"))
      .agg(sum(cents(col("part"), 1e9)).as("approx_e9"))
    (q, approx)
  }

  /** Asymmetric-distance scoring against query vec 0: the approximate
    * dot product is Σ_s dot(q_s, codeword(s, code_s)); reported next to
    * the exact score and the absolute quantization error.
    */
  def search(spark: SparkSession, dir: String): DataFrame = {
    val (q, approx0) = approxScores(spark, dir)
    val approx = approx0.withColumn("approx_score", col("approx_e9") / 1e9)
    val exact = Tables.embeddings(spark, dir).select("vec_id", "embedding")
      .crossJoin(broadcast(q))
      .select(col("vec_id"), dot(col("embedding"), col("qvec")).as("exact_score"))
    approx.join(exact, "vec_id")
      .select(col("vec_id"),
        r6(col("approx_score")).as("approx_score"),
        r6(col("exact_score")).as("exact_score"),
        r6(abs(col("approx_score") - col("exact_score"))).as("abs_err"))
  }
}
