package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
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

  /** The NumSub codebooks collected into one literal column:
    * `array` (indexed by s+1) `of array<struct<code, cvec>>`. Codebooks
    * are index metadata (NumSub×NumCodes×SubDim floats — the thing a PQ
    * engine keeps in L1), never data.
    */
  private def codebookLiteral(spark: SparkSession, dir: String) = {
    val bySub = codebooks(spark, dir)
      .select(col("s"), col("code").cast("long"), col("cvec"))
      .collect()
      .groupBy(_.getInt(0))
    array((0 until NumSub).map { s =>
      array(bySub(s).sortBy(_.getLong(1)).map { r =>
        struct(lit(r.getLong(1)).as("code"), lit(r.getSeq[Float](2).toArray).as("cvec"))
      }.toIndexedSeq: _*)
    }: _*)
  }

  /** PQ encoding: nearest codeword per subspace (argmin d², tiebreak
    * code) → (vec_id, s, code). The codeword argmin is a per-row
    * `array_min` over (d², code) structs against the literal codebook of
    * subspace s — a map-side projection, no join, no window, no shuffle
    * of the corpus (struct ordering ≡ the oracle's
    * `row_number() OVER (ORDER BY d2, code) = 1`).
    */
  def encode(spark: SparkSession, dir: String): DataFrame = {
    val cb = codebookLiteral(spark, dir)
    subvectors(spark, dir)
      .withColumn("best", array_min(transform(element_at(cb, col("s") + 1), c =>
        struct(dist2(col("subvec"), c.getField("cvec")).as("d2"),
          c.getField("code").as("code")))))
      .select(col("vec_id"), col("s"), col("best.code").as("code"))
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
