package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions.tokens
import graft.functions.VectorFunctions._

/** End-to-end search facade mirroring the reference's user surface
  * (reference query.py:50-97 / mcp_server.py:80-215): encode the query
  * text → retrieve top-k by dot product → rerank → sigmoid prob →
  * relevance label → optional payload filters.
  *
  * The sentence-transformer is external to the engine; `embedText` is a
  * deterministic stand-in with the same contract (fixed dim,
  * L2-normalized) so the full pipeline shape — including encode-at-
  * query-time — is real and testable.
  */
object SearchApi {

  val Dim = 64

  /** Deterministic text→vector encoder stub: token md5s hashed into
    * `dim` buckets (signed), then L2-normalized — the bag-of-words
    * hashing trick, matching the reference's encode contract
    * (L2-normalized fixed-dim output, encode_assets.py:28-34).
    */
  def embedText(text: Column, dim: Int = Dim): Column = {
    val toks = tokens(text)
    // bucket = first 4 md5 nibbles mod dim; sign from nibble 5
    val contrib = transform(toks, t => {
      val h = conv(substring(md5(t), 1, 4), 16, 10).cast("int")
      val sgn = when(conv(substring(md5(t), 5, 1), 16, 10).cast("int") % 2 === 0, 1.0)
        .otherwise(-1.0)
      struct((h % dim).as("b"), sgn.as("v"))
    })
    val raw = transform(sequence(lit(0), lit(dim - 1)), i =>
      aggregate(contrib, lit(0.0),
        (acc, c) => acc + when(c.getField("b") === i, c.getField("v")).otherwise(0.0)))
    val nrm = sqrt(aggregate(raw, lit(0.0), (acc, x) => acc + x * x))
    when(nrm > 0, transform(raw, x => (x / nrm).cast("float")))
      .otherwise(transform(raw, x => x.cast("float")))
  }

  /** Full search pipeline over the corpus embeddings + documents:
    * returns (doc_id, retrieve_score, logit, prob, label, rerank_rank).
    */
  def search(spark: SparkSession, dir: String, queryText: String,
      retrieveK: Int = 20, minLogit: Option[Double] = None,
      lang: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = spark.range(1).select(embedText(lit(queryText)).as("qvec"))
    val top = KnnSearch.scored(Tables.embeddings(spark, dir).select("vec_id", "embedding"), q)
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(retrieveK)
      .select(col("vec_id"), col("score"))
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"), col("text"))
    val reranked = top.join(docs, top("vec_id") === docs("doc_id"))
      .withColumn("logit", KnnSearch.rerankLogit(col("score"), col("n_chars")))
      .withColumn("prob", lit(1.0) / (lit(1.0) + exp(-col("logit"))))
      .withColumn("label", KnnSearch.relevanceLabel(col("logit")))
    val filtered = Seq(
      minLogit.map(m => col("logit") >= m),
      lang.map(l => col("lang") === l),
    ).flatten.foldLeft(reranked)((df, p) => df.filter(p))
    filtered
      .withColumn("rerank_rank",
        row_number().over(Window.orderBy(col("logit").desc, col("doc_id").asc)).cast("long"))
      .select("doc_id", "score", "logit", "prob", "label", "rerank_rank", "lang", "text")
  }
}
