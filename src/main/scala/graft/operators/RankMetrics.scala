package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.{cents, r6}

/** Position-aware retrieval-quality metrics shared by the index
  * families (IVF `vs_ndcg`, LSH `vs_lsh_ndcg`). The numeric contract
  * (integerized DCG terms, in-engine ideal-DCG fold) lives here once so
  * the families cannot drift.
  */
object RankMetrics {

  /** nDCG@k of `approx` (query_id, vec_id, pos — the approximate
    * ranking, pos 1-based ≤ k) against `brute` (query_id, vec_id,
    * brnk — the exact top-k). Graded relevance rel = k+1 − brnk, 0
    * beyond the true top-k; DCG terms rel·ln2/ln(pos+1) integerize at
    * 1e6 BEFORE the per-query sum (order-independent), and the ideal
    * DCG folds from the same integerized terms inside the engine —
    * never a Scala-side libm literal.
    */
  def ndcg(spark: SparkSession, approx: DataFrame, brute: DataFrame,
      k: Int): DataFrame = {
    val rel = coalesce(lit(k.toLong) + 1L - col("brnk"), lit(0L))
    val idcg = spark.range(1, k + 1).select(
      sum(cents((lit(k + 1) - col("id")) * log(lit(2.0)) / log(col("id") + lit(1.0)),
        1e6)).as("idcg_e6"))
    approx.join(brute, Seq("query_id", "vec_id"), "left")
      .select(col("query_id"),
        cents(rel * log(lit(2.0)) / log(col("pos") + lit(1.0)), 1e6).as("term_e6"),
        when(col("brnk").isNotNull, 1L).otherwise(0L).as("hit"))
      .groupBy(col("query_id"))
      .agg(sum(col("term_e6")).as("dcg_e6"), sum(col("hit")).as("n_hit"))
      .crossJoin(broadcast(idcg))
      .select(col("query_id"), col("n_hit"),
        r6(col("dcg_e6") / (lit(1.0) * col("idcg_e6"))).as("ndcg"))
  }
}
