package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions.r6

/** Benchmark decontamination (SURVEY.md §2-D): flag training documents
  * that share n-gram shingles with a held-out evaluation set — the
  * standard pre-training hygiene step that keeps eval data out of the
  * training corpus. The "benchmark" here is the deterministic doc
  * subset `doc_id % 97 == 0` (eval sets are tiny relative to the
  * corpus, which is what makes the scale shape work).
  *
  * Scale shape: the benchmark gram set is small → broadcast; the
  * corpus-side gram explode is map-side; only matching (doc, gram)
  * rows reach the per-doc aggregation shuffle. At 100 TB this is one
  * corpus scan + a broadcast semi-join — no corpus shuffle.
  */
object Decontam {

  def contamination(spark: SparkSession, dir: String): DataFrame = {
    val grams = graft.Tables.fanOut(Tables.documents(spark, dir))
      // native one-pass shingler (TextFunctions.shingles is its HOF spec
      // twin — identical output, ~20× slower on long token arrays)
      .select(col("doc_id"), graft.functions.TextExprs.shingles(tokens(col("text"))).as("sh"))
      .select(col("doc_id"), size(col("sh")).cast("long").as("n_grams"),
        explode(col("sh")).as("gram"))
    val bench = grams.filter(col("doc_id") % 97 === 0).select("gram").distinct()
    grams.filter(col("doc_id") % 97 =!= 0)
      .join(broadcast(bench), "gram")
      // shingles() is distinct-per-doc, so the count IS the overlap size
      .groupBy(col("doc_id"), col("n_grams"))
      .agg(count(lit(1)).as("n_hit"))
      .select(col("doc_id"), col("n_grams"), col("n_hit"),
        r6(col("n_hit") / (lit(1.0) * col("n_grams"))).as("contamination"))
  }
}
