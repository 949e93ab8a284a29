package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities (SURVEY.md §5). AQE's skew-join handling
  * covers sort-merge joins; hot-key *aggregation* skew is handled here
  * with classic salting: a two-stage aggregate where stage one spreads
  * each hot key over `salts` reducers and stage two merges the partial
  * results. Only partial rows shuffle twice — the data never does.
  */
object SkewOps {

  /** Salted count/sum aggregation over a possibly-skewed key.
    * Equivalent to `df.groupBy(key).agg(count, sum(valueCol))` for any
    * distribution, but the first shuffle spreads each key across
    * `salts` partitions.
    *
    * The salt MUST be deterministic per row: a nondeterministic salt
    * (partition id, monotonic id, rand) feeding a shuffle double- or
    * under-counts when a stage retry recomputes map tasks with different
    * salt assignments while some reducers keep already-fetched partials
    * (the SPARK-23207 class of bug). Murmur3 over (key, value) — plus
    * any caller-supplied `spreadCols`, e.g. a row id, when many
    * identical (key, value) rows must spread further — is reproducible
    * on retry; identical rows sharing a salt only narrows the spread of
    * exact-duplicate rows, never correctness. Hashing a stated column
    * set (not every input column) also keeps the helper total: hash()
    * rejects MapType columns and duplicate column names break col()
    * resolution after joins.
    */
  def saltedAgg(df: DataFrame, key: Column, valueCents: Column, salts: Int = 16,
      spreadCols: Seq[Column] = Nil): DataFrame =
    df.withColumn("_salt", pmod(hash(key +: valueCents +: spreadCols: _*), lit(salts)))
      .groupBy(key.as("key"), col("_salt"))
      .agg(count(lit(1)).as("n_part"), sum(valueCents).as("sum_part"))
      .groupBy(col("key"))
      .agg(sum(col("n_part")).as("n"), sum(col("sum_part")).as("sum_cents"))
}
