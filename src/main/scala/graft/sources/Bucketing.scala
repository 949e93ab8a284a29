package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout (SURVEY.md §5): co-locate fact tables on their
  * join/dedup key at write time so the join (or hash-dedup) needs no
  * Exchange at read time — at 100 TB this converts the recurring
  * shuffle cost of every downstream join into a one-time write cost.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table on `key`. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int = 8): Unit =
    df.write.bucketBy(buckets, key).sortBy(key)
      .mode("overwrite").format("parquet").saveAsTable(table)

  /** Join two tables bucketed on the same key — planner sees matching
    * output partitioning on both sides and elides both exchanges.
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(left)
    val r = spark.table(right)
    // same key name on both sides → USING form, which coalesces the key
    // column (the expression form returned TWO identically-named columns
    // and every downstream reference to the key was ambiguous; r9 review)
    if (leftKey == rightKey) l.join(r, Seq(leftKey))
    else l.join(r, l(leftKey) === r(rightKey))
  }
}
