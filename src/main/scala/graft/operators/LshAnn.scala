package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorFunctions._

/** Random-hyperplane LSH ANN (SURVEY.md §2-A) — the bucketed
  * alternative to IVF: each vector's bucket is the sign pattern of its
  * projections onto `NumPlanes` fixed hyperplanes, so cosine-similar
  * vectors collide with high probability and search scans one bucket
  * instead of the corpus. At scale `bucket` is a partition/bucketing
  * column exactly like IVF's cluster_id.
  *
  * The planes are derived deterministically from md5 (plane p, dim d →
  * centered nibble value), so the DuckDB oracle reproduces them exactly
  * and the whole pipeline is hash-checked; values are multiples of
  * 1/16 — exactly representable, no cross-engine float drift.
  */
object LshAnn {

  val NumPlanes = 4
  val Dim = 64

  /** Plane p as a literal double array (nibble of md5("p,d"), centered). */
  private def planeWeights(p: Int): Seq[Double] =
    (1 to Dim).map { d =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$p,$d".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      val nib = Integer.parseInt(hex.substring(0, 1), 16)
      (nib - 7.5) / 8.0
    }

  private def planeLit(p: Int): Column =
    array(planeWeights(p).map(lit): _*)

  /** Sign-pattern bucket id of a vector column. */
  def bucketOf(vec: Column): Column =
    (0 until NumPlanes).map(p =>
      when(dot(vec, planeLit(p)) > 0, lit(1 << p)).otherwise(lit(0)))
      .reduce(_ + _).cast("long")

  /** Corpus with bucket assignment (the index build — at scale this is
    * written `partitionBy("bucket")` like IvfIndex.writeIndex).
    */
  def bucketed(spark: SparkSession, dir: String): DataFrame =
    Tables.fanOut(Tables.embeddings(spark, dir).select("vec_id", "embedding"))
      .withColumn("bucket", bucketOf(col("embedding")))

  /** Persist the LSH index: vectors partitioned by bucket on disk — at
    * 100 TB a query reads exactly one partition directory (multi-probe:
    * a handful) instead of the corpus, the same layout-as-index move as
    * IvfIndex.writeIndex.
    */
  def writeIndex(spark: SparkSession, dir: String, indexPath: String): Unit =
    bucketed(spark, dir)
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$indexPath/vectors")

  /** Search the persisted index: bucket the query (driver-side column
    * math on one row), scan only that bucket's partition — the
    * `bucket = qbucket` filter prunes at the parquet-partition level.
    * `probes > 1` adds multi-probe: the nearest sign-flip neighbors of
    * the query bucket (hamming-adjacent patterns) are scanned too,
    * trading a few more partitions for recall.
    */
  def searchIndex(spark: SparkSession, indexPath: String, query: DataFrame,
      k: Int = 5, probes: Int = 1): DataFrame = {
    val q = query.select(col("qvec"), bucketOf(col("qvec")).as("qbucket"))
    val qRow = q.collect().head // one row: the query is index metadata
    val qb = qRow.getLong(1)
    val buckets = (qb +: (0 until NumPlanes).map(p => qb ^ (1L << p)))
      .take(math.max(1, probes))
    IndexMaintenance.vectorsDf(spark, indexPath) // base + any resume epochs
      .withColumn("bucket", col("bucket").cast("long"))
      .filter(col("bucket").isin(buckets: _*))
      .crossJoin(broadcast(q.select("qvec")))
      .withColumn("score", dot(col("embedding"), col("qvec")))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(k)
      .select(col("bucket"), col("vec_id"), r6(col("score")).as("score"))
  }

  /** Measured recall@k of the multi-probe LSH path against exact
    * brute-force top-k, per query — the LSH twin of
    * [[IvfIndex.recallReport]]: the number an operator actually needs
    * before trusting an approximate index at scale ("is 2-probe recall
    * good enough, or do we pay more probes?").
    *
    * Scale shape: queries are a broadcast-sized set (one per 100
    * vectors) carrying their probe buckets (bucket + hamming-1 flips,
    * bounded by `probes`); the approximate side is an equi-join of the
    * bucketed corpus against that broadcast, so the corpus is scanned
    * once and never self-joined. The brute-force side is the same
    * corpus×queries scan every recall measurement must pay — it exists
    * to CERTIFY the cheap path, run on a sample in production.
    */
  def recallReport(spark: SparkSession, dir: String, k: Int = 5,
      probes: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // bounded deterministic query sample (r15, r14 verdict #1) — see
    // KnnSearch.evalQueries for the sampling/unbiasedness contract
    val queries = KnnSearch.evalQueries(spark, dir)
      .withColumn("qb", bucketOf(col("qvec")))
    val probeBuckets = array((col("qb") +: (0 until NumPlanes).map(p =>
      col("qb").bitwiseXOR(lit(1L << p)))).take(math.max(1, probes)): _*)
    val probed = queries.select(col("query_id"), col("qvec"),
      explode(probeBuckets).as("bucket"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id").asc)
    // r16: PartialTopK bounds both scored sets BEFORE their rank
    // Exchange (a hot bucket otherwise pushes a corpus-scale set
    // through the shuffle; the brute side is corpus×queries always)
    val approx = graft.plans.PartialTopK(bucketed(spark, dir)
      .join(broadcast(probed), "bucket")
      .withColumn("score", dot(col("embedding"), col("qvec")))
      .select(col("query_id"), col("vec_id"), col("score")),
        "query_id", "score", "vec_id", k)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("vec_id"))
    val brute = graft.plans.PartialTopK(KnnSearch.scored(
        Tables.embeddings(spark, dir).select("vec_id", "embedding"),
        queries.select(col("query_id"), col("qvec")))
      .select(col("query_id"), col("vec_id"), col("score")),
        "query_id", "score", "vec_id", k)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("query_id", "vec_id")
    brute.join(approx.withColumn("hit", lit(1L)), Seq("query_id", "vec_id"), "left")
      .groupBy(col("query_id"))
      .agg(sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .select(col("query_id"), col("n_hit"),
        r6(col("n_hit") / lit(k.toDouble)).as("recall"))
  }

  /** nDCG@k of the multi-probe LSH path — [[recallReport]]'s
    * position-aware companion ([[RankMetrics.ndcg]] contract, the
    * `vs_ndcg` twin for the second index family). Same probe set and
    * tiebreaks as the recall surface, so the two metrics are measured
    * on the identical candidate stream.
    */
  def ndcgReport(spark: SparkSession, dir: String, k: Int = 5,
      probes: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // bounded deterministic query sample — see recallReport (r15)
    val queries = KnnSearch.evalQueries(spark, dir)
      .withColumn("qb", bucketOf(col("qvec")))
    val probeBuckets = array((col("qb") +: (0 until NumPlanes).map(p =>
      col("qb").bitwiseXOR(lit(1L << p)))).take(math.max(1, probes)): _*)
    val probed = queries.select(col("query_id"), col("qvec"),
      explode(probeBuckets).as("bucket"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id").asc)
    // r16: PartialTopK bounds before the rank Exchange — see recallReport
    val approx = graft.plans.PartialTopK(bucketed(spark, dir)
      .join(broadcast(probed), "bucket")
      .withColumn("score", dot(col("embedding"), col("qvec")))
      .select(col("query_id"), col("vec_id"), col("score")),
        "query_id", "score", "vec_id", k)
      .withColumn("pos", row_number().over(w).cast("long"))
      .filter(col("pos") <= k)
      .select(col("query_id"), col("vec_id"), col("pos"))
    val brute = graft.plans.PartialTopK(KnnSearch.scored(
        Tables.embeddings(spark, dir).select("vec_id", "embedding"),
        queries.select(col("query_id"), col("qvec")))
      .select(col("query_id"), col("vec_id"), col("score")),
        "query_id", "score", "vec_id", k)
      .withColumn("brnk", row_number().over(w).cast("long"))
      .filter(col("brnk") <= k)
      .select("query_id", "vec_id", "brnk")
    RankMetrics.ndcg(spark, approx, brute, k)
  }

  /** ANN search: hash the query, scan only its bucket, top-k by dot. */
  def search(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val q = Tables.embeddings(spark, dir).filter(col("vec_id") === 0)
      .select(col("embedding").as("qvec"), bucketOf(col("embedding")).as("qbucket"))
    bucketed(spark, dir)
      .crossJoin(broadcast(q))
      .filter(col("bucket") === col("qbucket"))
      .withColumn("score", dot(col("embedding"), col("qvec")))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(k)
      .select(col("bucket"), col("vec_id"), r6(col("score")).as("score"))
  }
}
