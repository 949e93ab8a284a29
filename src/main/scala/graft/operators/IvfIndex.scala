package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.VectorFunctions._

/** IVF-style approximate-nearest-neighbor index (SURVEY.md §2-A) — the
  * 100 TB scale path the reference's in-memory Qdrant index
  * (reference store_assets.py:40-77) cannot take.
  *
  * Design: a small centroid table (deterministic seed pick here; a few
  * k-means iterations in production) is broadcast; every corpus vector
  * is assigned to its nearest centroid in a single scan (argmin via
  * window over the broadcast cross join — the corpus never shuffles).
  * At scale the assignment is written bucketed/partitioned by
  * `cluster_id`, so a query probing `nprobe` clusters prunes everything
  * else at the parquet-partition level (predicate pushdown on the
  * partition column), turning O(N) brute force into O(N·nprobe/k).
  */
object IvfIndex {

  val CentroidStep = 53

  /** Deterministic centroid seeds (stand-in for k-means init). */
  def centroids(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir).filter(col("vec_id") % CentroidStep === 0)
      .select(col("vec_id").as("cluster_id"), col("embedding").as("cvec"))

  /** Nearest-centroid assignment of `vecs` against an arbitrary
    * centroid table (broadcast), distance retained.
    */
  def assignTo(vecs: DataFrame, cents: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("vec_id")).orderBy(col("d2").asc, col("cluster_id").asc)
    vecs.crossJoin(broadcast(cents))
      .withColumn("d2", dist2(col("embedding"), col("cvec")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("vec_id", "cluster_id", "d2")
  }

  /** Assignment against the deterministic seed centroids (the
    * oracle-mirrored formulation).
    */
  def assign(spark: SparkSession, dir: String): DataFrame =
    assignTo(Tables.fanOut(Tables.embeddings(spark, dir).select("vec_id", "embedding")),
      centroids(spark, dir))

  /** Index-build stats: per-cluster size and mean assignment distance
    * (the k-means update step as an aggregation). The distance sum is
    * integerized per-row so the group sum is order-independent.
    */
  def centroidStats(spark: SparkSession, dir: String): DataFrame =
    assign(spark, dir)
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n"),
        sum(cents(col("d2"), 1e9)).as("sum_d2e9"))
      .withColumn("avg_d2", r6(col("sum_d2e9") / (lit(1e9) * col("n"))))
      .select("cluster_id", "n", "avg_d2")

  /** Lloyd's k-means over the embedding column, entirely as DataFrame
    * ops (the batch index build): assignment is a broadcast cross join
    * + window argmin; the update step recomputes per-dimension means
    * via posexplode + two-level aggregation. Data never leaves the
    * executors — only the k×dim centroid means return to the driver
    * each iteration to become the next broadcast (the MLlib pattern).
    * Returns (final centroids, per-iteration objective = Σ d²).
    */
  def kmeans(spark: SparkSession, dir: String, iters: Int = 3): (DataFrame, Seq[Double]) = {
    import spark.implicits._
    val vecs = Tables.fanOut(Tables.embeddings(spark, dir).select("vec_id", "embedding"))
    var cents: DataFrame = centroids(spark, dir)
      .select(col("cluster_id"), transform(col("cvec"), _.cast("double")).as("cvec"))
    val objectives = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (_ <- 0 until iters) {
      val w = Window.partitionBy(col("vec_id")).orderBy(col("d2").asc, col("cluster_id").asc)
      val assigned = vecs.crossJoin(broadcast(cents))
        .withColumn("d2", dist2(col("embedding"), col("cvec")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("vec_id", "cluster_id", "embedding", "d2")
      objectives += assigned.agg(sum(col("d2"))).head().getDouble(0)
      val means = assigned
        .select(col("cluster_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("cluster_id"), col("pos"))
        .agg(avg(col("v").cast("double")).as("m"))
        .groupBy(col("cluster_id"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("cvec"))
      // k×dim doubles — index metadata; collect to keep lineage flat
      val rows = means.collect().map(r =>
        (r.getLong(0), r.getSeq[Double](1)))
      cents = spark.createDataFrame(rows.toIndexedSeq).toDF("cluster_id", "cvec")
    }
    (cents, objectives.toSeq)
  }

  /** Persist the index: vectors co-located with their assignment,
    * `partitionBy(cluster_id)` — at 100 TB this is the layout that
    * turns ANN search into a partition-pruned scan of nprobe clusters
    * instead of a full corpus scan. Centroids are stored alongside
    * (tiny — they are the index metadata a query planner keeps in RAM,
    * like Qdrant's coarse quantizer).
    */
  def writeIndex(spark: SparkSession, dir: String, indexPath: String,
      refineIters: Int = 0): Unit = {
    // refineIters > 0 runs Lloyd iterations first — measured at sf0.01:
    // recall@10 0.57 -> 0.69 (nprobe=3) and 0.75 -> 0.88 (nprobe=5)
    // versus the seed centroids, for the same query cost
    val cents =
      if (refineIters > 0) kmeans(spark, dir, refineIters)._1
      else centroids(spark, dir)
    Tables.embeddings(spark, dir).select("vec_id", "embedding")
      .join(assignTo(Tables.fanOut(Tables.embeddings(spark, dir)
        .select("vec_id", "embedding")), cents).select("vec_id", "cluster_id"), "vec_id")
      .write.mode("overwrite").partitionBy("cluster_id")
      .parquet(s"$indexPath/vectors")
    cents.write.mode("overwrite").parquet(s"$indexPath/centroids")
  }

  /** Search the persisted index: rank the (tiny, collected) centroid
    * table against the query, then scan ONLY the nprobe nearest
    * cluster partitions — the `cluster_id IN (...)` filter prunes at
    * the parquet-partition level (visible as PartitionFilters in the
    * scan; verified by IvfIndexSpec).
    */
  def searchIndex(spark: SparkSession, indexPath: String, query: DataFrame,
      nprobe: Int = 3, k: Int = 10): DataFrame = {
    val probed = spark.read.parquet(s"$indexPath/centroids").crossJoin(broadcast(query))
      .withColumn("cd2", dist2(col("cvec"), col("qvec")))
      .orderBy(col("cd2").asc, col("cluster_id").asc)
      .limit(nprobe)
      .select("cluster_id")
      .collect().map(_.getLong(0)) // index metadata, O(nprobe) — not data
    spark.read.parquet(s"$indexPath/vectors")
      // partition-column inference reads cluster_id as int; restore the
      // long the in-memory surfaces (search/assign/centroids) use
      .withColumn("cluster_id", col("cluster_id").cast("long"))
      .filter(col("cluster_id").isin(probed.toIndexedSeq: _*))
      .crossJoin(broadcast(query))
      .withColumn("score", dot(col("embedding"), col("qvec")))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(k)
      .select(col("cluster_id"), col("vec_id"), r6(col("score")).as("score"))
  }

  /** IVF search: rank centroids by distance to the query, scan only the
    * `nprobe` nearest clusters, brute-force top-k inside them.
    */
  def search(spark: SparkSession, dir: String, nprobe: Int = 3, k: Int = 10): DataFrame = {
    val q = Tables.embeddings(spark, dir).filter(col("vec_id") === 0)
      .select(col("embedding").as("qvec"))
    val probed = centroids(spark, dir).crossJoin(broadcast(q))
      .withColumn("cd2", dist2(col("cvec"), col("qvec")))
      .orderBy(col("cd2").asc, col("cluster_id").asc)
      .limit(nprobe)
      .select("cluster_id")
    val cand = Tables.embeddings(spark, dir).select("vec_id", "embedding")
      .join(assign(spark, dir).select("vec_id", "cluster_id"), "vec_id")
      .join(broadcast(probed), "cluster_id")
    cand.crossJoin(broadcast(q))
      .withColumn("score", dot(col("embedding"), col("qvec")))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(k)
      .select(col("cluster_id"), col("vec_id"), r6(col("score")).as("score"))
  }
}
