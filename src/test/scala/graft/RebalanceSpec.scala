package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{IndexMaintenance, IvfIndex}

/** r11 (r10 verdict #2): rebalanceIndex EXECUTES the action table
  * vs_index_rebalance only planned — hot clusters split via one local
  * Lloyd step on their own rows, cold clusters rehome to the nearest
  * surviving centroid — with the full maintenance contract: serving at
  * equal nprobe-coverage is row-identical, the hottest partition
  * strictly shrinks, partition pruning survives, and compaction
  * composes afterwards.
  */
class RebalanceSpec extends AnyFunSuite {
  import SparkSuite._
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  /** A deliberately skewed 4-cluster layout: cluster 0 is a 200-row
    * hot spot (> 2× mean → split), cluster 3 is a 40-row cold tail
    * (< mean/2 → merge, its points sit next to cluster 1's), clusters
    * 1/2 are keeps.
    */
  private def writeSkewedIndex(idx: String): Unit = {
    def blob(n: Int, baseId: Int, cx: Float, cy: Float): Seq[(Long, Array[Float])] =
      (0 until n).map(i =>
        (baseId + i.toLong, Array(cx + (i % 7) * 0.01f, cy + (i % 5) * 0.01f)))
    val rows =
      blob(200, 0, 10f, 0f).map { case (id, v) => (id, v, 0L) } ++
      blob(50, 1000, 0f, 10f).map { case (id, v) => (id, v, 1L) } ++
      blob(50, 2000, -10f, 0f).map { case (id, v) => (id, v, 2L) } ++
      blob(40, 3000, 0.5f, 10.5f).map { case (id, v) => (id, v, 3L) }
    rows.toDF("vec_id", "embedding", "cluster_id")
      .write.partitionBy("cluster_id").parquet(s"$idx/vectors")
    Seq((0L, Seq(10.0, 0.0)), (1L, Seq(0.0, 10.0)),
        (2L, Seq(-10.0, 0.0)), (3L, Seq(0.5, 10.5)))
      .toDF("cluster_id", "cvec").write.parquet(s"$idx/centroids")
  }

  private def served(idx: String, nprobe: Int, k: Int = 25): Seq[String] = {
    val q = Seq(Tuple1(Seq(9.5f, 0.5f))).toDF("qvec")
    IvfIndex.searchIndex(spark, idx, q, nprobe = nprobe, k = k)
      .select("vec_id", "score").collect().map(_.toString).toSeq
  }

  test("rebalance: serving-equal at full coverage, hot partition strictly shrinks") {
    val idx = tmp("graft-rebal")
    writeSkewedIndex(idx)
    val before = served(idx, nprobe = 4)
    val rep = IndexMaintenance.rebalanceIndex(spark, idx)
    assert(rep.nSplit === 1 && rep.nMerge === 1, rep.toString)
    assert(rep.maxRowsBefore === 200L)
    assert(rep.maxRowsAfter < rep.maxRowsBefore,
      s"hot partition not reduced: $rep")
    // same 340 rows, none lost or duplicated
    assert(spark.read.parquet(s"$idx/vectors").count() === 340L)
    assert(spark.read.parquet(s"$idx/vectors")
      .select("vec_id").distinct().count() === 340L)
    // serving with every cluster probed is row-identical
    val after = served(idx, nprobe = rep.nClustersAfter.toInt)
    assert(after === before)
    // centroid table matches the layout exactly
    val layoutIds = spark.read.parquet(s"$idx/vectors")
      .select(col("cluster_id").cast("long")).distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    val centIds = spark.read.parquet(s"$idx/centroids")
      .select(col("cluster_id").cast("long"))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(centIds === layoutIds)
    // split ids are fresh, never reused
    assert(layoutIds.count(_ > 3L) >= 2)
    // pruning survives the rewrite
    val q = Seq(Tuple1(Seq(9.5f, 0.5f))).toDF("qvec")
    val pruned = IvfIndex.searchIndex(spark, idx, q, nprobe = 1)
    pruned.collect()
    // nprobe=1 renders as an equality inside the filter list, so match
    // "cluster_id anywhere inside the PartitionFilters brackets"
    val plan = pruned.queryExecution.executedPlan.toString
    assert(raw"PartitionFilters: \[[^\]]*cluster_id".r.findFirstIn(plan).isDefined,
      "pruning lost after rebalance")
  }

  test("rebalance composes with compaction and the epoch/marker discipline") {
    val idx = tmp("graft-rebal-compact")
    writeSkewedIndex(idx)
    IndexMaintenance.rebalanceIndex(spark, idx)
    // the marker landed with the swap: resumes must use an epoch dir
    assert(IndexMaintenance.isCompacted(spark, idx))
    val full = served(idx, nprobe = 16)
    IndexMaintenance.compactIndex(spark, idx)
    assert(served(idx, nprobe = 16) === full)
    assert(spark.read.parquet(s"$idx/vectors").count() === 340L)
  }

  test("a balanced index is a no-op (report says so, nothing rewritten)") {
    val idx = tmp("graft-rebal-noop")
    val rows = (0 until 4).flatMap(c => (0 until 50).map(i =>
      (c * 1000L + i, Array(c * 3f + (i % 7) * 0.01f, c * 2f), c.toLong)))
    rows.toDF("vec_id", "embedding", "cluster_id")
      .write.partitionBy("cluster_id").parquet(s"$idx/vectors")
    (0 until 4).map(c => (c.toLong, Seq(c * 3.0, c * 2.0)))
      .toDF("cluster_id", "cvec").write.parquet(s"$idx/centroids")
    val rep = IndexMaintenance.rebalanceIndex(spark, idx)
    assert(rep.nSplit === 0 && rep.nMerge === 0)
    assert(rep.maxRowsAfter === rep.maxRowsBefore)
    // no marker: nothing was rewritten
    assert(!IndexMaintenance.isCompacted(spark, idx))
  }

  /** (name, size) of every parquet part-file under a partition dir —
    * the byte-identity fingerprint for the keep-partition pin.
    */
  private def fileSet(dir: String): Set[(String, Long)] = {
    val d = new java.io.File(dir)
    if (!d.exists()) Set.empty
    else d.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.length())).toSet
  }

  test("r12: keep partitions cross by rename, byte-identical; staged bytes ∝ touched") {
    val idx = tmp("graft-rebal-keep")
    writeSkewedIndex(idx)
    // clusters 1 and 2 are keeps; 2 receives no merged-in arrivals
    // (cluster 3's points sit next to cluster 1)
    val keep1Before = fileSet(s"$idx/vectors/cluster_id=1")
    val keep2Before = fileSet(s"$idx/vectors/cluster_id=2")
    assert(keep1Before.nonEmpty && keep2Before.nonEmpty)
    val totalBytesBefore = new java.io.File(s"$idx/vectors").listFiles()
      .filter(_.isDirectory).flatMap(_.listFiles())
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    val rep = IndexMaintenance.rebalanceIndex(spark, idx)
    assert(rep.nSplit === 1 && rep.nMerge === 1, rep.toString)
    // the keep partitions' ORIGINAL files are still there, same name
    // and size (cluster 1 may gain merged-in part-files alongside)
    assert(keep1Before.subsetOf(fileSet(s"$idx/vectors/cluster_id=1")),
      "cluster 1's original files were rewritten")
    assert(fileSet(s"$idx/vectors/cluster_id=2") === keep2Before,
      "cluster 2 (untouched keep) was rewritten")
    // bytes written are the touched partitions, not the corpus: the
    // keep partitions (100/340 rows) crossed by rename
    assert(rep.movedBytes > 0L)
    assert(rep.stagedBytes > 0L && rep.stagedBytes < totalBytesBefore,
      s"staged ${rep.stagedBytes} vs layout $totalBytesBefore — selective staging lost")
  }

  test("r12: an extreme hot spot splits multi-way and converges within a round budget") {
    val idx = tmp("graft-rebal-hot")
    // one 4000-row blob on a wide grid + ten 40-row satellites: the
    // hot cluster is ~10× the mean, far beyond what a 2-way split
    // could fix in any number of rounds (2000 > 2×mean still)
    val hot = (0 until 4000).map(i =>
      (i.toLong, Array(100f + (i % 63) * 0.1f, (i / 63) * 0.1f), 0L))
    val sats = (1 to 10).flatMap(c => (0 until 40).map(i =>
      (c * 100000L + i, Array(c * 40f, 200f + (i % 5) * 0.01f), c.toLong)))
    (hot ++ sats).toDF("vec_id", "embedding", "cluster_id")
      .write.partitionBy("cluster_id").parquet(s"$idx/vectors")
    ((0L, Seq(103.0, 3.0)) +: (1 to 10).map(c => (c.toLong, Seq(c * 40.0, 200.0))))
      .toDF("cluster_id", "cvec").write.parquet(s"$idx/centroids")
    val q = Seq(Tuple1(Seq(100.5f, 1.5f))).toDF("qvec")
    def fullServe(): Seq[String] = {
      val np = spark.read.parquet(s"$idx/centroids").count().toInt
      IvfIndex.searchIndex(spark, idx, q, nprobe = np, k = 25)
        .select("vec_id", "score").collect().map(_.toString).toSeq
    }
    val before = fullServe()
    var converged = false
    var rounds = 0
    while (!converged && rounds < 3) {
      rounds += 1
      val rep = IndexMaintenance.rebalanceIndex(spark, idx)
      assert(fullServe() === before, s"serving diverged in round $rounds: $rep")
      val mean = 4400.0 / rep.nClustersAfter
      converged = rep.maxRowsAfter <= 2 * mean
    }
    assert(converged, s"hot spot still > 2x mean after $rounds rounds")
    assert(spark.read.parquet(s"$idx/vectors").count() === 4400L)
    assert(spark.read.parquet(s"$idx/vectors")
      .select("vec_id").distinct().count() === 4400L)
  }

  test("r12: a crashed centroids swap heals on the next (otherwise no-op) run") {
    val idx = tmp("graft-rebal-heal")
    writeSkewedIndex(idx)
    // snapshot the PRE-rebalance centroids table
    val stale = tmp("graft-rebal-heal-stale")
    val staleDf = spark.read.parquet(s"$idx/centroids")
    staleDf.write.mode("overwrite").parquet(s"$stale/centroids")
    val rep = IndexMaintenance.rebalanceIndex(spark, idx)
    assert(rep.nSplit === 1)
    val healthy = served(idx, nprobe = rep.nClustersAfter.toInt)
    // simulate the crash window: vectors swapped, centroids swap lost
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$idx/centroids"), true)
    spark.read.parquet(s"$stale/centroids")
      .write.mode("overwrite").parquet(s"$idx/centroids")
    // the rerun has nothing to split or merge — the layout is already
    // balanced — but must reconcile the stale table to the layout
    val rep2 = IndexMaintenance.rebalanceIndex(spark, idx)
    assert(rep2.nSplit === 0 && rep2.nMerge === 0, rep2.toString)
    val layoutIds = spark.read.parquet(s"$idx/vectors")
      .select(col("cluster_id").cast("long")).distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    val centIds = spark.read.parquet(s"$idx/centroids")
      .select(col("cluster_id").cast("long"))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(centIds === layoutIds, "stale centroids not reconciled to the layout")
    // full-coverage serving is back to the healthy rebalanced result
    assert(served(idx, nprobe = centIds.length) === healthy)
  }

  test("real-corpus index rebalance keeps full-coverage serving identical") {
    val idx = tmp("graft-rebal-real")
    IvfIndex.writeIndex(spark, Sf, idx)
    val q = Tables.embeddings(spark, Sf).filter(col("vec_id") === 0)
      .select(col("embedding").as("qvec"))
    def serve(np: Int) = IvfIndex.searchIndex(spark, idx, q, nprobe = np, k = 10)
      .select("vec_id", "score").collect().map(_.toString).toSeq
    val nClusters = spark.read.parquet(s"$idx/centroids").count().toInt
    val before = serve(nClusters)
    val rep = IndexMaintenance.rebalanceIndex(spark, idx)
    val after = serve(rep.nClustersAfter.toInt max nClusters)
    assert(after === before, s"serving diverged after $rep")
  }
}
