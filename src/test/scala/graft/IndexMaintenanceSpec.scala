package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{IndexMaintenance, IvfIndex, LshAnn, PqIndex}
import graft.streaming.IndexStream

/** Compaction of the persisted index layouts: fewer files, identical
  * rows, identical serving, pruning intact — for all three families.
  */
class IndexMaintenanceSpec extends AnyFunSuite {
  import SparkSuite._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private def query = Tables.embeddings(spark, Sf).filter(col("vec_id") === 0)
    .select(col("embedding").as("qvec"))

  test("streamed-in PQ index compacts to one file per cluster, serving unchanged") {
    val idx = tmp("graft-compact-pq")
    val staging = tmp("graft-compact-staging")
    val ckpt = tmp("graft-compact-ckpt")
    // metadata from a throwaway batch build; vectors arrive in many
    // tiny micro-batches (the small-file regime compaction exists for)
    val seed = tmp("graft-compact-seed")
    PqIndex.writeIndex(spark, Sf, seed)
    spark.read.parquet(s"$seed/centroids").write.parquet(s"$idx/centroids")
    spark.read.parquet(s"$seed/codebooks").write.parquet(s"$idx/codebooks")
    val vecs = Tables.embeddings(spark, Sf).select("vec_id", "embedding")
    (0 until 5).foreach(w =>
      vecs.filter(pmod(col("vec_id"), lit(5)) === w).write.parquet(s"$staging/wave$w"))
    val stream = spark.readStream.schema(vecs.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$staging/wave*")
    val q = IndexStream.appendToPqIndex(spark, idx, stream, ckpt)
    try q.processAllAvailable() finally q.stop()

    val before = IndexMaintenance.parquetFileCount(spark, s"$idx/vectors")
    val rowsBefore = spark.read.parquet(s"$idx/vectors")
      .select("vec_id", "cluster_id", "code_0", "code_1", "code_2", "code_3")
      .collect().map(_.toString).sorted.toSeq
    val servedBefore = PqIndex.searchIndex(spark, idx, query, nprobe = 3).collect()
      .map(_.toString).toSeq

    val after = IndexMaintenance.compactIndex(spark, idx)
    assert(after < before, s"files: $before -> $after")
    val clusters = spark.read.parquet(s"$idx/vectors")
      .select("cluster_id").distinct().count()
    assert(after === clusters, s"expected one file per cluster: $after vs $clusters")

    val rowsAfter = spark.read.parquet(s"$idx/vectors")
      .select("vec_id", "cluster_id", "code_0", "code_1", "code_2", "code_3")
      .collect().map(_.toString).sorted.toSeq
    assert(rowsAfter === rowsBefore)
    val servedAfter = PqIndex.searchIndex(spark, idx, query, nprobe = 3).collect()
      .map(_.toString).toSeq
    assert(servedAfter === servedBefore)

    // pruning survives the rewrite
    val df = PqIndex.searchIndex(spark, idx, query, nprobe = 2)
    df.collect()
    assert(df.queryExecution.executedPlan.toString
      .contains("PartitionFilters: [cluster_id"), "pruning lost after compaction")
  }

  test("rowsPerFile splits an oversized partition into multiple files") {
    val idx = tmp("graft-compact-split")
    IvfIndex.writeIndex(spark, Sf, idx)
    val rows = spark.read.parquet(s"$idx/vectors").count()
    val clusters = spark.read.parquet(s"$idx/vectors")
      .select("cluster_id").distinct().count()
    // tiny rowsPerFile → every cluster splits into several chunk files
    val n = IndexMaintenance.compactIndex(spark, idx, rowsPerFile = 16)
    assert(n > clusters, s"expected chunked files, got $n for $clusters clusters")
    assert(spark.read.parquet(s"$idx/vectors").count() === rows)
  }

  test("LSH layout compacts by bucket and serving is unchanged") {
    val idx = tmp("graft-compact-lsh")
    LshAnn.writeIndex(spark, Sf, idx)
    val servedBefore = LshAnn.searchIndex(spark, idx, query, k = 5, probes = 2)
      .collect().map(_.toString).toSeq
    val n = IndexMaintenance.compactIndex(spark, idx)
    val buckets = spark.read.parquet(s"$idx/vectors").select("bucket").distinct().count()
    assert(n === buckets)
    val servedAfter = LshAnn.searchIndex(spark, idx, query, k = 5, probes = 2)
      .collect().map(_.toString).toSeq
    assert(servedAfter === servedBefore)
  }

  test("a non-index directory is rejected, not silently rewritten") {
    val idx = tmp("graft-compact-bogus")
    Tables.documents(spark, Sf).limit(5).write.parquet(s"$idx/vectors")
    intercept[IllegalArgumentException] {
      IndexMaintenance.compactIndex(spark, idx)
    }
  }
}
