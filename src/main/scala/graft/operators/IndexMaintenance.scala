package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction for the persisted index layouts — the
  * operational complement of streaming append (IndexStream): every
  * micro-batch leaves a part-file per touched partition, so a
  * long-running append stream accumulates thousands of tiny files per
  * cluster/bucket directory, and at 100 TB the scan's task-planning and
  * footer-reading overhead grows with file count, not data.
  *
  * `compactIndex` rewrites the vectors layout with each partition
  * value's rows packed into ⌈rows/rowsPerFile⌉ files (repartition by
  * the partition column + the writer's maxRecordsPerFile roll), and
  * swaps the new directory in atomically (local-fs rename; on an object store this
  * step is a manifest/metastore pointer update — same note as
  * Ingest.compactCorpus). Centroids/codebooks are metadata and are not
  * touched; serving is identical before and after
  * (IndexMaintenanceSpec pins results and the surviving
  * PartitionFilters pruning).
  *
  * Streaming-sink interaction: a parquet streaming sink keeps a
  * `_spark_metadata` log under the vectors dir, and batch readers
  * honor it (files not in the log are invisible). Compaction rewrites
  * the directory WITHOUT the log — correct for batch reads — but a
  * stream resumed into the compacted directory would start a fresh
  * sink log that shadows the compacted files for batch readers. The
  * operational contract is therefore: stop the append stream, compact,
  * resume with a NEW sink directory/log epoch (the standard
  * log-rotation move for compacted streaming sinks);
  * IndexMaintenanceSpec pins the stop→compact→serve path.
  */
object IndexMaintenance {

  /** Compact `indexPath/vectors` (IVF/PQ layouts: `cluster_id`; LSH:
    * `bucket` — auto-detected). Returns the parquet file count after.
    */
  def compactIndex(spark: SparkSession, indexPath: String,
      rowsPerFile: Long = 1L << 20): Long = {
    val vecDir = s"$indexPath/vectors"
    val df = spark.read.parquet(vecDir)
    val partCol = df.schema.fieldNames.find(n => n == "cluster_id" || n == "bucket")
      .getOrElse(throw new IllegalArgumentException(
        s"$vecDir is not a recognized index layout (no cluster_id/bucket column)"))
    val tmp = vecDir + "_compacting"
    // one shuffle task per partition value (hash-sharing tasks is fine:
    // partitionBy still writes per-value files), with the writer rolling
    // to a new part-file every rowsPerFile records — so each value ends
    // up with ⌈rows/rowsPerFile⌉ files regardless of input file count
    df.repartition(col(partCol))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", rowsPerFile)
      .partitionBy(partCol).parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tmp), spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(vecDir)
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
    parquetFileCount(spark, vecDir)
  }

  /** Recursive .parquet part-file count under a directory. */
  def parquetFileCount(spark: SparkSession, dir: String): Long = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(new org.apache.hadoop.fs.Path(dir), true)
    var n = 0L
    while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
    n
  }
}
