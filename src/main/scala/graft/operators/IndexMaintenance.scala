package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction + epoch layout for the persisted indexes —
  * the operational complement of streaming append (IndexStream): every
  * micro-batch leaves a part-file per touched partition, so a
  * long-running append stream accumulates thousands of tiny files per
  * cluster/bucket directory, and at 100 TB the scan's task-planning and
  * footer-reading overhead grows with file count, not data.
  *
  * `compactIndex` rewrites the vector layout — the base `vectors` dir
  * plus any resume epochs (`vectors_e<k>`) — with each partition
  * value's rows packed into ⌈rows/rowsPerFile⌉ files (repartition by
  * the partition column + the writer's maxRecordsPerFile roll), then
  * swaps the new directory in: the old dir is renamed ASIDE first
  * (`vectors_old`), the new one renamed into place, and only then are
  * the old dir and the folded epoch dirs deleted — a crash at any
  * point leaves every row recoverable on disk (ADVICE r7; on an
  * object store the swap is a manifest/metastore pointer update —
  * same note as Ingest.compactCorpus). Centroids/codebooks are
  * metadata and are not touched; serving is identical before and
  * after (IndexMaintenanceSpec pins results and the surviving
  * PartitionFilters pruning).
  *
  * Streaming-sink interaction (the log-rotation contract): a parquet
  * streaming sink keeps a `_spark_metadata` log under its sink dir,
  * and batch readers honor it (files not in the log are invisible).
  * Compaction rewrites the directory WITHOUT the log — correct for
  * batch reads — but a stream resumed into the compacted base dir
  * would start a fresh sink log that shadows every compacted file.
  * Compaction therefore leaves a `_graft_compacted` marker (holding
  * the next epoch number) that the IndexStream append helpers check:
  * a resume into the base dir FAILS FAST, and the caller resumes into
  * `nextEpochDir(...)` — a fresh sibling dir written log-free via
  * foreachBatch as `batch=<id>` overwrite subdirs (idempotent under
  * micro-batch replay; a resumed query's batch ids continue from the
  * checkpoint, which a fresh sink log could not represent) — keeping
  * the same source checkpoint, so only unseen input files flow into
  * the new epoch. Serving reads base + epochs as a union of
  * single-root scans ([[vectorsDf]]); partition pruning applies to
  * every branch. The next compaction folds the epochs back into the
  * base. Epoch numbers are monotone (never reused), so a stale
  * checkpoint can never resurrect a folded epoch directory.
  */
object IndexMaintenance {

  private def fsOf(spark: SparkSession, dir: String): FileSystem =
    FileSystem.get(new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)

  private def markerPath(indexPath: String) =
    new Path(s"$indexPath/vectors/_graft_compacted")

  /** Parsed `_graft_compacted` marker: the next epoch number a stream
    * resume may use, plus the epoch numbers the LAST compaction folded
    * into the base dir (so a crash between the base swap and the
    * epoch-dir deletions never double-serves those rows — [[epochDirs]]
    * skips them and the next compaction deletes the leftovers).
    * Format: line 1 = epoch int; line 2 (optional) = `folded=1,2,3`.
    */
  private case class MarkerInfo(nextEpoch: Int, folded: Set[Int])

  private def readMarker(spark: SparkSession, indexPath: String): Option[MarkerInfo] = {
    val fs = fsOf(spark, indexPath)
    val m = markerPath(indexPath)
    if (!fs.exists(m)) None
    else {
      val in = fs.open(m)
      val lines = try scala.io.Source.fromInputStream(in).getLines().toList
                  finally in.close()
      val folded = lines.collectFirst { case s if s.startsWith("folded=") =>
        s.stripPrefix("folded=").split(",").filter(_.nonEmpty).map(_.trim.toInt).toSet
      }.getOrElse(Set.empty[Int])
      Some(MarkerInfo(lines.head.trim.toInt, folded))
    }
  }

  private def markerBytes(epoch: Int, folded: Seq[Int]): Array[Byte] = {
    val body = if (folded.isEmpty) s"$epoch\n"
               else s"$epoch\nfolded=${folded.sorted.mkString(",")}\n"
    body.getBytes("UTF-8")
  }

  /** True once the index has been compacted at least once — the point
    * after which streaming appends must use a fresh epoch dir.
    */
  def isCompacted(spark: SparkSession, indexPath: String): Boolean =
    fsOf(spark, indexPath).exists(markerPath(indexPath))

  /** Epoch number the next resume should use (monotone across
    * compactions — epoch dirs are never reused, so a stale checkpoint
    * can never write into a directory whose sink log was deleted).
    * Folded-but-not-yet-deleted leftovers count toward the max, so a
    * crash mid-cleanup cannot cause a number reuse either.
    */
  private def nextEpoch(spark: SparkSession, indexPath: String): Int = {
    val fromMarker = readMarker(spark, indexPath).map(_.nextEpoch).getOrElse(1)
    math.max(fromMarker, allEpochDirs(spark, indexPath).map(epochOf).maxOption.getOrElse(0) + 1)
  }

  /** The sink directory a post-compaction stream resume should write
    * to: `indexPath/vectors_e<k>` for the smallest never-used k.
    */
  def nextEpochDir(spark: SparkSession, indexPath: String): String =
    s"$indexPath/vectors_e${nextEpoch(spark, indexPath)}"

  private def epochOf(dir: String): Int =
    dir.substring(dir.lastIndexOf("_e") + 2).toInt

  /** Every on-disk `vectors_e<k>` dir, live or folded-leftover — the
    * set that bounds [[nextEpoch]]'s monotonicity.
    */
  private def allEpochDirs(spark: SparkSession, indexPath: String): Seq[String] = {
    val fs = fsOf(spark, indexPath)
    val base = new Path(indexPath)
    if (!fs.exists(base)) Seq.empty
    else fs.listStatus(base).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.matches("vectors_e\\d+"))
      .map(_.getPath.toString)
      .sortBy(epochOf)
  }

  /** Epoch dirs that SERVE: contain data files and are not declared
    * folded by the marker (a folded dir still on disk is a crash
    * leftover whose rows already live in the compacted base — reading
    * it would serve those rows twice).
    */
  private def epochDirs(spark: SparkSession, indexPath: String): Seq[String] = {
    val folded = readMarker(spark, indexPath).map(_.folded).getOrElse(Set.empty[Int])
    allEpochDirs(spark, indexPath)
      .filterNot(d => folded.contains(epochOf(d)))
      .filter(d => parquetFileCount(spark, d) > 0)
  }

  /** All live vector rows of an index: the base layout plus any resume
    * epochs, each read as its OWN root so a streaming sink's
    * `_spark_metadata` log keeps filtering uncommitted files per
    * epoch, and partition pruning applies to every branch of the
    * union.
    */
  def vectorsDf(spark: SparkSession, indexPath: String): DataFrame = {
    val base = spark.read.parquet(s"$indexPath/vectors")
    val cols = base.columns.toIndexedSeq.map(col)
    // epochs carry an extra batch=<id> partition level (the idempotent
    // foreachBatch layout) — project it away to the base schema
    epochDirs(spark, indexPath)
      .map(d => spark.read.parquet(d).select(cols: _*))
      .foldLeft(base)(_ unionByName _)
  }

  /** Compact `indexPath/vectors` (+ any epoch dirs; IVF/PQ layouts:
    * `cluster_id`; LSH: `bucket` — auto-detected). Returns the parquet
    * file count after.
    */
  def compactIndex(spark: SparkSession, indexPath: String,
      rowsPerFile: Long = 1L << 20): Long = {
    val vecDir = s"$indexPath/vectors"
    val fs = fsOf(spark, indexPath)
    // reconcile a prior crash: epoch dirs the current marker declares
    // folded hold rows that already live in the compacted base (the
    // previous run died between its base swap and these deletes)
    val prevFolded = readMarker(spark, indexPath).map(_.folded).getOrElse(Set.empty[Int])
    allEpochDirs(spark, indexPath)
      .filter(d => prevFolded.contains(epochOf(d)))
      .foreach(d => fs.delete(new Path(d), true))
    val epochs = epochDirs(spark, indexPath)
    val df = vectorsDf(spark, indexPath)
    val partCol = df.schema.fieldNames
      .find(n => n == "cluster_id" || n == "bucket" || n == "band")
      .getOrElse(throw new IllegalArgumentException(
        s"$vecDir is not a recognized index layout (no cluster_id/bucket/band column)"))
    val epoch = nextEpoch(spark, indexPath)
    val tmp = vecDir + "_compacting"
    // one shuffle task per partition value (hash-sharing tasks is fine:
    // partitionBy still writes per-value files), with the writer rolling
    // to a new part-file every rowsPerFile records — so each value ends
    // up with ⌈rows/rowsPerFile⌉ files regardless of input file count
    df.repartition(col(partCol))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", rowsPerFile)
      .partitionBy(partCol).parquet(tmp)
    // the marker travels INSIDE tmp, so it lands atomically with the
    // tmp→vectors rename (ADVICE r8: a post-swap write left a window
    // where a compacted, sink-log-free base dir read isCompacted==false
    // and a stream resume's fresh sink log shadowed every row). It also
    // records which epochs this compaction folded, so vectorsDf skips
    // their leftovers if the deletes below never run.
    // the folded set ACCUMULATES the previous marker's entries: if the
    // reconcile delete above failed silently (fs.delete returns false on
    // e.g. a transient object-store error), the leftover must stay
    // skip-listed — epoch numbers are never reused, so stale entries for
    // long-deleted dirs are harmless
    val preMarker = fs.create(new Path(tmp, "_graft_compacted"), true)
    try preMarker.write(markerBytes(epoch, (prevFolded ++ epochs.map(epochOf)).toSeq))
    finally preMarker.close()
    val dst = new Path(vecDir)
    val aside = new Path(vecDir + "_old")
    // swap with the old data renamed aside FIRST: a crash between any
    // two steps leaves every row on disk (vectors_old + epochs), never
    // a half-deleted serving dir (ADVICE r7). The aside dir carries the
    // PREVIOUS marker away with it, so from rename to rename the base
    // marker is always the one matching the base's contents.
    fs.delete(aside, true)
    if (fs.exists(dst) && !fs.rename(dst, aside))
      throw new java.io.IOException(s"could not move $dst aside")
    if (!fs.rename(new Path(tmp), dst))
      throw new java.io.IOException(s"could not move $tmp into place")
    fs.delete(aside, true)
    epochs.foreach(e => fs.delete(new Path(e), true))
    parquetFileCount(spark, vecDir)
  }

  /** Recursive .parquet part-file count under a directory. */
  def parquetFileCount(spark: SparkSession, dir: String): Long = {
    val fs = fsOf(spark, dir)
    val p = new Path(dir)
    if (!fs.exists(p)) return 0L
    val it = fs.listFiles(p, true)
    var n = 0L
    while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
    n
  }
}
