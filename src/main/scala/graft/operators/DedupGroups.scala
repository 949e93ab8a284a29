package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental duplicate-GROUP maintenance (r11, r10 verdict #4):
  * [[DedupIndex]] adjudicates an ingest batch's near-dup PAIRS against
  * the persisted band index, but group-level decisions (components /
  * canonical keeper / drop) still required the batch chain per corpus
  * state. This maintains the transitive groups ACROSS ingests:
  *
  *  - `indexPath/groups` persists (doc_id, component) for every doc in
  *    a verified near-dup pair (component = min doc_id of the group,
  *    the same canonical-keeper labeling [[Dedup.components]] emits) —
  *    pairs-scale metadata next to the band index, never corpus-scale.
  *  - [[foldPairs]] folds one batch's verified pairs in. New pairs can
  *    only MERGE groups, never split, so the fold is: attach current
  *    labels to the pair endpoints (map-side broadcast-or-shuffle join
  *    against the groups table), contract to the QUOTIENT graph of
  *    distinct touched labels, run min-label propagation on that tiny
  *    graph only ([[Dedup.componentsOfPairs]] — re-propagation cost is
  *    proportional to touched groups, not the corpus), then rewrite
  *    the table with the label mapping applied map-side (untouched
  *    rows pass through; staged + atomic swap).
  *
  * The fold is a pure function of (current table ∪ batch pairs), so
  * re-delivering a batch is a no-op: its pairs' endpoints already
  * share labels, the quotient graph is empty, and the rewrite
  * reproduces the same rows — exactly-once without a log
  * (DedupGroupsSpec pins it, the DedupIndexSpec re-delivery pattern).
  * Because labels merge to the group minimum, incremental state after
  * any sequence of appends equals the batch [[Dedup.components]] on
  * the grown corpus — spec-enforced after EVERY append, not asserted.
  */
object DedupGroups {

  /** Current group rows (doc_id, component). */
  def groupsDf(spark: SparkSession, indexPath: String): DataFrame =
    spark.read.parquet(s"$indexPath/groups")

  /** Staged + atomic-swap rewrite of the groups table (the stats-table
    * discipline: a crash leaves either the old or the new table).
    */
  private def writeGroups(spark: SparkSession, indexPath: String,
      labels: DataFrame): Unit = {
    val staged = s"$indexPath/groups_staging"
    labels.select(col("doc_id"), col("component"))
      .write.mode("overwrite").parquet(staged)
    val fs = new Path(indexPath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dst = new Path(s"$indexPath/groups")
    val aside = new Path(s"$indexPath/groups_old")
    fs.delete(aside, true)
    if (fs.exists(dst) && !fs.rename(dst, aside))
      throw new java.io.IOException(s"could not move $dst aside")
    if (!fs.rename(new Path(staged), dst))
      throw new java.io.IOException(s"could not move $staged into place")
    fs.delete(aside, true)
  }

  /** Initialize the groups table from the verified pairs of the
    * indexed corpus (one batch components run — the offline build
    * stage, like the band index itself).
    */
  def initGroups(spark: SparkSession, indexPath: String,
      verifiedPairs: DataFrame): Unit =
    writeGroups(spark, indexPath, Dedup.componentsOfPairs(verifiedPairs))

  /** Fold one ingest batch's verified near-dup pairs (doc_a, doc_b —
    * [[DedupIndex.newNearDups]] output filtered at the drop threshold)
    * into the persisted groups. See object doc for the shape.
    */
  def foldPairs(spark: SparkSession, indexPath: String,
      verifiedPairs: DataFrame): Unit = {
    val g = groupsDf(spark, indexPath)
    // endpoints carry their CURRENT label (or themselves if unseen)
    val p = verifiedPairs.select(col("doc_a"), col("doc_b"))
      .join(g.select(col("doc_id").as("doc_a"), col("component").as("la0")),
        Seq("doc_a"), "left")
      .join(g.select(col("doc_id").as("doc_b"), col("component").as("lb0")),
        Seq("doc_b"), "left")
      .select(col("doc_a"), col("doc_b"),
        coalesce(col("la0"), col("doc_a")).as("la"),
        coalesce(col("lb0"), col("doc_b")).as("lb"))
      .transform(graft.plans.ScanShare.shared)
    // quotient graph: one node per TOUCHED label — merging runs on
    // this tiny graph only, never on the corpus or the full table
    val labelEdges = p.filter(col("la") =!= col("lb"))
      .select(col("la").as("doc_a"), col("lb").as("doc_b")).distinct()
    val mapping = Dedup.componentsOfPairs(labelEdges)
      .select(col("doc_id").as("component"), col("component").as("merged"))
    val endpoints = p.select(col("doc_a").as("doc_id"), col("la").as("component"))
      .union(p.select(col("doc_b").as("doc_id"), col("lb").as("component")))
    // map-side label rewrite: untouched rows see a null mapping and
    // pass through; the doc-level min dedups re-delivered endpoints
    val folded = g.unionByName(endpoints)
      .join(broadcast(mapping), Seq("component"), "left")
      .select(col("doc_id"),
        coalesce(col("merged"), col("component")).as("component"))
      .groupBy(col("doc_id")).agg(min(col("component")).as("component"))
    writeGroups(spark, indexPath, folded)
  }
}
