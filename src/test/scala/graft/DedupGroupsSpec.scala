package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, DedupGroups, DedupIndex}

/** r11 (r10 verdict #4): duplicate GROUPS maintained across ingests.
  * After every append, the incrementally-folded groups table must equal
  * the batch dedup_components labeling on the grown corpus, and
  * re-delivering a batch's pairs must be a no-op (exactly-once without
  * a log — the DedupIndexSpec pattern).
  */
class DedupGroupsSpec extends AnyFunSuite {
  import SparkSuite._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private def docs: DataFrame =
    Tables.fanOut(Tables.documents(spark, Sf)).select(col("doc_id"), col("text"))

  private val base = docs.filter(pmod(col("doc_id"), lit(3)) =!= 2)
  private val wave1 = docs.filter(pmod(col("doc_id"), lit(3)) === 2 &&
    pmod(col("doc_id"), lit(2)) === 0)
  private val wave2 = docs.filter(pmod(col("doc_id"), lit(3)) === 2 &&
    pmod(col("doc_id"), lit(2)) === 1)

  /** Batch-chain verified pairs of an arbitrary frame — the exact
    * Dedup.ngramJaccard semantics (LSH candidates, string-shingle
    * jaccard, r6-rounded threshold), frame-parameterized.
    */
  private def batchVerifiedPairs(d: DataFrame, thr: Double = 0.5): DataFrame = {
    val bands = Dedup.bandSignaturesOf(d)
    val cand = bands.select(col("doc_id").as("doc_a"), col("band"), col("sig"))
      .join(bands.select(col("doc_id").as("doc_b"), col("band"), col("sig")),
        Seq("band", "sig"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    val sets = d.select(col("doc_id"),
      graft.functions.TextExprs.shingles(
        graft.functions.TextFunctions.tokens(col("text"))).as("sh"))
    cand
      .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .withColumn("ni", size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("jaccard", graft.functions.VectorFunctions.r6(
        col("ni") / (lit(1.0) *
          (size(col("sh_a")).cast("long") + size(col("sh_b")) - col("ni")))))
      .filter(col("jaccard") >= thr)
      .select("doc_a", "doc_b")
  }

  private def refGroups(d: DataFrame): Seq[(Long, Long)] =
    Dedup.componentsOfPairs(batchVerifiedPairs(d))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq

  private def gotGroups(idx: String): Seq[(Long, Long)] =
    DedupGroups.groupsDf(spark, idx)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq

  private def verifiedIncoming(idx: String, incoming: DataFrame,
      corpus: DataFrame): DataFrame =
    DedupIndex.newNearDups(spark, idx, incoming, corpus)
      .filter(col("jaccard") >= 0.5)
      .select("doc_a", "doc_b")

  test("incremental groups == batch components on the grown corpus after every append") {
    val idx = tmp("graft-groups")
    DedupIndex.writeBandIndex(base, idx)
    DedupGroups.initGroups(spark, idx, batchVerifiedPairs(base))
    assert(gotGroups(idx) === refGroups(base))

    // wave 1: adjudicate against the index, fold, append signatures
    DedupGroups.foldPairs(spark, idx, verifiedIncoming(idx, wave1, base))
    val grown1 = base.unionByName(wave1)
    assert(gotGroups(idx) === refGroups(grown1), "diverged after wave 1")
    Dedup.bandSignaturesOf(wave1).write.mode("append")
      .partitionBy("band").parquet(s"$idx/vectors")

    // wave 2 against the GROWN index
    val v2 = verifiedIncoming(idx, wave2, grown1)
    DedupGroups.foldPairs(spark, idx, v2)
    assert(gotGroups(idx) === refGroups(docs), "diverged after wave 2")
    assert(gotGroups(idx).nonEmpty, "no duplicate groups — spec is vacuous")

    // exactly-once: re-delivering wave 2's pairs is a no-op
    val beforeRedeliver = gotGroups(idx)
    DedupGroups.foldPairs(spark, idx, v2)
    assert(gotGroups(idx) === beforeRedeliver)

    // merges actually happened across ingests (a fold that only ever
    // appended singleton labels would pass a weaker check)
    val nGroups = beforeRedeliver.map(_._2).distinct.size
    assert(nGroups < beforeRedeliver.size, "no group has more than one doc")
  }

  test("r12: a fold rewrites ONLY the buckets holding touched groups or endpoints") {
    import spark.implicits._
    val idx = tmp("graft-groups-buckets")
    // seed groups spread across buckets: {1,2} {1001,1002} {5003,5004}
    DedupGroups.initGroups(spark, idx,
      Seq((1L, 2L), (1001L, 1002L), (5003L, 5004L)).toDF("doc_a", "doc_b"))
    def bucketsOf(ids: Seq[Long]): Set[Long] =
      ids.toDF("doc_id").select(DedupGroups.bucketOf(col("doc_id")).as("gb"))
        .collect().map(_.getLong(0)).toSet
    def fileSets(): Map[String, Set[(String, Long)]] = {
      val root = new java.io.File(s"$idx/groups")
      root.listFiles().filter(_.isDirectory).map(d =>
        d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => (f.getName, f.length())).toSet).toMap
    }
    val before = fileSets()
    assert(before.size >= 2, "seed groups landed in one bucket — pin is vacuous")

    // merge {1,2} with {1001,1002} via the pair (2, 1001): the blast
    // radius is the buckets of docs 1, 2, 1001, 1002 — nothing else
    DedupGroups.foldPairs(spark, idx, Seq((2L, 1001L)).toDF("doc_a", "doc_b"))
    val touched = bucketsOf(Seq(1L, 2L, 1001L, 1002L)).map(b => s"gb=$b")
    val after = fileSets()
    before.foreach { case (dir, files) =>
      if (!touched.contains(dir))
        assert(after(dir) === files, s"untouched bucket $dir was rewritten")
    }
    // content merged to the group minimum everywhere
    val got = DedupGroups.groupsDf(spark, idx)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got === Seq((1L, 1L), (2L, 1L), (1001L, 1L), (1002L, 1L),
      (5003L, 5003L), (5004L, 5003L)))

    // re-delivery: content is a no-op AND the untouched buckets again
    // cross by rename (byte-identical)
    val mid = fileSets()
    DedupGroups.foldPairs(spark, idx, Seq((2L, 1001L)).toDF("doc_a", "doc_b"))
    val redelivered = bucketsOf(Seq(2L, 1001L)).map(b => s"gb=$b")
    mid.foreach { case (dir, files) =>
      if (!redelivered.contains(dir))
        assert(fileSets()(dir) === files, s"bucket $dir rewritten on re-delivery")
    }
    assert(DedupGroups.groupsDf(spark, idx)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq === got)
  }

  test("r13 (ADVICE r12): a fold that crashes mid-swap reconciles on the next read") {
    import spark.implicits._
    def initAt(idx: String): Unit = DedupGroups.initGroups(spark, idx,
      Seq((1L, 2L), (1001L, 1002L), (5003L, 5004L)).toDF("doc_a", "doc_b"))
    def rows(idx: String): Seq[(Long, Long)] =
      DedupGroups.groupsDf(spark, idx)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq

    // reference run: the fold completing normally
    val ref = tmp("graft-groups-crashref")
    initAt(ref)
    val preFold = rows(ref)
    DedupGroups.foldPairs(spark, ref, Seq((2L, 1001L)).toDF("doc_a", "doc_b"))
    val want = rows(ref)
    assert(want !== preFold)

    // crash window 1 (the ADVICE scenario): groups renamed aside, the
    // fully-written staged dir (touched buckets + keep manifest) never
    // renamed in — dst is GONE while _complete still certifies the
    // layout. Manufacture it from the reference run's staged content:
    // the touched bucket dirs of the completed fold ARE what the
    // crashed fold had staged.
    val idx = tmp("graft-groups-crash")
    initAt(idx)
    val gDir = new java.io.File(s"$idx/groups")
    val preDirNames = gDir.listFiles().filter(_.isDirectory).map(_.getName).toSet
    // the fold of (2, 1001) touches exactly the buckets of the merged
    // groups' members {1, 2, 1001, 1002} (the r12 blast-radius pin) —
    // those dirs of the completed reference run ARE its staged content
    val touched = Seq(1L, 2L, 1001L, 1002L).toDF("doc_id")
      .select(DedupGroups.bucketOf(col("doc_id")).as("gb"))
      .collect().map(r => s"gb=${r.getLong(0)}").toSet
    val keeps = preDirNames -- touched
    assert(touched.nonEmpty && keeps.nonEmpty, "degenerate split — pin is vacuous")
    val staged = new java.io.File(s"$idx/groups_staging"); staged.mkdirs()
    touched.foreach { name =>
      val dstDir = new java.io.File(staged, name); dstDir.mkdirs()
      new java.io.File(s"$ref/groups/$name").listFiles().foreach { f =>
        java.nio.file.Files.copy(f.toPath,
          new java.io.File(dstDir, f.getName).toPath)
      }
    }
    java.nio.file.Files.write(
      new java.io.File(staged, "_graft_keep_dirs").toPath,
      keeps.toSeq.sorted.mkString("\n").getBytes("UTF-8"))
    assert(gDir.renameTo(new java.io.File(s"$idx/groups_old")))
    spark.catalog.refreshByPath(s"$idx/groups")
    // the read path must roll the swap FORWARD and serve the folded state
    assert(rows(idx) === want)
    assert(!new java.io.File(s"$idx/groups_old").exists())
    assert(!new java.io.File(s"$idx/groups_staging").exists())
    assert(!new java.io.File(s"$idx/groups/_graft_keep_dirs").exists())
    // and a follow-up fold of the same pair is the usual no-op
    DedupGroups.foldPairs(spark, idx, Seq((2L, 1001L)).toDF("doc_a", "doc_b"))
    assert(rows(idx) === want)

    // crash window 2: aside renamed, staged LOST (or never written) —
    // roll BACK to the pre-swap state
    val idx2 = tmp("graft-groups-crash2")
    initAt(idx2)
    val pre2 = rows(idx2)
    assert(new java.io.File(s"$idx2/groups")
      .renameTo(new java.io.File(s"$idx2/groups_old")))
    spark.catalog.refreshByPath(s"$idx2/groups")
    assert(rows(idx2) === pre2)
    assert(!new java.io.File(s"$idx2/groups_old").exists())
  }

  test("r13 (ADVICE r12): concurrent folds serialize on the layout lock") {
    import spark.implicits._
    val idx = tmp("graft-groups-lock")
    DedupGroups.initGroups(spark, idx, Seq((1L, 2L)).toDF("doc_a", "doc_b"))
    val lock = new java.io.File(s"$idx/_groups_fold_lock")
    // a live holder (fresh mtime) blocks the fold loudly
    assert(lock.createNewFile())
    val ex = intercept[IllegalStateException](
      DedupGroups.foldPairs(spark, idx, Seq((2L, 3L)).toDF("doc_a", "doc_b")))
    assert(ex.getMessage.contains("lock"))
    // a stale lock (presumed-dead holder) is broken and the fold runs
    assert(lock.setLastModified(System.currentTimeMillis() - 16L * 60 * 1000))
    DedupGroups.foldPairs(spark, idx, Seq((2L, 3L)).toDF("doc_a", "doc_b"))
    assert(DedupGroups.groupsDf(spark, idx)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ===
      Seq((1L, 1L), (2L, 1L), (3L, 1L)))
    // the lock is released after a successful fold
    assert(!lock.exists())
  }

  test("final incremental state == the graded batch components labeling") {
    val idx = tmp("graft-groups-graded")
    DedupIndex.writeBandIndex(base, idx)
    DedupGroups.initGroups(spark, idx, batchVerifiedPairs(base))
    DedupGroups.foldPairs(spark, idx, verifiedIncoming(idx, wave1, base))
    Dedup.bandSignaturesOf(wave1).write.mode("append")
      .partitionBy("band").parquet(s"$idx/vectors")
    DedupGroups.foldPairs(spark, idx,
      verifiedIncoming(idx, wave2, base.unionByName(wave1)))
    val graded = Dedup.components(spark, Sf)
      .select(col("doc_id"), col("component"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(gotGroups(idx) === graded)
  }
}
