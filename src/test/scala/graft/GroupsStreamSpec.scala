package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, DedupGroups, DedupIndex}
import graft.streaming.IndexStream

/** r13 (r12 verdict #5): the drop-ledger groups maintained FROM THE
  * STREAM — per micro-batch, verify new-vs-known pairs off the band
  * index and fold touched buckets, then append the batch's signatures
  * so later batches see it as known. Pins: stream ≡ batch components
  * after EVERY micro-batch, restart on the same checkpoint re-delivers
  * nothing, and a fold's blast radius stays bounded by the
  * endpoint-label buckets (the DedupGroupsSpec pattern).
  */
class GroupsStreamSpec extends AnyFunSuite {
  import SparkSuite._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private def docs: DataFrame =
    Tables.fanOut(Tables.documents(spark, Sf)).select(col("doc_id"), col("text"))

  private val base = docs.filter(pmod(col("doc_id"), lit(3)) =!= 2)
  private val wave1 = docs.filter(pmod(col("doc_id"), lit(3)) === 2 &&
    pmod(col("doc_id"), lit(2)) === 0)
  private val wave2 = docs.filter(pmod(col("doc_id"), lit(3)) === 2 &&
    pmod(col("doc_id"), lit(2)) === 1)

  /** Batch-chain verified pairs (the DedupGroupsSpec reference). */
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

  test("stream-maintained groups == batch components after every micro-batch; " +
      "checkpoint restart re-delivers nothing; blast radius bounded") {
    val idx = tmp("graft-gstream-idx")
    val groups = tmp("graft-gstream-g")
    val ckpt = tmp("graft-gstream-ckpt")
    val staging = tmp("graft-gstream-src")
    val corpusDir = tmp("graft-gstream-corpus")
    DedupIndex.writeBandIndex(base, idx)
    DedupGroups.initGroups(spark, groups, batchVerifiedPairs(base))
    base.write.mode("overwrite").parquet(s"$corpusDir/docs")
    def corpus() = spark.read.parquet(s"$corpusDir/docs")
    def gotGroups(): Seq[(Long, Long)] =
      DedupGroups.groupsDf(spark, groups)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    def fileSets(): Map[String, Set[(String, Long)]] = {
      val root = new java.io.File(s"$groups/groups")
      root.listFiles().filter(_.isDirectory).map(d =>
        d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => (f.getName, f.length())).toSet).toMap
    }

    // one file per wave: each ingest batch is ONE micro-batch, so the
    // corpus sink (which this spec grows between waves) always covers
    // earlier batches — the documented corpusDocs contract
    wave1.coalesce(1).write.parquet(s"$staging/w0")
    def mkStream() = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$staging/w*")
    val q = IndexStream.foldGroupsFromStream(spark, idx, groups, mkStream(),
      () => corpus(), ckpt, minJaccard = 0.5)
    try {
      q.processAllAvailable()
      assert(gotGroups() === refGroups(base.unionByName(wave1)),
        "diverged after micro-batch 1")

      // the ingest sink grows; capture pre-wave-2 state for the pins
      wave1.write.mode("append").parquet(s"$corpusDir/docs")
      val preMap = gotGroups().toMap
      val preFiles = fileSets()
      // the pairs the stream will fold (deterministic re-derivation)
      val wavePairs = DedupIndex.newNearDups(spark, idx, wave2, corpus(), 0.5)
        .select(col("doc_a"), col("doc_b"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(wavePairs.nonEmpty, "wave 2 found no pairs — spec is vacuous")

      wave2.coalesce(1).write.parquet(s"$staging/w1")
      q.processAllAvailable()
      assert(gotGroups() === refGroups(docs), "diverged after micro-batch 2")

      // blast radius: every rewritten bucket dir holds a fold endpoint
      // or a row whose pre-fold component is an endpoint's label (the
      // touched-label superset — untouched buckets crossed by rename)
      val endpoints = wavePairs.flatMap(p => Seq(p._1, p._2)).toSet
      val labels = endpoints.map(d => preMap.getOrElse(d, d))
      val touchedDocs = endpoints ++ preMap.collect {
        case (doc, comp) if labels.contains(comp) => doc }
      import spark.implicits._
      val allowed = touchedDocs.toSeq.toDF("doc_id")
        .select(DedupGroups.bucketOf(col("doc_id")).as("gb"))
        .collect().map(r => s"gb=${r.getLong(0)}").toSet
      val changed = preFiles.keySet.filter(d => fileSets().get(d) != preFiles.get(d))
      assert(changed.subsetOf(allowed),
        s"buckets ${changed -- allowed} rewritten outside the blast radius")
      assert((preFiles.keySet -- allowed).nonEmpty,
        "every bucket was in the blast radius — pin is vacuous")
    } finally q.stop()

    // restart on the SAME checkpoint: the source re-delivers nothing,
    // groups are unchanged (exactly-once across restarts)
    val before = gotGroups()
    val q2 = IndexStream.foldGroupsFromStream(spark, idx, groups, mkStream(),
      () => corpus(), ckpt, minJaccard = 0.5)
    try q2.processAllAvailable() finally q2.stop()
    assert(gotGroups() === before)
  }

  test("a batch replayed across a RESTART overwrites its pre-crash epoch subdir " +
      "— band signatures are never folded in twice (ADVICE r13)") {
    import graft.operators.IndexMaintenance
    val idx = tmp("graft-greplay-idx")
    val groups = tmp("graft-greplay-g")
    val ckpt = tmp("graft-greplay-ckpt")
    val staging = tmp("graft-greplay-src")
    val corpusDir = tmp("graft-greplay-corpus")
    DedupIndex.writeBandIndex(base, idx)
    DedupGroups.initGroups(spark, groups, batchVerifiedPairs(base))
    base.write.mode("overwrite").parquet(s"$corpusDir/docs")
    // pre-crash state: a prior run appended batch 0's signatures into
    // vectors_e1, then died BEFORE the checkpoint commit — the restart
    // resolves a fresh epoch (e2) and replays batch 0
    Dedup.bandSignaturesOf(wave1).write.mode("overwrite").partitionBy("band")
      .parquet(s"${IndexMaintenance.nextEpochDir(spark, idx)}/batch=0")
    val sigCount = Dedup.bandSignaturesOf(wave1).count()
    wave1.coalesce(1).write.parquet(s"$staging/w0")
    val q = IndexStream.foldGroupsFromStream(spark, idx, groups,
      spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$staging/w*"),
      () => spark.read.parquet(s"$corpusDir/docs"), ckpt, minJaccard = 0.5)
    try q.processAllAvailable() finally q.stop()
    // the fold itself is idempotent — stream ≡ batch still holds
    assert(DedupGroups.groupsDf(spark, groups)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      === refGroups(base.unionByName(wave1)))
    // the replay's signatures OVERWROTE vectors_e1/batch=0 — exactly
    // one epoch holds the batch, and the served signature rows for the
    // wave's docs are one copy, not two
    val holders = new java.io.File(idx).listFiles()
      .filter(f => f.isDirectory && f.getName.matches("vectors_e\\d+"))
      .filter(e => new java.io.File(e, "batch=0").exists())
      .map(_.getName).toSeq.sorted
    assert(holders === Seq("vectors_e1"),
      s"replay landed in $holders instead of overwriting vectors_e1")
    val waveIds = wave1.select("doc_id").collect().map(_.getLong(0)).toSet
    val served = IndexMaintenance.vectorsDf(spark, idx)
      .filter(col("doc_id").isin(waveIds.toSeq: _*)).count()
    assert(served === sigCount,
      s"expected $sigCount signature rows for the replayed wave, served $served")
  }

  test("a batch whose epoch was folded AND DELETED before the restart is " +
      "dropped on replay — signatures never double-serve (r15, ADVICE r14)") {
    import graft.operators.IndexMaintenance
    val idx = tmp("graft-gfold-idx")
    val groups = tmp("graft-gfold-g")
    val ckpt = tmp("graft-gfold-ckpt")
    val staging = tmp("graft-gfold-src")
    val corpusDir = tmp("graft-gfold-corpus")
    DedupIndex.writeBandIndex(base, idx)
    DedupGroups.initGroups(spark, groups, batchVerifiedPairs(base))
    base.write.mode("overwrite").parquet(s"$corpusDir/docs")
    // pre-crash: batch 0 ran to completion (pairs folded, signatures
    // appended into e1), a COMPACTION then folded e1 into the base and
    // deleted it — and only then the process died, before the
    // checkpoint commit. The restart resolves a fresh epoch and
    // replays batch 0: its `batch=0` subdir no longer exists anywhere,
    // so the epochDirHoldingBatch redirect (the r14 fix) cannot help —
    // only the marker's folded-batch record can keep the replay from
    // permanently double-serving rows that now live in the base.
    val pairs = DedupIndex.newNearDups(spark, idx, wave1,
        spark.read.parquet(s"$corpusDir/docs"), 0.5)
      .select(col("doc_a"), col("doc_b"))
    DedupGroups.foldPairs(spark, groups, pairs)
    Dedup.bandSignaturesOf(wave1).write.mode("overwrite").partitionBy("band")
      .parquet(s"${IndexMaintenance.nextEpochDir(spark, idx)}/batch=0")
    val sigCount = Dedup.bandSignaturesOf(wave1).count()
    IndexMaintenance.compactIndex(spark, idx)
    assert(!new java.io.File(idx).listFiles()
      .exists(f => f.isDirectory && f.getName.matches("vectors_e\\d+")),
      "compaction left the epoch dir behind — scenario not reproduced")
    // the marker records the folded batch id (ranges)
    val markerTxt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$idx/vectors/_graft_compacted")), "UTF-8")
    assert(markerTxt.contains("foldedbatches=0"), s"marker: $markerTxt")
    // restart with a FRESH checkpoint delivers the wave as batch 0 —
    // exactly what a committed-offsets/uncommitted-batch restart replays
    wave1.coalesce(1).write.parquet(s"$staging/w0")
    val q = IndexStream.foldGroupsFromStream(spark, idx, groups,
      spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$staging/w*"),
      () => spark.read.parquet(s"$corpusDir/docs"), ckpt, minJaccard = 0.5)
    try q.processAllAvailable() finally q.stop()
    // the replay was DROPPED: no epoch dir reappeared holding batch=0
    val holders = Option(new java.io.File(idx).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && f.getName.matches("vectors_e\\d+"))
      .filter(e => new java.io.File(e, "batch=0").exists())
      .map(_.getName).toSeq.sorted
    assert(holders.isEmpty, s"replay of a folded batch landed in $holders")
    // exactly one served copy of the wave's signatures (in the base)
    val waveIds = wave1.select("doc_id").collect().map(_.getLong(0)).toSet
    val served = IndexMaintenance.vectorsDf(spark, idx)
      .filter(col("doc_id").isin(waveIds.toSeq: _*)).count()
    assert(served === sigCount,
      s"expected $sigCount signature rows, served $served")
    // groups unchanged and correct — the redundant fold was skipped whole
    assert(DedupGroups.groupsDf(spark, groups)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      === refGroups(base.unionByName(wave1)))
  }
}
