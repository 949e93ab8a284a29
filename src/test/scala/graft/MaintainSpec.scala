package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, DedupIndex, IndexMaintenance}

/** r13 (r12 verdict #6): maintain() — the decider that reads layout
  * health from parquet footers + file listings ONLY and invokes
  * rebalance/compact when thresholds trip. Pins: a heated layout
  * converges via maintain() alone (same integer rule rebalanceIndex
  * executes, so the fixed points coincide); a balanced layout is a
  * no-op that touches NO file; fragmentation and resume epochs route
  * to compact.
  */
class MaintainSpec extends AnyFunSuite {
  import SparkSuite._
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  /** The RebalanceSpec skew: cluster 0 hot (200 rows), 3 cold (40). */
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

  private def fileStats(dir: String): Seq[(String, Long, Long)] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(dir)).filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getPath, f.length(), f.lastModified())).sortBy(_._1)
  }

  test("a heated layout converges through maintain() alone; balanced is a file-untouched no-op") {
    val idx = tmp("graft-maintain")
    writeSkewedIndex(idx)
    val first = IndexMaintenance.maintain(spark, idx)
    assert(first.action === "rebalance", first.toString)
    assert(first.rebalance.exists(r => r.nSplit >= 1 && r.nMerge >= 1))
    var rounds = 1
    var last = first
    while (last.action != "none" && rounds < 6) {
      last = IndexMaintenance.maintain(spark, idx)
      rounds += 1
    }
    assert(last.action === "none", s"did not converge in $rounds rounds: $last")
    // the fixed point IS the rebalance rule's: the hottest cluster is
    // within the split threshold (≤ 2× mean, up to integer slack)
    assert(last.maxRows <= 2 * last.meanRows + 1,
      s"converged state still hot: $last")
    // rows conserved through however many passes ran
    assert(spark.read.parquet(s"$idx/vectors").count() === 340L)
    // balanced: the decision is metadata-only — NO file changes
    val before = fileStats(s"$idx/vectors")
    val again = IndexMaintenance.maintain(spark, idx)
    assert(again.action === "none")
    assert(fileStats(s"$idx/vectors") === before,
      "a no-op maintain touched layout files")
    // manifest economics (r14, verdict #4): the first decision had to
    // open footers (a raw batch-written layout carries no manifest);
    // once rebalance installed its marker+manifest, deciding costs
    // ZERO footer opens — the one-manifest read the scaladoc promises
    assert(first.footerReads > 0, first.toString)
    assert(again.footerReads === 0L,
      s"compacted layout still opened ${again.footerReads} footers")
  }

  test("the decider survives non-numeric partition values (ADVICE r13)") {
    // the footer path (no manifest yet — the exact state the crash
    // report named): a BALANCED raw layout plus a null-key partition
    // dir. The decider must neither throw on the non-numeric value nor
    // size-manage it — it is counted as a file and otherwise ignored.
    val idx = tmp("graft-maintain-hive")
    def blob(n: Int, baseId: Int, cx: Float, c: Long) =
      (0 until n).map(i => (baseId + i.toLong,
        Array(cx + (i % 7) * 0.01f, 0f), c))
    (blob(50, 0, 10f, 0L) ++ blob(50, 1000, 0f, 1L) ++
     blob(50, 2000, -10f, 2L) ++ blob(50, 3000, 20f, 3L))
      .toDF("vec_id", "embedding", "cluster_id")
      .coalesce(1).write.partitionBy("cluster_id").parquet(s"$idx/vectors")
    val base = IndexMaintenance.maintain(spark, idx)
    assert(base.action === "none", base.toString)
    val weird = new java.io.File(s"$idx/vectors/cluster_id=__HIVE_DEFAULT_PARTITION__")
    assert(weird.mkdirs())
    val donor = new java.io.File(s"$idx/vectors").listFiles()
      .filter(f => f.isDirectory && f.getName == "cluster_id=0").head
      .listFiles().filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(donor.toPath,
      new java.io.File(weird, donor.getName).toPath)
    val after = IndexMaintenance.maintain(spark, idx) // must not throw
    assert(after.action === "none", after.toString)
    assert(after.filesBefore === base.filesBefore + 1, after.toString)
    // manifest path (r15, ADVICE r14): compaction rewrites the layout
    // (null-key rows land back under __HIVE_DEFAULT_PARTITION__) and
    // the installed marker manifest must report those files in
    // filesBefore exactly like the footer path above — counted as
    // files, never size-managed — with ZERO footer opens
    IndexMaintenance.compactIndex(spark, idx)
    assert(new java.io.File(
        s"$idx/vectors/cluster_id=__HIVE_DEFAULT_PARTITION__").exists(),
      "compaction dropped the null-key partition — pin is vacuous")
    val manifested = IndexMaintenance.maintain(spark, idx)
    assert(manifested.action === "none", manifested.toString)
    assert(manifested.footerReads === 0L, manifested.toString)
    assert(manifested.filesBefore ===
      IndexMaintenance.parquetFileCount(spark, s"$idx/vectors"),
      manifested.toString)
  }

  test("fragmentation and resume epochs route to compact, then settle to none") {
    val idx = tmp("graft-maintain-frag")
    val docs = Tables.documents(spark, Sf).select(col("doc_id"), col("text"))
    DedupIndex.writeBandIndex(docs.filter(col("doc_id") % 3 === 0), idx)
    // two more appends fragment the band dirs (several files per value)
    Dedup.bandSignaturesOf(docs.filter(col("doc_id") % 3 === 1))
      .write.mode("append").partitionBy("band").parquet(s"$idx/vectors")
    Dedup.bandSignaturesOf(docs.filter(col("doc_id") % 3 === 2))
      .write.mode("append").partitionBy("band").parquet(s"$idx/vectors")
    val rowsBefore = IndexMaintenance.vectorsDf(spark, idx).count()
    val r = IndexMaintenance.maintain(spark, idx, maxFilesPerValue = 2)
    assert(r.action === "compact", r.toString)
    assert(r.filesAfter < r.filesBefore, r.toString)
    assert(IndexMaintenance.vectorsDf(spark, idx).count() === rowsBefore)
    // a band/bucket layout never rebalances — only fragmentation counts;
    // and once compacted the decision reads the manifest, not footers
    val settled = IndexMaintenance.maintain(spark, idx, maxFilesPerValue = 2)
    assert(settled.action === "none", settled.toString)
    assert(settled.footerReads === 0L, settled.toString)
    // an epoch dir appearing (streaming resume) re-arms compaction —
    // footer opens are paid for the UN-MANIFESTED epoch delta only
    val epochDir = s"${IndexMaintenance.nextEpochDir(spark, idx)}/batch=0"
    Dedup.bandSignaturesOf(docs.filter(col("doc_id") % 7 === 0))
      .write.mode("overwrite").partitionBy("band").parquet(epochDir)
    val epochFiles = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(epochDir)).count(_.getName.endsWith(".parquet"))
    }
    val fold = IndexMaintenance.maintain(spark, idx, maxFilesPerValue = 2)
    assert(fold.action === "compact", fold.toString)
    assert(fold.footerReads === epochFiles.toLong,
      s"expected $epochFiles epoch footer opens, got ${fold.footerReads}")
    val done = IndexMaintenance.maintain(spark, idx, maxFilesPerValue = 2)
    assert(done.action === "none" && done.footerReads === 0L, done.toString)
  }
}
