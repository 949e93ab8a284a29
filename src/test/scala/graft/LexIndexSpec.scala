package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{IndexMaintenance, IvfIndex, LexIndex, LexicalSearch, SearchApi}
import graft.streaming.IndexStream

/** r11 (r10 verdict #3): the persisted lexical posting index — sixth
  * maintained layout. Indexed BM25 must be row-identical to the brute
  * corpus-scan scorer, the query's token buckets must prune at the
  * parquet-partition level, streaming append must be byte-identical to
  * the batch build, compaction must compose, and the hybrid facade
  * over persisted vector + lexical indexes must equal the brute RRF
  * fusion at full probe coverage.
  */
class LexIndexSpec extends AnyFunSuite {
  import SparkSuite._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private def rows(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted
    df.select(cols.head, cols.tail: _*).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).toSeq
  }

  test("indexed BM25 == brute bm25 row-for-row (and prunes to the query buckets)") {
    val idx = tmp("graft-lexidx")
    LexIndex.writeIndex(spark, Sf, idx)
    val brute = rows(LexicalSearch.bm25(spark, Sf))
    val indexed = LexIndex.bm25Indexed(spark, idx)
    assert(rows(indexed) === brute)
    // pruning: the two query terms hash to <= 2 of the 64 buckets
    indexed.collect()
    val plan = indexed.queryExecution.executedPlan.toString
    assert(raw"PartitionFilters: \[[^\]]*bucket".r.findFirstIn(plan).isDefined,
      "bucket pruning lost")
    val wantBuckets = LexicalSearch.QueryTerms.map(LexIndex.bucketOfTerm).distinct
    assert(wantBuckets.size <= 2)
  }

  test("driver-side bucket hash == column-side bucket hash") {
    import spark.implicits._
    val terms = Seq("vector", "hash", "the", "a", "Zürich", "λ", "")
    val got = terms.toDF("term")
      .select(col("term"), LexIndex.bucketOf(col("term")).as("b"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    terms.foreach(t => assert(got(t) === LexIndex.bucketOfTerm(t), s"term '$t'"))
  }

  test("streamed postings are byte-identical to batch-built ones; stats fold incrementally") {
    val docs = Tables.fanOut(Tables.documents(spark, Sf))
      .select(col("doc_id"), col("text"))
    val known = docs.filter(pmod(col("doc_id"), lit(3)) =!= 2)
    val incoming = docs.filter(pmod(col("doc_id"), lit(3)) === 2)

    // batch build on the known slice, stream the incoming slice in
    val idx = tmp("graft-lexidx-stream")
    val staging = tmp("graft-lexidx-staging")
    val ckpt = tmp("graft-lexidx-ckpt")
    LexIndex.writeIndexOf(known, idx)
    incoming.write.parquet(s"$staging/wave0")
    val stream = spark.readStream.schema(incoming.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$staging/wave*")
    // a batch-built base dir has no sink log — the r10 shadowing guard
    // forces the stream into an epoch dir (serving unions base+epochs)
    val q = IndexStream.appendToLexIndex(spark, idx, stream, ckpt,
      sinkDir = IndexMaintenance.nextEpochDir(spark, idx))
    try q.processAllAvailable() finally q.stop()
    LexIndex.addToStats(spark, idx, incoming)

    // grown index == a from-scratch build on the full corpus: postings
    // byte-identical, stats equal, serving row-identical
    val full = tmp("graft-lexidx-full")
    LexIndex.writeIndexOf(docs, full)
    def postings(p: String) = IndexMaintenance.vectorsDf(spark, p)
      .select(col("doc_id"), col("term"), col("tf"), col("dl"),
        col("bucket").cast("long"))
      .collect().map(_.toString).sorted.toSeq
    assert(postings(idx) === postings(full))
    assert(spark.read.parquet(s"$idx/stats").collect().map(_.toString).toSeq ===
      spark.read.parquet(s"$full/stats").collect().map(_.toString).toSeq)
    assert(rows(LexIndex.bm25Indexed(spark, idx)) ===
      rows(LexIndex.bm25Indexed(spark, full)))
    // folding the epoch back into the base leaves serving unchanged
    IndexMaintenance.compactIndex(spark, idx)
    assert(rows(LexIndex.bm25Indexed(spark, idx)) ===
      rows(LexIndex.bm25Indexed(spark, full)))
  }

  test("compaction composes: serving unchanged, pruning intact") {
    val idx = tmp("graft-lexidx-compact")
    LexIndex.writeIndex(spark, Sf, idx)
    val before = rows(LexIndex.bm25Indexed(spark, idx))
    IndexMaintenance.compactIndex(spark, idx)
    val served = LexIndex.bm25Indexed(spark, idx)
    assert(rows(served) === before)
    served.collect()
    assert(raw"PartitionFilters: \[[^\]]*bucket".r
      .findFirstIn(served.queryExecution.executedPlan.toString).isDefined)
  }

  test("hybrid over persisted indexes == brute searchHybrid at full coverage") {
    val vecIdx = tmp("graft-hybrid-vec")
    val lexIdx = tmp("graft-hybrid-lex")
    IvfIndex.writeIndex(spark, Sf, vecIdx)
    LexIndex.writeIndex(spark, Sf, lexIdx)
    val nClusters = spark.read.parquet(s"$vecIdx/centroids").count().toInt
    Seq("vector hash", "the quick brown fox", "wavelet").foreach { qt =>
      val brute = rows(SearchApi.searchHybrid(spark, Sf, qt))
      val indexed = rows(SearchApi.searchHybridIndexed(spark, Sf, vecIdx, lexIdx,
        qt, nprobe = nClusters))
      assert(indexed === brute, s"hybrid diverged for query '$qt'")
    }
  }
}
