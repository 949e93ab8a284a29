package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.DocStream

/** Live ingestion pipeline: in-flight quality filtering + idempotent
  * corpus append, equivalent to the batch filter on the same data.
  */
class DocStreamSpec extends AnyFunSuite {
  import SparkSuite._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  test("streamed ingest filters in-flight and never duplicates re-delivered docs") {
    val staging = tmp("graft-docstream-src")
    val corpus = tmp("graft-docstream-corpus") + "/c"
    val ckpt = tmp("graft-docstream-ckpt")
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    val docs = Tables.documents(spark, Sf).selectExpr(cols: _*)

    // wave 1: half the docs
    docs.filter(col("doc_id") % 2 === 0).write.parquet(s"$staging/w1")
    val stream = spark.readStream.schema(docs.schema).parquet(s"$staging/w*")
    val q = DocStream.ingestStream(spark, stream, corpus, ckpt)
    try {
      q.processAllAvailable()
      // wave 2: ALL docs — overlapping redelivery of wave 1
      docs.write.parquet(s"$staging/w2")
      q.processAllAvailable()
    } finally q.stop()

    val expect = DocStream.qualityFilter(docs)
    val got = spark.read.parquet(corpus)
    assert(got.count() === expect.count())
    assert(got.select("doc_id").distinct().count() === expect.count())
    // same keep decisions as the batch filter (one code path)
    assert(got.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ===
      expect.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
    // the filter actually dropped something (quality/langid bite)
    assert(expect.count() < docs.count())
  }

  test("per-row dsir score equals the batch explode+join formulation doc-for-doc") {
    val lut = graft.operators.TextAnalysis.dsirLut(spark, Sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    // batch formulation: explode tokens, join the LUT, sum per doc
    val lutDf = graft.operators.TextAnalysis.dsirLut(spark, Sf)
    val viaJoin = Tables.documents(spark, Sf)
      .select(col("doc_id"), explode(graft.functions.TextFunctions.tokens(col("text"))).as("token"))
      .withColumn("b", graft.operators.TextAnalysis.dsirBucket(col("token")))
      .join(broadcast(lutDf), Seq("b"))
      .groupBy("doc_id").agg(sum("lr_e6").as("expect_e6"))
    val viaRow = Tables.documents(spark, Sf)
      .select(col("doc_id"), DocStream.dsirScore(lut)(col("text")))
    assert(viaRow.join(viaJoin, "doc_id")
      .filter(col("dsir_e6") =!= col("expect_e6")).count() === 0)
    assert(viaRow.count() === Tables.documents(spark, Sf).count())
  }

  test("dsir filter runs statelessly in an actual stream and matches batch keep decisions") {
    val staging = tmp("graft-dsirstream-src")
    val out = tmp("graft-dsirstream-out")
    val ckpt = tmp("graft-dsirstream-ckpt")
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    val docs = Tables.documents(spark, Sf).selectExpr(cols: _*)
    docs.write.parquet(s"$staging/w1")
    val lut = graft.operators.TextAnalysis.dsirLut(spark, Sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val minE6 = 0L // keep docs with nonnegative target evidence
    val stream = spark.readStream.schema(docs.schema).parquet(s"$staging/w*")
    val q = DocStream.dsirFilter(stream, lut, minE6)
      .select("doc_id", "dsir_e6")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.read.parquet(out)
    val expect = DocStream.dsirFilter(docs, lut, minE6).select("doc_id", "dsir_e6")
    assert(got.count() === expect.count())
    assert(got.exceptAll(expect).count() === 0)
    // the threshold bites: some docs dropped, and kept docs skew to the target lang
    assert(expect.count() > 0 && expect.count() < docs.count())
  }
}
