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
}
