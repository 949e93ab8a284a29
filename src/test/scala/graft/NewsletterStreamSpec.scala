package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.NewsletterStream

/** Streaming newsletter ingest: HTML issues appearing in a directory
  * are parsed in-flight into the same chunks the batch path produces,
  * exactly once per file.
  */
class NewsletterStreamSpec extends AnyFunSuite {
  import SparkSuite._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private def issue(q: String): String =
    s"""<html><body><header class="page__header"><h1>3-2-1</h1></header>
       |<div class="page__content"><h2>1 QUESTION FOR YOU</h2>
       |<p>$q</p><p>Until next week, James</p></div></body></html>""".stripMargin

  test("streamed parse equals the batch parse and is exactly-once per file") {
    val htmlDir = tmp("graft-nlstream-html")
    val out = tmp("graft-nlstream-out") + "/chunks"
    val ckpt = tmp("graft-nlstream-ckpt")

    java.nio.file.Files.writeString(
      java.nio.file.Path.of(htmlDir, "march-4-2024-a_aa11aa.html"), issue("where to focus"))
    val q = NewsletterStream.ingestStream(spark, htmlDir, out, ckpt)
    try {
      q.processAllAvailable()
      // a second issue arrives while the stream runs
      java.nio.file.Files.writeString(
        java.nio.file.Path.of(htmlDir, "june-10-2024-b_bb22bb.html"), issue("what to drop"))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.read.parquet(out)
    val batch = graft.operators.Newsletter.parseNewsletter(
      graft.sources.Ingest.fromHtml(spark, htmlDir),
      mdCol = "md_text", dateCol = "issue_date")
    assert(streamed.count() == 2)
    assert(streamed.select("text").as[String](spark.implicits.newStringEncoder)
      .collect().toSet == Set("where to focus", "what to drop"))
    // stream ≡ batch on the same files (one code path)
    val key = Seq("doc_id", "category", "idx", "text", "date")
    assert(streamed.select(key.map(col): _*).collect().toSet ==
      batch.select(key.map(col): _*).collect().toSet)

    // restart with the same checkpoint: nothing re-emitted
    val q2 = NewsletterStream.ingestStream(spark, htmlDir, out, ckpt)
    try q2.processAllAvailable() finally q2.stop()
    assert(spark.read.parquet(out).count() == 2)
  }
}
