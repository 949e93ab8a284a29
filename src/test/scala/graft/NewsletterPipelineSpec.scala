package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.NewsletterPipeline

/** Drives the reference's full asset graph end-to-end from fixture
  * HTML files: download dir → markdown → chunks → embeddings →
  * partitioned store → filtered, reranked search.
  */
class NewsletterPipelineSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  import spark.implicits._

  def issueHtml(title: String, idea: String, quote: String, src: String,
      question: String): String =
    s"""<html><body><header class="page__header"><h1>$title</h1></header>
       |<div class="page__content"><h2>3 IDEAS FROM ME</h2>
       |<p>I. $idea one</p><p>II. $idea two</p><p>III. $idea three</p><hr>
       |<h2>2 QUOTES FROM OTHERS</h2>
       |<p>I. "$quote"</p>
       |<p><em>Source:</em> <a href="https://b.example/x">*$src*</a></p>
       |<p>II. "$quote again"</p><p><em>Source:</em> plain $src</p>
       |<h2>1 QUESTION FOR YOU</h2><p>$question</p>
       |<p>Until next week, James</p></div></body></html>""".stripMargin

  lazy val (htmlDir, indexDir) = {
    val h = java.nio.file.Files.createTempDirectory("graft-nl-html")
    val i = java.nio.file.Files.createTempDirectory("graft-nl-idx")
    java.nio.file.Files.writeString(h.resolve("march-4-2024-habits_aa11aa.html"),
      issueHtml("3-2-1: Habits", "habits compound daily", "we are what we repeatedly do", "Aristotle", "which habit would change everything"))
    java.nio.file.Files.writeString(h.resolve("june-10-2024-focus_bb22bb.html"),
      issueHtml("3-2-1: Focus", "focus beats talent", "the successful warrior is the average man with laser focus", "Bruce Lee", "where does your attention go"))
    java.nio.file.Files.writeString(h.resolve("january-1-2025-systems_cc33cc.html"),
      issueHtml("3-2-1: Systems", "systems carry you", "every system is perfectly designed for its results", "Deming", "what system failed you this week"))
    NewsletterPipeline.buildIndex(spark, h.toString, i.toString, nClusters = 3)
    (h, i)
  }

  test("the graph ingests 3 issues into 18 chunks with payload + vectors") {
    val cv = NewsletterPipeline.chunkVectors(spark, htmlDir.toString)
    assert(cv.count() == 18) // 3 issues × (3 ideas + 2 quotes + 1 question)
    assert(cv.select("chunk_id").distinct().count() == 18)
    assert(cv.groupBy("category").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("idea" -> 9, "quote" -> 6, "question" -> 3))
    // embeddings are L2-normalized (encode_assets contract)
    val nrm2 = cv.select(aggregate(col("embedding"), lit(0.0),
      (a, x) => a + x * x).as("n2")).as[Double].collect()
    assert(nrm2.forall(n => math.abs(n - 1.0) < 1e-5))
    // dates came from filenames
    assert(cv.select("date").distinct().as[String].collect().toSet ==
      Set("2024-03-04", "2024-06-10", "2025-01-01"))
  }

  test("search returns reranked, labeled chunks and prunes partitions") {
    val r = NewsletterPipeline.search(spark, indexDir.toString,
      "laser focus attention", k = 5, nprobe = 3)
    val rows = r.collect()
    assert(rows.nonEmpty && rows.length <= 5)
    // rerank order is logit-descending
    val logits = rows.map(_.getAs[Double]("logit"))
    assert(logits.zip(logits.tail).forall { case (a, b) => a >= b })
    assert(rows.forall(x => Set("green", "yellow", "red")(x.getAs[String]("label"))))
    // the store scan is partition-pruned to the probed cells
    val plan = r.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cluster_id"), plan)
  }

  test("payload filters mirror the reference's search_newsletter") {
    val ideas = NewsletterPipeline.search(spark, indexDir.toString,
      "habits systems focus", k = 10, nprobe = 3, retrieveK = 18,
      category = Some("idea"))
    assert(ideas.count() > 0)
    assert(ideas.select("category").distinct().as[String].collect().toSeq == Seq("idea"))
    val dated = NewsletterPipeline.search(spark, indexDir.toString,
      "habits systems focus", k = 10, nprobe = 3, retrieveK = 18,
      fromDate = Some("2024-06-01"), toDate = Some("2024-12-31"))
    assert(dated.count() > 0)
    assert(dated.select("date").distinct().as[String].collect().toSeq == Seq("2024-06-10"))
  }
}
