package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Newsletter

/** Fixture tests for the faithful newsletter parser. The expected
  * chunks below are the verbatim output of the REFERENCE parser
  * (pipeline/utils.py:93-187 `parse_newsletter`) run on these exact
  * fixture strings with issue_date='2024-03-04' — field-for-field,
  * including the cleanup subtleties (double-space preservation in
  * questions, `**` removal in quotes, source-link fallback, truncation
  * at "Until next week").
  */
class NewsletterSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  import spark.implicits._

  val fx1: String =
    """# Atomic Issue
      |[Share this on Twitter](https://tw.example/x)
      |
      |## 3 IDEAS FROM ME
      |
      |I.
      |Habits are the compound interest of self improvement.
      |
      |II.
      |You do not rise to the level of your goals. You fall to the level of your systems.
      |
      |III.
      |Every action you take is a vote for the type of person you wish to become.
      |
      |---
      |
      |## 2 QUOTES FROM OTHERS
      |
      |I.
      |Writer **Annie Dillard** on attention:
      |
      |"How we spend our days is, of course, how we spend our lives."
      |
      |*Source:* [*The Writing Life*](https://books.example/writing-life)
      |
      |II.
      |Philosopher Seneca on time:
      |
      |"We suffer more often in [imagination](https://ex.example/img) than in reality."
      |
      |*Source:* Letters from a Stoic
      |
      |## 1 QUESTION FOR YOU
      |
      |What would change  if you treated attention as your scarcest resource?
      |
      |Until next week,
      |
      |James
      |""".stripMargin

  val fx2: String =
    """## 3 IDEAS FROM ME
      |I. one idea only
      |## 2 QUOTES FROM OTHERS
      |I. a quote with no source at all
      |## 1 QUESTION FOR YOU
      |Where to?
      |""".stripMargin

  def parse(md: String): Seq[(String, Long, String, Option[String], Option[String])] = {
    val df = Seq((1L, md, "2024-03-04")).toDF("doc_id", "md_text", "issue_date")
    Newsletter.parseNewsletter(df)
      .orderBy(col("category"), col("idx"))
      .select("category", "idx", "text", "source", "source_name")
      .as[(String, Long, String, Option[String], Option[String])]
      .collect().toSeq
  }

  test("fx1 reproduces the reference parser field-for-field") {
    val got = parse(fx1)
    val exp = Seq(
      ("idea", 1L, "Idea from James Clear: Habits are the compound interest of self improvement.", None, None),
      ("idea", 2L, "Idea from James Clear: You do not rise to the level of your goals. You fall to the level of your systems.", None, None),
      ("idea", 3L, "Idea from James Clear: Every action you take is a vote for the type of person you wish to become.", None, None),
      ("question", 1L, "What would change  if you treated attention as your scarcest resource?", None, None),
      ("quote", 1L, "Quote from The Writing Life: Writer Annie Dillard on attention:\n\"How we spend our days is, of course, how we spend our lives.\"",
        Some("https://books.example/writing-life"), Some("The Writing Life")),
      ("quote", 2L, "Quote from Letters from a Stoic: Philosopher Seneca on time:\n\"We suffer more often in imagination than in reality.\"",
        None, Some("Letters from a Stoic")))
    assert(got == exp)
  }

  test("fx2: single items, no-source quote keeps its bare text") {
    val got = parse(fx2)
    val exp = Seq(
      ("idea", 1L, "Idea from James Clear: one idea only", None, None),
      ("question", 1L, "Where to?", None, None),
      ("quote", 1L, "a quote with no source at all", None, None))
    assert(got == exp)
  }

  test("dates propagate and unmarked sections emit nothing") {
    val df = Seq((7L, "## UNRELATED\nI. stuff\n", "2020-01-01"),
      (8L, fx2, "2021-06-15")).toDF("doc_id", "md_text", "issue_date")
    val out = Newsletter.parseNewsletter(df)
    assert(out.filter(col("doc_id") === 7).count() == 0)
    assert(out.filter(col("doc_id") === 8).select("date").distinct()
      .as[String].collect().toSeq == Seq("2021-06-15"))
  }

  test("fromHtml ingests files end-to-end: title, date from filename, parseable md") {
    val dir = java.nio.file.Files.createTempDirectory("graft-html")
    val html =
      """<html><body><header class="page__header"><h1>3-2-1: Habits</h1></header>
        |<div class="page__content"><h2>1 QUESTION FOR YOU</h2>
        |<p>What would you do?</p><p>Until next week, James</p></div></body></html>""".stripMargin
    java.nio.file.Files.writeString(dir.resolve("march-4-2024-habits_ab12cd.html"), html)
    java.nio.file.Files.writeString(dir.resolve("september-17-2023-focus_ef34ab.html"),
      html.replace("Habits", "Focus").replace("What would you do?", "Where is your focus?"))
    val docs = graft.sources.Ingest.fromHtml(spark, dir.toString)
    val rows = docs.orderBy("issue_date")
      .select("issue_date", "source_file", "md_text")
      .as[(String, String, String)].collect()
    assert(rows.map(_._1).toSeq == Seq("2023-09-17", "2024-03-04"))
    assert(rows(0)._3.startsWith("# 3-2-1: Focus"))
    // doc_id is stable across re-reads (idempotent append contract)
    val again = graft.sources.Ingest.fromHtml(spark, dir.toString)
      .select("doc_id").as[Long].collect().toSet
    assert(again == docs.select("doc_id").as[Long].collect().toSet)
    // and the converted markdown parses into the question chunk
    val chunks = Newsletter.parseNewsletter(docs, mdCol = "md_text")
    assert(chunks.filter(col("category") === "question").count() == 2)
    assert(chunks.filter(col("text") === "Where is your focus?").count() == 1)
  }

  test("htmlToMarkdown converts the reference page shape") {
    val html =
      """<html><body><header class="page__header"><h1>3-2-1: On habits</h1></header>
        |<div class="page__content"><h2>3 IDEAS FROM ME</h2>
        |<p>I. Small <strong>habits</strong> compound.</p>
        |<hr>
        |<h2>2 QUOTES FROM OTHERS</h2>
        |<p>I. A &amp; B &quot;quoted&quot;.</p>
        |<p><em>Source:</em> <a href="https://b.example/x">*Book*</a></p>
        |<h2>1 QUESTION FOR YOU</h2>
        |<p>What now?</p>
        |<p>Until next week, James</p></div></body></html>""".stripMargin
    val md = Seq(html).toDF("html")
      .select(Newsletter.htmlToMarkdown(col("html")).as("md"))
      .as[String].head()
    assert(md.startsWith("# 3-2-1: On habits"))
    assert(md.contains("## 3 IDEAS FROM ME"))
    assert(md.contains("Small **habits** compound."))
    assert(md.contains("---"))
    assert(md.contains("A & B \"quoted\"."))
    assert(md.contains("*Source:* [*Book*](https://b.example/x)"))
    // and the converted markdown parses end-to-end
    val chunks = Newsletter.parseNewsletter(
      Seq((1L, md, "2024-03-04")).toDF("doc_id", "md_text", "issue_date"))
      .select("category", "idx", "text", "source", "source_name")
      .as[(String, Long, String, Option[String], Option[String])]
      .collect().toSeq.sortBy(r => (r._1, r._2))
    assert(chunks == Seq(
      // the reference cleans ** only in quotes — ideas keep it
      ("idea", 1L, "Idea from James Clear: Small **habits** compound.", None, None),
      ("question", 1L, "What now?", None, None),
      ("quote", 1L, "Quote from Book: A & B \"quoted\".",
        Some("https://b.example/x"), Some("Book"))))
  }

  test("case/count-sensitive markers: divergent real pages are skipped like the reference") {
    // promoted from NewsletterReplaySpec: 5 of the 331 archive pages
    // use "3 Ideas From Me" (Title Case) or "1 IDEAS FROM ME"; the
    // reference's elif substring checks (utils.py:109-117) are exact,
    // so those sections must emit nothing while exact-marker sections
    // on the same page still parse
    val md =
      """# Issue X
        |
        |## 3 Ideas From Me
        |
        |I.
        |title-case section is not an idea section
        |
        |## 1 IDEAS FROM ME
        |
        |I.
        |one-idea header is not the three-idea marker
        |
        |## 2 QUOTES FROM OTHERS
        |
        |I.
        |still parsed
        |
        |*Source:* the archive
        |""".stripMargin
    val chunks = Newsletter.parseNewsletter(
      Seq((7L, md, "2022-02-03")).toDF("doc_id", "md_text", "issue_date"))
      .select("category", "idx", "text")
      .as[(String, Long, String)].collect().toSeq
    assert(chunks == Seq(("quote", 1L, "Quote from the archive: still parsed")))
  }

  test("em-wrapped source link falls back to the text path, markup and all") {
    // promoted from NewsletterReplaySpec: the august-18-2022 archive
    // page emits "*Source:* *[Nature's God](url)*" — the leading *
    // defeats the reference's linked-source regex (utils.py:131-133),
    // and its text fallback (utils.py:143-146) strips literal *s but
    // keeps the [title](url) markup inside the prefix, with no url
    // captured. Faithfulness means replicating exactly that.
    val md =
      """## 2 QUOTES FROM OTHERS
        |
        |I.
        |Somebody on something:
        |
        |“A quotable quote.”
        |
        |*Source:* *[Nature's God](https://amzn.to/x)*
        |""".stripMargin
    val row = Newsletter.parseNewsletter(
      Seq((9L, md, "2022-08-18")).toDF("doc_id", "md_text", "issue_date"))
      .select("text", "source", "source_name")
      .as[(String, Option[String], Option[String])].head()
    assert(row._1 ===
      "Quote from [Nature's God](https://amzn.to/x): Somebody on something:\n“A quotable quote.”")
    assert(row._2 === None) // no url: the linked form never matched
    assert(row._3 === Some("[Nature's God](https://amzn.to/x)"))
  }
}
