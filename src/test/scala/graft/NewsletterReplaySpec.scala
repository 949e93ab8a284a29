package graft

import org.apache.spark.sql.functions._

/** Real-data replay over the reference's actual newsletter archive
  * (reference data/raw/html — 331 downloaded pages; read-only input).
  * The fixture specs prove the parser matches the spec we wrote; this
  * spec proves the spec matches the DATA: the whole ingest surface
  * (Ingest.fromHtml → htmlToMarkdown → parseNewsletter) runs over
  * every real page and the output is pinned — totals, per-category
  * distributions, and the parser invariants a downstream index relies
  * on.
  *
  * Divergences found by this replay and promoted to fixture cases
  * (NewsletterSpec "case-sensitive markers"):
  *  - 4 pages use Title-Case section headers ("3 Ideas From Me") and
  *    1 page says "1 IDEAS FROM ME"; the reference's elif substring
  *    checks (utils.py:109-117) are case/count-sensitive and skip
  *    them, so we must too — hence 326 (not 331) pages with ideas.
  *  - link markup and `**` are kept VERBATIM in idea/question chunks
  *    (the reference cleans only quote bodies, utils.py:129-155), so
  *    "no markup residue" is asserted only where the reference
  *    guarantees it: quote text.
  *  - real pages use numeric entities (&#8220; …) that BeautifulSoup
  *    unescapes during parse — HtmlMdChain covers the archive's
  *    observed inventory (checked here: no entity residue in chunks).
  */
class NewsletterReplaySpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = SparkSuite.spark

  private val ArchiveDir = "/root/reference/data/raw/html"

  /** The archive snapshot whose yield is pinned exactly: the 331 pages
    * issued on or before this date (r6 observation). The reference
    * archive GROWS — a later checkout may add pages — so exact totals
    * hold on this dated prefix only; newer pages get the same
    * invariant/band checks but never break the pinned counts (r6
    * VERDICT #7).
    */
  private val PinnedThrough = "2025-12-04"

  private lazy val available = new java.io.File(ArchiveDir).isDirectory

  private lazy val allDocs = {
    val d = graft.sources.Ingest.fromHtml(spark, ArchiveDir).persist()
    d.count()
    d
  }
  // the dated prefix with exact pinned yield
  private lazy val docs = allDocs.filter(col("issue_date") <= PinnedThrough)
  private lazy val chunks = {
    val c = graft.operators.Newsletter.parseNewsletter(allDocs).persist()
    c.count()
    c
  }
  // the dated prefix with exact pinned yield
  private lazy val pinnedChunks = chunks.filter(col("date") <= PinnedThrough)

  test("every archive page ingests: ≥331 docs, dated, titled, substantial") {
    assume(available, s"$ArchiveDir not present")
    // lower bound on the whole archive, exact on the pinned prefix
    assert(allDocs.count() >= 331L)
    assert(docs.count() === 331L)
    assert(allDocs.filter(col("issue_date").isNull).count() === 0L)
    assert(allDocs.filter(!col("issue_date").rlike("^\\d{4}-\\d{2}-\\d{2}$")).count() === 0L)
    assert(allDocs.select(countDistinct(col("issue_date"))).head().getLong(0)
      === allDocs.count())
    assert(allDocs.select(countDistinct(col("doc_id"))).head().getLong(0)
      === allDocs.count())
    // every page has a real content body and an extracted "# title"
    assert(allDocs.filter(length(col("md_text")) < 1000).count() === 0L)
    assert(allDocs.filter(!col("md_text").startsWith("# ")).count() === 0L)
  }

  test("chunk yield over the pinned archive prefix is exact") {
    assume(available, s"$ArchiveDir not present")
    assert(pinnedChunks.count() === 1944L)
    val byCat = pinnedChunks.groupBy(col("category"))
      .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("docs"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byCat("idea") === ((976L, 326L)))
    assert(byCat("quote") === ((642L, 323L)))
    assert(byCat("question") === ((326L, 326L)))
    // the 5 idea-less pages are the known header divergences (Title
    // Case × 4, "1 IDEAS" × 1) the reference parser also skips
    assert(docs.count() - byCat("idea")._2 === 5L)
  }

  test("pages NEWER than the pinned prefix stay inside the format bands") {
    assume(available, s"$ArchiveDir not present")
    val newer = chunks.filter(col("date") > PinnedThrough)
    // vacuously green on today's checkout; on a grown archive every new
    // page must still parse into the known category/cardinality bands
    val perPage = newer.groupBy(col("doc_id"), col("category"))
      .agg(count(lit(1)).as("k"))
    assert(perPage.filter(!col("category").isin("idea", "quote", "question"))
      .count() === 0L)
    assert(perPage.filter(col("k") < 1L || col("k") > 3L).count() === 0L)
  }

  test("a hypothetical 332nd page leaves the pinned yield untouched") {
    assume(available, s"$ArchiveDir not present")
    // simulate the archive growing past the pinned date: the new page
    // parses, lands outside the pinned prefix, and every exact total
    // above still holds on the prefix
    import spark.implicits._
    val extraHtml =
      s"""<html><body><header class="page__header"><h1>3-2-1: Growth</h1></header>
         |<div class="page__content"><h2>3 IDEAS FROM ME</h2>
         |<p>I. A brand new idea</p><p>II. Another new idea</p><p>III. A third idea</p><hr>
         |<h2>2 QUOTES FROM OTHERS</h2>
         |<p>I. "A fresh quote"</p>
         |<p><em>Source:</em> <a href="https://b.example/x">Someone</a></p>
         |<p>II. "Another quote"</p><p><em>Source:</em> plain someone</p>
         |<h2>1 QUESTION FOR YOU</h2><p>What will you ship this week?</p>
         |<p>Until next week, James</p></div></body></html>""".stripMargin
    val extra = graft.sources.Ingest.htmlDocs(
      Seq(("mem/december-11-2025-growth_ff00ff.html", extraHtml)).toDF("path", "html"))
    val grown = allDocs.unionByName(extra)
    assert(grown.count() === allDocs.count() + 1)
    assert(grown.filter(col("issue_date") <= PinnedThrough).count() === 331L)
    val grownChunks = graft.operators.Newsletter.parseNewsletter(grown)
    assert(grownChunks.filter(col("date") <= PinnedThrough).count() === 1944L)
    // and the new page parses into the format bands (3 ideas, 2 quotes,
    // 1 question)
    val newPage = grownChunks.filter(col("date") > PinnedThrough)
      .groupBy(col("category")).agg(count(lit(1)).as("k"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(newPage === Map("idea" -> 3L, "quote" -> 2L, "question" -> 1L))
  }

  test("per-page counts stay in the bands the format implies") {
    assume(available, s"$ArchiveDir not present")
    val perPage = chunks.groupBy(col("doc_id"), col("category"))
      .agg(count(lit(1)).as("k"))
    assert(perPage.filter(col("category") === "idea" && !col("k").isin(2L, 3L))
      .count() === 0L)
    assert(perPage.filter(col("category") === "quote" && !col("k").isin(1L, 2L, 3L))
      .count() === 0L)
    assert(perPage.filter(col("category") === "question" && col("k") =!= 1L)
      .count() === 0L)
  }

  test("parser invariants hold on every real chunk") {
    assume(available, s"$ArchiveDir not present")
    def none(cond: org.apache.spark.sql.Column): Unit =
      assert(chunks.filter(cond).count() === 0L,
        chunks.filter(cond).select("doc_id", "category", "idx").head(3).mkString(";"))
    // section split consumed every header; quote cleanup consumed every
    // source line; CRLF normalization left no stray \r anywhere
    none(col("text").contains("## "))
    none(col("text").contains("*Source:*"))
    none(col("text").contains("\r"))
    none(length(col("text")) === 0)
    // entity unescape left no residue of the archive's inventory
    none(col("text").rlike("&#\\d+;|&nbsp;|&amp;|&ldquo;|&rsquo;"))
    // quote bodies are cleaned: no link markup, no bold markers, and a
    // linked source always carries both url and title. ONE archive
    // page (august-18-2022) em-wraps its source link — "*Source:*
    // *[title](url)*" — which defeats the reference's linked-source
    // regex; its fallback then keeps the link markup inside the
    // "Quote from {title}: " prefix (utils.py:142-146 semantics,
    // fixture-pinned in NewsletterSpec "em-wrapped source link").
    // That page is the single allowed exception.
    none(col("category") === "quote" && col("text").rlike("\\[[^\\]]*\\]\\([^\\)]*\\)")
      && col("doc_id") =!= 302153059587828157L)
    none(col("category") === "quote" && col("text").contains("**"))
    none(col("source").isNotNull && col("source_name").isNull)
    none(col("source").isNotNull && !col("source").startsWith("http"))
  }

  test("chunk indexes are dense from 1 within each (page, category)") {
    assume(available, s"$ArchiveDir not present")
    val bad = chunks.groupBy(col("doc_id"), col("category"))
      .agg(min(col("idx")).as("lo"), max(col("idx")).as("hi"),
        count(lit(1)).as("n"), countDistinct(col("idx")).as("d"))
      .filter(col("lo") =!= 1L || col("hi") =!= col("n") || col("d") =!= col("n"))
    assert(bad.count() === 0L, bad.head(3).mkString(";"))
  }

  test("the WHOLE pipeline runs on the real archive: build index, search, filter, prune") {
    assume(available, s"$ArchiveDir not present")
    import graft.operators.NewsletterPipeline
    val idx = java.nio.file.Files.createTempDirectory("graft-replay-idx").toString
    NewsletterPipeline.buildIndex(spark, ArchiveDir, idx, nClusters = 4)
    // the store holds every real chunk exactly once, partitioned by cluster
    val stored = spark.read.parquet(s"$idx/vectors")
    assert(stored.count() === chunks.count())
    assert(stored.select("chunk_id").distinct().count() === chunks.count())
    val clusters = stored.select(col("cluster_id").cast("long"))
      .distinct().collect().map(_.getLong(0)).sorted
    assert(clusters.nonEmpty && clusters.forall(c => c >= 0 && c < 4))
    // plain search returns ranked, scored results from the real corpus
    val hits = NewsletterPipeline.search(spark, idx, "spark distributed data", k = 5)
      .collect()
    assert(hits.length === 5)
    val logits = hits.map(_.getDouble(hits.head.fieldIndex("logit"))).toSeq
    assert(logits === logits.sortBy(-(_: Double)), "results must be logit-ranked")
    // the reference's payload filters hold on real data
    val quotes = NewsletterPipeline.search(spark, idx, "leadership", k = 5,
      category = Some("quote")).collect()
    assert(quotes.nonEmpty)
    assert(quotes.forall(_.getString(2) === "quote"))
    val dated = NewsletterPipeline.search(spark, idx, "leadership", k = 10,
      fromDate = Some("2023-01-01"), toDate = Some("2023-12-31")).collect()
    assert(dated.forall { r =>
      val d = r.getString(3); d >= "2023-01-01" && d <= "2023-12-31"
    })
    // search scans only the probed partitions (the layout IS the index)
    val pruned = spark.read.parquet(s"$idx/vectors")
      .filter(col("cluster_id").cast("long").isin(0L, 1L))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cluster_id"), plan)
  }
}
