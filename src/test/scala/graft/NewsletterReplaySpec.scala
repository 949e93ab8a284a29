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

  private lazy val available = new java.io.File(ArchiveDir).isDirectory

  private lazy val docs = {
    val d = graft.sources.Ingest.fromHtml(spark, ArchiveDir).persist()
    d.count()
    d
  }
  private lazy val chunks = {
    val c = graft.operators.Newsletter.parseNewsletter(docs).persist()
    c.count()
    c
  }

  test("every archive page ingests: 331 docs, dated, titled, substantial") {
    assume(available, s"$ArchiveDir not present")
    assert(docs.count() === 331L)
    assert(docs.filter(col("issue_date").isNull).count() === 0L)
    assert(docs.filter(!col("issue_date").rlike("^\\d{4}-\\d{2}-\\d{2}$")).count() === 0L)
    assert(docs.select(countDistinct(col("issue_date"))).head().getLong(0) === 331L)
    assert(docs.select(countDistinct(col("doc_id"))).head().getLong(0) === 331L)
    // every page has a real content body and an extracted "# title"
    assert(docs.filter(length(col("md_text")) < 1000).count() === 0L)
    assert(docs.filter(!col("md_text").startsWith("# ")).count() === 0L)
  }

  test("chunk yield over the real archive is pinned") {
    assume(available, s"$ArchiveDir not present")
    assert(chunks.count() === 1944L)
    val byCat = chunks.groupBy(col("category"))
      .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("docs"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byCat("idea") === ((976L, 326L)))
    assert(byCat("quote") === ((642L, 323L)))
    assert(byCat("question") === ((326L, 326L)))
    // the 5 idea-less pages are the known header divergences (Title
    // Case × 4, "1 IDEAS" × 1) the reference parser also skips
    assert(docs.count() - byCat("idea")._2 === 5L)
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
