package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The reference's actual ingest front door, re-expressed as pure
  * column operations: HTML → markdown conversion
  * (reference pipeline/markdown_assets.py:64-91) and the newsletter
  * section/item parser (reference pipeline/utils.py:93-187
  * `parse_newsletter`, utils.py:83-90 `clean_links` /
  * `trim_empty_lines`).
  *
  * Faithfulness notes (NewsletterSpec pins these against fixture
  * outputs produced by the reference parser):
  *  - sections split on `^## ` headers (multiline); a section joins a
  *    category by substring marker ("3 IDEAS FROM ME" / "2 QUOTES FROM
  *    OTHERS" / "1 QUESTION FOR YOU"), first match wins (the elif
  *    chain);
  *  - idea/quote items split on unanchored Roman numerals `[IVX]+\.`,
  *    the pre-numeral header fragment dropped, items indexed from 1;
  *  - quote sources prefer the `*Source:* [title](url)` link form,
  *    falling back to `*Source:* plain text` (title only, no url);
  *    titles lose literal `*`s; the quote body is truncated at the
  *    first `\n*Source:*`, link markup is unwrapped, `**` removed and
  *    double spaces single-pass collapsed — and only then prefixed
  *    "Quote from {title}: " when a title exists;
  *  - questions drop the header marker and everything from
  *    "Until next week" on, and keep interior whitespace verbatim
  *    (the reference cleans only quotes);
  *  - empty/whitespace-only lines are dropped and ends stripped
  *    (`trim_empty_lines`) on every emitted chunk.
  *
  * Scale shape: everything here is per-row string/array math over one
  * scan — two nested posexplodes (sections, then items), no joins, no
  * shuffle. The per-category chunk index is positional within the
  * document (as in the reference, which enumerates within one issue),
  * so no window over the corpus is needed.
  */
object Newsletter {

  /** Python `str.strip()`: removes ALL leading/trailing whitespace
    * (spaces, tabs, newlines) — Spark's `trim` strips spaces only.
    */
  def pyStrip(c: Column): Column =
    regexp_replace(regexp_replace(c, "^\\s+", ""), "\\s+$", "")

  /** Reference `trim_empty_lines` (utils.py:88-90): drop
    * empty/whitespace-only lines, keep the rest verbatim, strip ends.
    */
  def trimEmptyLines(c: Column): Column =
    pyStrip(array_join(
      filter(split(pyStrip(c), "\n"), x => length(pyStrip(x)) > 0), "\n"))

  /** Reference `clean_links` (utils.py:83-85): `[label](url)` → label. */
  def cleanLinks(c: Column): Column =
    regexp_replace(c, "\\[([^\\]]+)\\]\\([^\\)]+\\)", "$1")

  private val IdeasMarker = "3 IDEAS FROM ME"
  private val QuotesMarker = "2 QUOTES FROM OTHERS"
  private val QuestionMarker = "1 QUESTION FOR YOU"

  /** Parse newsletter markdown into categorized chunks — the Spark
    * twin of utils.py:93-187. Input: any DataFrame with an id column,
    * a markdown column and an issue-date column. Output: one row per
    * chunk with (idCol, category, idx, text, source, source_name,
    * date); documents/sections matching no category emit nothing.
    */
  def parseNewsletter(docs: DataFrame, idCol: String = "doc_id",
      mdCol: String = "md_text", dateCol: String = "issue_date"): DataFrame = {
    // utils.py:97 — strip "[Share this on ..." promo lines
    val cleanText = regexp_replace(col(mdCol), "(?m)^\\[Share this on.*\\n?", "")
    // utils.py:100-102 — split on ^##\s+ headers
    val sections = docs.select(col(idCol), col(dateCol).as("date"),
        explode(split(cleanText, "(?m)^##\\s+")).as("sec0"))
      // utils.py:107-108 — strip, then remove every "---"
      .select(col(idCol), col("date"),
        expr("replace(sec0, '---', '')").as("sec"))
      .withColumn("category",
        when(col("sec").contains(IdeasMarker), "idea")
          .when(col("sec").contains(QuotesMarker), "quote")
          .when(col("sec").contains(QuestionMarker), "question"))
      .filter(col("category").isNotNull)
    // the strip in utils.py:107 only matters for the question branch
    // (both splits are whitespace-insensitive); python strips BEFORE
    // the --- removal, which cannot expose new end-whitespace to the
    // marker checks, so stripping lazily here is equivalent
    val items = sections.withColumn("item",
      when(col("category") === "question",
        // utils.py:170-174 — drop the marker, strip, truncate at
        // "Until next week" — exactly one chunk
        array(pyStrip(substring_index(
          pyStrip(expr(s"replace(sec, '$QuestionMarker', '')")),
          "Until next week", 1))))
        // utils.py:112,127 — unanchored Roman-numeral split; [0] is the
        // pre-numeral header fragment, dropped
        .otherwise(slice(split(col("sec"), "[IVX]+\\."), 2, 1 << 20)))
      .select(col(idCol), col("date"), col("category"),
        posexplode(col("item")).as(Seq("pos", "raw")))
      .withColumn("idx", (col("pos") + 1).cast("long"))
    // quote source extraction (utils.py:129-155)
    val linkedTitle = nullif(regexp_extract(col("raw"),
      "\\*Source:\\*\\s*\\[([^\\]]+)\\]\\(([^\\)]+)\\)", 1), lit(""))
    val linkedUrl = nullif(regexp_extract(col("raw"),
      "\\*Source:\\*\\s*\\[([^\\]]+)\\]\\(([^\\)]+)\\)", 2), lit(""))
    val fallbackTitle = nullif(regexp_extract(col("raw"),
      "(?m)\\*Source:\\*\\s*(.+)$", 1), lit(""))
    val srcName = expr("replace(src_name0, '*', '')")
    // quote body: truncate at \n*Source:*, unwrap links, drop **,
    // single-pass collapse double spaces, strip
    val quoteBody = pyStrip(
      expr("replace(replace(quote_clean0, '**', ''), '  ', ' ')"))
    items
      .withColumn("src_name0",
        when(col("category") === "quote", coalesce(linkedTitle, fallbackTitle)))
      .withColumn("source",
        when(col("category") === "quote" && linkedTitle.isNotNull, linkedUrl))
      .withColumn("source_name", srcName)
      .withColumn("quote_clean0",
        cleanLinks(regexp_replace(col("raw"), "(?s)\\n\\*Source:\\*.*", "")))
      .withColumn("text",
        // utils.py:117 — the prefix is OUTSIDE trim_empty_lines: an
        // empty idea keeps the trailing space of "...Clear: "
        when(col("category") === "idea",
          concat(lit("Idea from James Clear: "), trimEmptyLines(col("raw"))))
          .when(col("category") === "quote",
            trimEmptyLines(when(col("source_name").isNotNull,
              concat(lit("Quote from "), col("source_name"), lit(": "), quoteBody))
              .otherwise(quoteBody)))
          .otherwise(trimEmptyLines(col("raw"))))
      .select(col(idCol), col("category"), col("idx"), col("text"),
        col("source"), col("source_name"), col("date"))
  }

  /** Deterministic newsletter markdown built from a documents row:
    * sanitized text segments fill the three sections, with one linked
    * and one plain-text source. Shared by the graded queries and their
    * DuckDB oracles (same construction in SQL) so the parser — not the
    * synthesis — is what's compared.
    */
  def syntheticMd(spark: SparkSession, dir: String): DataFrame = {
    // fanOut: single-file test tables give one input split; the parse
    // is per-row math and should use every core
    val docs = Tables.fanOut(Tables.documents(spark, dir))
    // lowercase letters+spaces only: segments can never fake a Roman
    // numeral, a header or link markup, so every chunk boundary comes
    // from the constructed skeleton (content inside is arbitrary)
    val san = regexp_replace(lower(col("text")), "[^a-z ]", "")
    def seg(c: Column, start: Int, len: Int) = substring(c, start, len)
    val id = col("doc_id").cast("string")
    docs.select(col("doc_id"), col("source"), san.as("san"))
      .select(col("doc_id"),
        concat(
          lit("# Issue "), id, lit("\n"),
          lit("[Share this on the socials](https://share.example/"), id, lit(")\n"),
          lit("\n## 3 IDEAS FROM ME\n\nI.\n"), seg(col("san"), 1, 80),
          lit("\n\nII.\n"), seg(col("san"), 81, 80),
          lit("\n\nIII.\n"), seg(col("san"), 161, 80),
          lit("\n\n---\n\n## 2 QUOTES FROM OTHERS\n\nI.\n"), seg(col("san"), 241, 60),
          lit("\n\n*Source:* [*"), col("source"),
          lit(" weekly*](https://src.example/"), id, lit(")\n\nII.\n"),
          seg(col("san"), 301, 60),
          lit("\n\n*Source:* the "), col("source"), lit(" archive\n\n"),
          lit("## 1 QUESTION FOR YOU\n\n"), seg(col("san"), 361, 60),
          lit("\n\nUntil next week,\nJames\n")).as("md_text"),
        date_add(to_date(lit("2024-01-01")), pmod(col("doc_id"), lit(365)).cast("int"))
          .cast("string").as("issue_date"))
  }

  /** Graded query `doc_parse_md`: the faithful newsletter parse over
    * the synthetic markdown — every doc yields 3 ideas, 2 quotes
    * (one linked source, one plain-text source) and 1 question, unless
    * its text is too short to fill a segment (the empty-item cases ride
    * along and must match too).
    */
  def parseMdQuery(spark: SparkSession, dir: String): DataFrame =
    parseNewsletter(syntheticMd(spark, dir))
      .select(col("doc_id"), col("category"), col("idx"), col("text"),
        col("source"), col("source_name"), col("date"))

  /** The (pattern, spark-replacement, duckdb-replacement) chain of
    * [[htmlToMarkdown]], exposed so OracleSql can emit the identical
    * fold — one divergence-proof source of truth for both engines.
    */
  val HtmlMdChain: Seq[(String, String, String)] = Seq(
    ("(?s)<h1[^>]*>(.*?)</h1>", "\n# $1\n", "\n# \\1\n"),
    ("(?s)<h2[^>]*>(.*?)</h2>", "\n## $1\n", "\n## \\1\n"),
    ("(?s)<h3[^>]*>(.*?)</h3>", "\n### $1\n", "\n### \\1\n"),
    ("(?s)<a href=\"([^\"]*)\"[^>]*>(.*?)</a>", "[$2]($1)", "[\\2](\\1)"),
    ("(?s)<(?:strong|b)>(.*?)</(?:strong|b)>", "**$1**", "**\\1**"),
    ("(?s)<(?:em|i)>(.*?)</(?:em|i)>", "*$1*", "*\\1*"),
    ("<hr[^>]*>", "\n---\n", "\n---\n"),
    ("(?s)<li[^>]*>(.*?)</li>", "\n* $1", "\n* \\1"),
    ("</p>|<br[^>]*>|</div>", "\n", "\n"),
    ("<[^>]*>", "", ""),
    // entity unescape — the named + numeric forms the archive actually
    // uses (BeautifulSoup unescapes all of these during parse; a
    // regex chain covers the observed inventory). `&amp;` goes LAST so
    // a double-escaped "&amp;lt;" unescapes once, as a real parser does
    ("&lt;", "<", "<"),
    ("&gt;", ">", ">"),
    ("&quot;", "\"", "\""),
    ("&#39;|&#039;", "'", "'"),
    ("&nbsp;|&#160;", " ", " "),
    ("&#8216;|&lsquo;", "‘", "‘"),
    ("&#8217;|&rsquo;", "’", "’"),
    ("&#8220;|&ldquo;", "“", "“"),
    ("&#8221;|&rdquo;", "”", "”"),
    ("&#8211;|&ndash;", "–", "–"),
    ("&#8212;|&mdash;", "—", "—"),
    ("&#8230;|&hellip;", "…", "…"),
    ("&#038;|&amp;", "&", "&"),
    ("\\n{3,}", "\n\n", "\n\n"))

  /** Graded query `doc_html_md`: deterministic newsletter HTML built
    * from the documents table, pushed through the HTML→markdown
    * converter; emits the page title and the md5 of the markdown (the
    * oracle rebuilds the same HTML and mirrors the same regex fold).
    */
  def htmlMdQuery(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.fanOut(Tables.documents(spark, dir))
    val san = regexp_replace(lower(col("text")), "[^a-z ]", "")
    val id = col("doc_id").cast("string")
    val html = concat(
      lit("<html><body><header class=\"page__header\"><h1>3-2-1: Issue "), id,
      lit("</h1></header><div class=\"page__content\">"),
      lit("<h2>3 IDEAS FROM ME</h2><p>I. "), substring(col("san"), 1, 60),
      lit("</p><hr><h2>2 QUOTES FROM OTHERS</h2><p>I. "), substring(col("san"), 61, 60),
      lit("</p><p><em>Source:</em> <a href=\"https://b.example/"), id,
      lit("\">*"), col("source"), lit("*</a></p>"),
      lit("<h2>1 QUESTION FOR YOU</h2><p>"), substring(col("san"), 121, 60),
      lit("</p><p>Until next week, James</p></div></body></html>"))
    docs.select(col("doc_id"), col("source"), san.as("san"))
      .select(col("doc_id"), html.as("html"))
      .select(col("doc_id"),
        regexp_extract(col("html"), "(?s)<h1[^>]*>(.*?)</h1>", 1).as("title"),
        md5(htmlToMarkdown(col("html"))).as("md_hash"))
  }

  /** HTML → markdown as column ops — the Spark twin of
    * markdown_assets.py:64-91 (BeautifulSoup extract + markdownify with
    * ATX headings), for the regular tag subset a newsletter page uses:
    * h1-h3 → #/##/###, a → [t](u), strong/b → **, em/i → *, hr → ---,
    * li → bullet, p/br/div boundaries → newlines, remaining tags
    * stripped, the five standard entities unescaped, blank runs
    * collapsed. Nested same-name divs inside the content div are out of
    * regex reach (not regular) — the reference's pages don't nest them.
    */
  def htmlToMarkdown(html: Column): Column = {
    // content scope, most-specific first: (1) the real newsletter-page
    // form — the content div carries extra classes
    // (class="page__content page-content-style") and is followed by the
    // post-navigation block, the reliable right boundary a
    // non-balancing regex needs (BeautifulSoup's find(class_=...)
    // matches the multi-class attribute and scopes the subtree; all
    // 331 archive pages have exactly this shape); (2) the single-div
    // fixture form; (3) whole page.
    // CRLF/CR → LF up front: the reference's str.splitlines()/strip()
    // treat \r as a line break, and every downstream split here is on
    // "\n" — a CRLF download would otherwise leak stray \r into chunks
    val lf = regexp_replace(html, "\r\n?", "\n")
    val content = coalesce(
      nullif(regexp_extract(lf,
        "(?s)<div class=\"page__content[^\"]*\"[^>]*>(.*?)<div class=\"post__next\">", 1),
        lit("")),
      nullif(regexp_extract(lf,
        "(?s)<div class=\"page__content[^\"]*\"[^>]*>(.*)</div>", 1), lit("")),
      lf)
    val title = nullif(pyStrip(regexp_replace(regexp_extract(lf,
      "(?s)<h1[^>]*>(.*?)</h1>", 1), "<[^>]*>", "")), lit(""))
    // tag→markdown chain shared with the oracle (HtmlMdChain); the
    // last step is markdownify-style hygiene: collapse 3+ newlines
    val md = HtmlMdChain.foldLeft(content) { case (c, (pat, rep, _)) =>
      regexp_replace(c, pat, rep)
    }
    // markdown_assets.py:89 — "# {title}\n\n" + body
    pyStrip(concat(
      when(title.isNotNull, concat(lit("# "), title, lit("\n\n"))).otherwise(lit("")),
      pyStrip(md)))
  }
}
