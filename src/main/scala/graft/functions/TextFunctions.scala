package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives shared by the document pipeline, dedup family and
  * text-analysis operators. Pure `Column` expressions (codegen'd).
  *
  * Tokenization contract: whitespace-regex split of the trimmed text —
  * mirrored exactly by `string_split_regex(trim(text), '\s+')` in the
  * DuckDB oracle.
  */
object TextFunctions {

  /** Whitespace tokens (with multiplicity, in document order). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Distinct k-word shingles (k=3), the unit for MinHash / Jaccard
    * dedup (reference chunks are similarly word-window based,
    * reference pipeline/utils.py:93-187).
    *
    * Guarded for <k tokens because Spark's `sequence(1, n)` produces a
    * *descending* sequence when n < 1 (DuckDB's generate_series returns
    * [] there instead).
    */
  def shingles(toks: Column, k: Int = 3): Column = {
    val idx = sequence(lit(1), size(toks) - (k - 1))
    val mk = transform(idx, i =>
      concat_ws(" ", (0 until k).map(o => element_at(toks, i + o)): _*))
    array_distinct(when(size(toks) >= k, mk).otherwise(array().cast("array<string>")))
  }

  /** All k-word grams WITH multiplicity, in document order — the
    * repetition-statistic unit (Gopher-style quality rules), where
    * [[shingles]] is the distinct twin used for set-similarity dedup.
    * Same <k-token guard (Spark's `sequence` descends when n < 1).
    */
  def gramsAll(toks: Column, k: Int): Column = {
    val idx = sequence(lit(1), size(toks) - (k - 1))
    val mk = transform(idx, i =>
      concat_ws(" ", (0 until k).map(o => element_at(toks, i + o)): _*))
    when(size(toks) >= k, mk).otherwise(array().cast("array<string>"))
  }

  /** Count of tokens that belong to a fixed marker set (multiplicity
    * preserved) — DuckDB mirror: len(list_filter(toks, t -> t IN (...))).
    */
  def markerCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words: _*))).cast("long")

  /** Sum of token lengths (sequential integer fold — exact). */
  def sumTokenLengths(toks: Column): Column =
    aggregate(transform(toks, t => length(t).cast("long")), lit(0L), (a, x) => a + x)

  /** Canonical fingerprint: md5 over the sorted distinct token set
    * (OpenRefine-style key collision fingerprinting).
    */
  def fingerprint(toks: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(toks))))

  /** English stopword markers (quality scoring + langid 'en' row). */
  val StopEn = Seq("the", "a", "of", "and", "to", "in", "is", "for", "on", "with")

  /** Marker vocabularies for the n-gram-heuristic language ID. */
  val LangMarkers: Seq[(String, String)] =
    (StopEn.map("en" -> _)) ++
      Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein").map("de" -> _) ++
      Seq("le", "la", "les", "et", "des", "un", "une", "est").map("fr" -> _) ++
      Seq("el", "los", "las", "y", "es", "que", "por", "una").map("es" -> _) ++
      Seq("的", "了", "是", "在", "我", "有").map("zh" -> _)
}
