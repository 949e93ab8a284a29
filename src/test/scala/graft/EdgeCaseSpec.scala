package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Chunker
import graft.functions.TextFunctions._

/** Degenerate-document robustness: the driver corpus has no nulls or
  * empties, so these guard the per-row text operators against the
  * inputs a real 100 TB crawl certainly contains.
  */
class EdgeCaseSpec extends AnyFunSuite {
  import SparkSuite._
  import spark.implicits._

  private val weird = Seq(
    (1L, "single"),
    (2L, ""),
    (3L, "   "),
    (4L, "two tokens"),
    (5L, "a b c d e f g h i j k l m n o p q r s t u v w x y z"),
    (6L, "dup dup dup dup dup"),
  ).toDF("doc_id", "text")

  test("shingles of short docs are empty, not descending-sequence garbage") {
    val out = weird.select(col("doc_id"), shingles(tokens(col("text"))).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L).isEmpty) // 1 token < k=3
    assert(out(4L).isEmpty) // 2 tokens < k=3
    assert(out(6L) === Seq("dup dup dup")) // distinct shingles collapse
    assert(out(5L).length === 24)
  }

  test("cdc chunking survives empty and single-token docs") {
    val chunks = Chunker.cdcChunks(weird).collect()
    val byDoc = chunks.groupBy(_.getLong(0))
    // every doc yields at least one chunk (empty text tokenizes to [""])
    assert(byDoc.keySet === Set(1L, 2L, 3L, 4L, 5L, 6L))
    byDoc.values.foreach(cs => assert(cs.map(_.getLong(2)).sum > 0))
  }

  test("fixed-size chunking yields no chunks for empty docs and full coverage otherwise") {
    val chunks = Chunker.chunkedText(weird).collect()
    val byDoc = chunks.groupBy(_.getLong(0))
    // trim("")/trim("   ") tokenize to [""] — one 1-word chunk, no crash
    byDoc.values.foreach { cs =>
      assert(cs.map(_.getLong(3)).sum > 0)
    }
    assert(byDoc(5L).map(_.getLong(3)).sum === 26)
  }

  test("quality and langid columns do not throw on degenerate docs") {
    val out = weird.select(col("doc_id"),
      graft.operators.TextAnalysis.qualityScore(col("text")).as("q"),
      graft.operators.TextAnalysis.predLang(col("text")).as("lang"))
      .collect()
    assert(out.length === 6)
    // quality is a sigmoid: NaN is the only failure mode worth guarding
    out.foreach { r =>
      assert(!r.isNullAt(2))
      assert(r.isNullAt(1) || !r.getDouble(1).isNaN)
    }
  }

  test("gopher stats survive empty / single-token / all-duplicate docs") {
    val g = weird.select(col("doc_id"),
        graft.operators.TextAnalysis.gopherStats(col("text")).as("s"))
      .select(col("doc_id"), col("s.n_toks"), col("s.uniq_frac"), col("s.top2_frac"),
        col("s.dup3_frac"), col("s.mean_wlen"), col("s.keep"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    // empty text tokenizes to [""]: one token, no grams, zero fractions
    assert(g(2L) === ((1L, 1.0, 0.0, 0.0, 0.0)))
    assert(g(1L)._3 === 0.0) // single token: no 2-grams
    // "dup dup dup dup dup": one distinct token, fully repetitive
    assert(g(6L)._2 === 0.2)
    assert(g(6L)._3 === 1.0) // every 2-gram is the same
    assert(g(6L)._4 === 0.666667) // 3 identical 3-grams → dup frac r6(2/3)
  }

  test("entropy term fold handles degenerate docs without nulls") {
    import graft.functions.TextFunctions.tokens
    import graft.functions.VectorFunctions.cents
    val toks = tokens(col("text"))
    val n = size(toks)
    val termE6 = transform(array_distinct(toks), t => {
      val p = size(filter(toks, y => y === t)) / (lit(1.0) * n)
      cents(-p * log(p), 1e6)
    })
    val out = weird.select(col("doc_id"),
        aggregate(termE6, lit(0L), (a, x) => a + x).as("e6"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(2L) === 0L) // [""] — single type, zero entropy
    assert(out(6L) === 0L) // constant doc — zero entropy
    assert(out(5L) > 0L)   // 26 uniform types — maximal positive entropy
  }

  test("minhash signatures of shingle-less docs are null-safe for banding") {
    val sigs = weird.select(col("doc_id"),
      graft.functions.MinHashExpr.minhashSig(
        shingles(tokens(col("text"))), 4).as("mh"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[String](1)))
      .toMap
    // docs with no shingles produce null/empty signatures, which the
    // band join drops instead of matching everything-to-everything
    val short = sigs(1L)
    assert(short == null || short.forall(_ == null) || short.isEmpty)
  }
}
