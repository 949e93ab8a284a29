package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{BatchedScorer, LogisticCrossScorer, SearchApi}

/** The rerank seam carries a REAL serialized scorer (the GLSC artifact
  * — a distilled logistic cross-scorer over (query, doc) interaction
  * features), completing the pair with EncoderArtifactSpec: BOTH of the
  * reference's external models now flow through their seams as weights
  * loaded from bytes.
  */
class RerankArtifactSpec extends AnyFunSuite {
  import SparkSuite._

  private val Resource = "graft/cross_logistic.glsc"
  private val Query = "vector search with spark"

  test("the artifact loads and its logits depend on the file bytes") {
    val m = LogisticCrossScorer.loadResource(Resource)
    assert(m.weights.length === LogisticCrossScorer.NumFeatures + 1)
    // overlap monotonicity sanity: more shared tokens, higher logit
    val lo = m.logit(Query, "nothing relevant here at all")
    val hi = m.logit(Query, "spark vector search engine")
    assert(hi > lo, s"$hi vs $lo")
    // bit-for-bit reload; byte-flip sensitivity
    assert(LogisticCrossScorer.loadResource(Resource).logit(Query, "spark") ===
      m.logit(Query, "spark"))
    val url = getClass.getClassLoader.getResource(Resource)
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(url.toURI))
    bytes(12 + 4) = (bytes(12 + 4) ^ 0x3f).toByte // inside the overlap weight
    val tampered = LogisticCrossScorer.load(new java.io.ByteArrayInputStream(bytes))
    assert(tampered.logit(Query, "spark vector") !== m.logit(Query, "spark vector"))
  }

  test("SearchApi.search reranks end-to-end through the loaded scorer") {
    val m = LogisticCrossScorer.loadResource(Resource)
    val out = SearchApi.search(spark, Sf, Query,
        scorer = new BatchedScorer(model = m.model))
      .collect()
    assert(out.nonEmpty)
    // every served logit equals a driver-side recomputation from the
    // loaded weights over the served text — the weights really scored
    out.foreach { r =>
      val expected = m.logit(Query, r.getAs[String]("text"))
      assert(math.abs(r.getAs[Double]("logit") - expected) < 1e-12, r)
    }
    // and the ranking follows those logits
    val logits = out.sortBy(_.getAs[Long]("rerank_rank")).map(_.getAs[Double]("logit"))
    assert(logits.toSeq === logits.sortBy(-_).toSeq)
  }
}
