package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{BatchedEncoder, LinearTextModel, SearchApi}

/** The encoder seam carries a REAL serialized model (r8 verdict): the
  * committed GLTM artifact (a 256×64 linear projection) is loaded from
  * bytes on disk, shipped through BatchedEncoder's batched
  * mapPartitions, and drives SearchApi.search end-to-end — proving the
  * seam moves weights, not just the built-in JVM twin.
  */
class EncoderArtifactSpec extends AnyFunSuite {
  import SparkSuite._

  private val Resource = "graft/text_linear_64.gltm"
  private val Query = "vector search with spark"

  test("the artifact loads, embeds unit-norm vectors, and depends on its bytes") {
    val m = LinearTextModel.loadResource(Resource)
    assert(m.vocab === 256 && m.dim === SearchApi.Dim)
    val v = m.embed(Query)
    assert(v.length === 64)
    assert(math.abs(v.map(x => x.toDouble * x).sum - 1.0) < 1e-6, "not unit norm")
    // two independent loads agree bit-for-bit
    assert(LinearTextModel.loadResource(Resource).embed(Query).toSeq === v.toSeq)
    // flipping one weight byte changes the output: the numbers really
    // come from the file, not from any code path
    val url = getClass.getClassLoader.getResource(Resource)
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(url.toURI))
    bytes(16 + 128) = (bytes(16 + 128) ^ 0x7f).toByte // inside row 0's floats
    val tampered = LinearTextModel.load(new java.io.ByteArrayInputStream(bytes))
    // a token that buckets into the tampered row 0
    val tok0 = (0 until 10000).map(i => s"t$i")
      .find(t => Math.floorMod(t.hashCode, 256) == 0).get
    assert(tampered.embed(tok0).toSeq !== m.embed(tok0).toSeq)
    // and it is NOT the hashing twin
    assert(v.toSeq !== BatchedEncoder.hashingModel(Seq(Query), 64).head.toSeq)
  }

  test("SearchApi.search runs end-to-end through the loaded artifact, partitioning-invariant") {
    val m = LinearTextModel.loadResource(Resource)
    val enc = new BatchedEncoder(model = m.model)
    val out = SearchApi.search(spark, Sf, Query, encoder = enc)
      .select("doc_id", "score", "logit", "label", "rerank_rank")
    val rows = out.collect().map(_.toString).toSeq
    assert(rows.nonEmpty)
    // the retrieval really used the artifact's query vector: re-ranking
    // with the stub encoder yields a different retrieval ordering
    val stub = SearchApi.search(spark, Sf, Query)
      .select("doc_id", "score", "logit", "label", "rerank_rank")
      .collect().map(_.toString).toSeq
    assert(rows !== stub, "artifact encoder produced the stub's results")
    // batched inference is partitioning-invariant: corpus-side encode of
    // document text through the seam gives identical vectors at 1 and 7
    // partitions
    val docs = Tables.documents(spark, Sf).select("doc_id", "text")
    def encoded(parts: Int) =
      enc.encode(docs.repartition(parts), "text", "v")
        .select(col("doc_id"), col("v"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(encoded(1) === encoded(7))
  }
}
