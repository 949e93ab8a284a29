package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{BatchedEncoder, HashingEncoder, SearchApi}

/** The encoder seam: SearchApi.search must be IDENTICAL under the
  * column-expression stub and the batched-inference slot, and the
  * batched slot's plumbing (schema append, batch shape, normalization)
  * must be real — so a deployment swaps in a model by constructor
  * argument only.
  */
class EncoderSeamSpec extends AnyFunSuite {
  import SparkSuite._

  test("batched corpus encode is bit-identical to the column expression") {
    val docs = Tables.documents(spark, Sf).select("doc_id", "text")
    val hash = new HashingEncoder().encode(docs, "text", "vec")
      .select("doc_id", "vec").orderBy("doc_id").collect()
    val batched = new BatchedEncoder(batchSize = 7).encode(docs, "text", "vec")
      .select("doc_id", "vec").orderBy("doc_id").collect()
    assert(hash.length === batched.length)
    hash.zip(batched).foreach { case (h, b) =>
      assert(h.getLong(0) === b.getLong(0))
      assert(h.getSeq[Float](1) === b.getSeq[Float](1), s"doc ${h.getLong(0)}")
    }
  }

  test("encoded vectors honor the contract: fixed dim, L2-normalized") {
    val docs = Tables.documents(spark, Sf).select("text").limit(50)
    val enc = new BatchedEncoder().encode(docs, "text", "vec").collect()
    enc.foreach { r =>
      val v = r.getSeq[Float](1)
      assert(v.length === SearchApi.Dim)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-5 || n == 0.0)
    }
  }

  test("SearchApi.search runs UNCHANGED under either encoder") {
    val a = SearchApi.search(spark, Sf, "vector search data pipelines",
      encoder = new HashingEncoder()).collect().toSeq
    val b = SearchApi.search(spark, Sf, "vector search data pipelines",
      encoder = new BatchedEncoder(batchSize = 3)).collect().toSeq
    assert(a.nonEmpty)
    assert(a === b)
    // and a filtered query too (payload filters compose with the seam)
    val c = SearchApi.search(spark, Sf, "distributed joins", minLogit = Some(-5.0),
      lang = Some("en"), encoder = new BatchedEncoder()).collect().toSeq
    val d = SearchApi.search(spark, Sf, "distributed joins", minLogit = Some(-5.0),
      lang = Some("en")).collect().toSeq
    assert(c === d)
  }

  test("a different model changes vectors but not the plumbing") {
    // a toy 'real model': constant direction per text length — proves
    // the slot accepts arbitrary model fns with the same contract
    val toy = (texts: Seq[String], dim: Int) => texts.map { t =>
      val v = Array.tabulate(dim)(i => if (i == t.length % dim) 1.0f else 0.0f)
      v
    }
    val docs = Tables.documents(spark, Sf).select("doc_id", "text").limit(20)
    val out = new BatchedEncoder(model = toy).encode(docs, "text", "vec")
      .select("doc_id", "vec").collect()
    assert(out.length === 20)
    out.foreach { r =>
      val v = r.getSeq[Float](1)
      assert(v.count(_ != 0.0f) === 1 && v.sum === 1.0f)
    }
  }
}
