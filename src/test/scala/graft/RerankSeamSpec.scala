package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{BatchedScorer, ColumnScorer, SearchApi}

/** The cross-encoder seam: SearchApi.search must be IDENTICAL under
  * the column-expression stub and the batched-inference slot — so the
  * reference's SECOND external model (CrossEncoder.predict,
  * query.py:57-60) is also a constructor-argument swap, completing the
  * two-model integration story started by EncoderSeamSpec.
  */
class RerankSeamSpec extends AnyFunSuite {
  import SparkSuite._

  test("SearchApi.search runs UNCHANGED under either scorer") {
    val a = SearchApi.search(spark, Sf, "vector search data pipelines",
      scorer = new ColumnScorer).collect().toSeq
    val b = SearchApi.search(spark, Sf, "vector search data pipelines",
      scorer = new BatchedScorer(batchSize = 3)).collect().toSeq
    assert(a.nonEmpty)
    assert(a === b)
    // filters + both seams composed: batched encoder AND batched scorer
    val c = SearchApi.search(spark, Sf, "distributed joins", minLogit = Some(-5.0),
      lang = Some("en"), encoder = new graft.operators.BatchedEncoder(),
      scorer = new BatchedScorer()).collect().toSeq
    val d = SearchApi.search(spark, Sf, "distributed joins", minLogit = Some(-5.0),
      lang = Some("en")).collect().toSeq
    assert(c === d)
  }

  test("batched logits are bit-identical to the column expression") {
    val docs = Tables.documents(spark, Sf)
      .select(col("doc_id"), col("text"), col("n_chars"),
        (col("doc_id") / lit(100.0)).as("score"))
    val stub = new ColumnScorer().score(docs, "q", "logit")
      .select("doc_id", "logit").orderBy("doc_id").collect()
    val batched = new BatchedScorer(batchSize = 7).score(docs, "q", "logit")
      .select("doc_id", "logit").orderBy("doc_id").collect()
    assert(stub.length === batched.length && stub.length > 0)
    stub.zip(batched).foreach { case (s, b) =>
      assert(s.getDouble(1) === b.getDouble(1), s"doc ${s.getLong(0)}")
    }
  }

  test("a different model changes logits but not the plumbing") {
    // toy 'real cross-encoder': lexical-overlap scorer over the actual
    // (query, text) pair — proves the slot feeds the model the pair,
    // not just the stub's features
    val toy = (q: String, batch: Seq[BatchedScorer.Pair]) => {
      val qs = q.split("\\s+").toSet
      batch.map(p => p.text.split("\\s+").count(qs.contains).toDouble)
    }
    val out = SearchApi.search(spark, Sf, "the data of",
      scorer = new BatchedScorer(model = toy)).collect()
    assert(out.nonEmpty)
    // logit = overlap count: a whole number, and rank order follows it
    out.foreach(r => assert(r.getDouble(2) === math.floor(r.getDouble(2))))
    val byRank = out.sortBy(_.getLong(5))
    assert(byRank.map(_.getDouble(2)).toSeq === byRank.map(_.getDouble(2)).sortBy(-(_: Double)).toSeq)
  }

  test("r13 (ADVICE r12): a query-sensitive scorer cannot inherit the default scoreMany") {
    // a scorer whose score() USES the query text but forgot to override
    // scoreMany must fail loudly through the batch facade, not silently
    // score every row with the empty query
    class QuerySensitive extends graft.operators.CrossScorer {
      override def score(df: org.apache.spark.sql.DataFrame, queryText: String,
          outCol: String, textCol: String, scoreCol: String,
          nCharsCol: String): org.apache.spark.sql.DataFrame =
        df.withColumn(outCol, org.apache.spark.sql.functions.lit(queryText.length.toDouble))
    }
    val df = spark.range(1).selectExpr("'t' AS text", "CAST(0.5 AS DOUBLE) AS score",
      "CAST(10 AS BIGINT) AS n_chars", "'q' AS query_text")
    val ex = intercept[IllegalArgumentException](
      new QuerySensitive().scoreMany(df, "query_text", "logit"))
    assert(ex.getMessage.contains("scoreMany"))
    // the declared-agnostic stub and the overriding batched scorer both pass
    assert(new graft.operators.ColumnScorer().scoreMany(df, "query_text", "logit")
      .collect().length === 1)
    assert(new BatchedScorer().scoreMany(df, "query_text", "logit")
      .collect().length === 1)
  }
}
