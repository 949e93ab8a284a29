package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Chunker

/** Content-defined chunking properties: determinism, expected chunk
  * size, and the rsync/LBFS re-synchronization property that makes CDC
  * worth having next to fixed-size chunking.
  */
class ChunkerSpec extends AnyFunSuite {
  import SparkSuite._

  test("cdc chunks cover every token exactly once") {
    val chunks = Chunker.chunkCdc(spark, Sf)
    val totalWords = chunks.agg(sum("n_words")).head().getLong(0)
    val expect = Tables.documents(spark, Sf)
      .select(sum(size(graft.functions.TextFunctions.tokens(col("text")))).cast("long"))
      .head().getLong(0)
    assert(totalWords === expect)
    // chunk indexes are dense from 0 per doc
    val bad = chunks.groupBy("doc_id")
      .agg(min("chunk_idx").as("mn"), max("chunk_idx").as("mx"), count(lit(1)).as("n"))
      .filter(col("mn") =!= 0 || col("mx") =!= col("n") - 1)
    assert(bad.count() === 0)
  }

  test("cdc boundaries hit at roughly the designed 1/8 rate") {
    val stats = Chunker.chunkCdc(spark, Sf)
      .agg(count(lit(1)).as("chunks"), sum("n_words").as("words")).head()
    val avg = stats.getLong(1).toDouble / stats.getLong(0)
    assert(avg > 4 && avg < 16, s"expected ~8-token chunks, got $avg")
  }

  test("cdc boundaries re-synchronize after a front insertion (fixed-size does not)") {
    import spark.implicits._
    val docs = Tables.documents(spark, Sf).select("doc_id", "text")
      .as[(Long, String)].collect().take(50)
    val edited = docs.map { case (id, t) => (id, s"INSERTED $t") }
    val orig = Chunker.cdcChunks(docs.toSeq.toDF("doc_id", "text"))
      .select("doc_id", "chunk_hash")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val shifted = Chunker.cdcChunks(edited.toSeq.toDF("doc_id", "text"))
      .select("doc_id", "chunk_hash")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // a front insertion perturbs only the chunks up to the first
    // post-edit boundary; everything after re-synchronizes, so most
    // chunk hashes survive — the property chunk-level dedup relies on
    val survived = (orig & shifted).size.toDouble / orig.size
    assert(survived > 0.5, s"only ${survived * 100}%% of chunks survived a front insertion")

    // fixed-size chunking loses (nearly) everything under the same edit:
    // every 20-token window shifts by one
    val fixedOrig = Chunker.chunkedText(docs.toSeq.toDF("doc_id", "text"))
      .select(col("doc_id"), md5(col("chunk_text")).as("h"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val fixedShift = Chunker.chunkedText(edited.toSeq.toDF("doc_id", "text"))
      .select(col("doc_id"), md5(col("chunk_text")).as("h"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val fixedSurvived = (fixedOrig & fixedShift).size.toDouble / fixedOrig.size
    assert(fixedSurvived < survived,
      s"fixed-size survived $fixedSurvived >= cdc $survived — cdc adds nothing?")
  }
}
