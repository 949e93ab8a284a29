package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

class MultimodalSpec extends AnyFunSuite {
  import SparkSuite._

  test("binary payload length equals n_chars (ascii corpus)") {
    val f = Multimodal.decodeFeatures(spark, Sf)
    val d = Tables.documents(spark, Sf).select(col("doc_id"), col("n_chars"))
    val bad = f.join(d, "doc_id").filter(col("byte_len") =!= col("n_chars")).count()
    assert(bad === 0)
  }

  test("decode is deterministic and batched") {
    val a = Multimodal.decodeFeatures(spark, Sf).orderBy("doc_id").collect()
    val b = Multimodal.decodeFeatures(spark, Sf).orderBy("doc_id").collect()
    assert(a.sameElements(b))
    assert(a.forall(_.getAs[Long]("n_batch") <= Multimodal.BatchSize))
    assert(a.exists(_.getAs[Long]("n_batch") > 1), "batching never exercised")
  }
}
