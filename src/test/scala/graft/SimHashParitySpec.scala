package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{TextExprs, TextFunctions}
import graft.operators.Dedup

class SimHashParitySpec extends AnyFunSuite {
  import SparkSuite._

  test("native simhash equals the relational md5-nibble formulation") {
    val a = Dedup.simhashSignatures(spark, Sf)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val b = Dedup.simhashSignaturesRelational(spark, Sf)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(a === b)
  }

  test("native shingler equals the HOF shingler") {
    val docs = Tables.documents(spark, Sf)
    val bad = docs.select(
      TextExprs.shingles(TextFunctions.tokens(col("text"))).as("n"),
      TextFunctions.shingles(TextFunctions.tokens(col("text"))).as("h"))
      .filter(col("n") =!= col("h")).count()
    assert(bad === 0)
  }
}
