package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import graft.operators.{Dedup, DedupChain}

/** The opt-in session chain cache (DedupChain) must be semantically
  * invisible: every chain consumer returns row-identical results with
  * the cache on and off, the chain prefix materializes exactly once
  * per session, and the default state is OFF for library users.
  */
class DedupChainSpec extends AnyFunSuite {
  import SparkSuite._

  private def rows(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted
    df.select(cols.head, cols.tail: _*).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
  }

  private def family(): Map[String, DataFrame] = Map(
    "ngram" -> Dedup.ngramJaccard(spark, Sf),
    "drop" -> Dedup.dropDecisions(spark, Sf),
    "report" -> Dedup.report(spark, Sf),
    "est" -> Dedup.minhashEstimate(spark, Sf),
    "components" -> Dedup.components(spark, Sf))

  test("cache off by default; enabled results are row-identical for all five consumers") {
    assert(!DedupChain.enabled)
    val off = family().map { case (k, df) => k -> rows(df) }
    try {
      DedupChain.enable()
      DedupChain.reset()
      val on = family().map { case (k, df) => k -> rows(df) }
      off.keys.foreach { k => assert(on(k) === off(k), s"consumer $k diverged under cache") }
    } finally { DedupChain.disable(); DedupChain.reset() }
  }

  test("the chain prefix materializes once per session, not once per query") {
    try {
      DedupChain.enable()
      DedupChain.reset()
      family().values.foreach(_.count())
      // one pair table + one signature table, regardless of consumer count
      assert(DedupChain.builtCount === 2)
      // a second full family pass adds nothing
      family().values.foreach(_.count())
      assert(DedupChain.builtCount === 2)
    } finally { DedupChain.disable(); DedupChain.reset() }
  }

  test("cache survives a Bench-style unpersist sweep (file-backed, not block-backed)") {
    try {
      DedupChain.enable()
      DedupChain.reset()
      val before = rows(Dedup.ngramJaccard(spark, Sf))
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      assert(DedupChain.builtCount >= 1)
      assert(rows(Dedup.ngramJaccard(spark, Sf)) === before)
    } finally { DedupChain.disable(); DedupChain.reset() }
  }
}
