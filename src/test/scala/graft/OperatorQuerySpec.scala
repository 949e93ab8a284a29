package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every SURVEY.md §2 operator: runs at sf0.001, returns rows, and
  * (when an oracle exists) exposes exactly the column names the DuckDB
  * mirror aliases — the driver's hash compare sorts by column name, so
  * name drift is an instant failure.
  */
class OperatorQuerySpec extends AnyFunSuite {
  import SparkSuite._

  test("every oracle query has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries impl: $missing")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs and returns rows at sf0.001") {
      val df = fn(spark, Sf)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
