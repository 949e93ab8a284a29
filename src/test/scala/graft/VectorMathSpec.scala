package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

class VectorMathSpec extends AnyFunSuite {
  import SparkSuite._

  private def eval(c: org.apache.spark.sql.Column): Double = {
    import spark.implicits._
    Seq((Array(1.0f, 2.0f, 3.0f), Array(-1.0f, 0.5f, 2.0f)))
      .toDF("a", "b").select(c.as("v")).head().getDouble(0)
  }

  test("dot is the sequential double fold") {
    assert(eval(dot(col("a"), col("b"))) === 1.0 * -1.0 + 2.0 * 0.5 + 3.0 * 2.0)
  }

  test("norm") {
    assert(math.abs(eval(norm(col("a"))) - math.sqrt(14.0)) < 1e-12)
  }

  test("dist2") {
    assert(eval(dist2(col("a"), col("b"))) === (4.0 + 2.25 + 1.0))
  }

  test("cosine of identical vectors is 1") {
    assert(math.abs(eval(cosine(col("a"), col("a"))) - 1.0) < 1e-12)
  }

  test("r6 rounding is floor(x*1e6+0.5)/1e6") {
    assert(eval(r6(lit(0.12345654321))) === 0.123457)
    assert(eval(r6(lit(-0.1234565))) === -0.123456) // half rounds toward +inf
  }

  test("embeddings are unit-norm after l2normalize") {
    val n = Tables.embeddings(spark, Sf)
      .withColumn("nv", norm(col("embedding")))
      .withColumn("renorm", norm(l2normalize(col("embedding"), col("nv"))))
      .agg(max(abs(col("renorm") - 1.0))).head().getDouble(0)
    assert(n < 1e-12)
  }
}
