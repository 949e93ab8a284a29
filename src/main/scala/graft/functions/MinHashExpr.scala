package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature: given the distinct-shingle array, returns
  * the `numPerms` lexicographic-minimum md5 hex strings in one pass —
  * numerically identical to `array_min(transform(sh, s ->
  * md5(concat(j, ':', s))))` per permutation j (the HOF spec, which the
  * DuckDB oracle mirrors), but one MessageDigest loop instead of
  * `numPerms` interpreted lambda traversals with per-element expression
  * dispatch.
  *
  * CodegenFallback is fine here: the md5 work dominates and happens in
  * Java either way; what this removes is the 16× Catalyst lambda
  * interpretation and intermediate array materialization.
  */
case class MinHashSigExpr(child: Expression, numPerms: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  @transient private lazy val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val hexChars = "0123456789abcdef".toCharArray

  @transient private lazy val prefixes: Array[UTF8String] =
    Array.tabulate(numPerms)(j => UTF8String.fromString(j.toString + ":"))

  private def md5Hex(bytes: Array[Byte]): String = {
    val md = digest.get()
    md.reset()
    val d = md.digest(bytes)
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexChars((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val minima = new Array[String](numPerms)
    var i = 0
    while (i < n) {
      val shingle = arr.getUTF8String(i)
      var j = 0
      while (j < numPerms) {
        // identical bytes to Spark's md5(concat(cast(j as string), ':', shingle))
        val h = md5Hex(UTF8String.concat(prefixes(j), shingle).getBytes)
        if (minima(j) == null || h.compareTo(minima(j)) < 0) minima(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(minima.map(m =>
      if (m == null) null else UTF8String.fromString(m)))
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object MinHashExpr {
  /** Column API: minhash signature array (length numPerms) of a
    * string-array column.
    */
  def minhashSig(shingles: Column, numPerms: Int): Column =
    ColumnBridge.column(MinHashSigExpr(ColumnBridge.expression(shingles), numPerms))
}
