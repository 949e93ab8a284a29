package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native array-combinatorics expressions for the basket-mining hot
  * path. The in-basket pair fan-out was written as
  * `transform(parts, (a, i) => transform(slice(parts, i+2, n), b =>
  * struct(a, b)))` + flatten — higher-order functions whose lambdas
  * evaluate INTERPRETED per produced pair, with a slice allocation per
  * outer element (the same disease the r8 real-document A/B exposed in
  * `gramsAll`: construction, not the downstream fold, is the scan
  * cost). [[OrderedPairsExpr]] emits the identical pair array in one
  * native loop.
  */
object ArrayExprs {

  private val pairType = StructType(Seq(
    StructField("pa", LongType, nullable = false),
    StructField("pb", LongType, nullable = false)))

  /** All ordered index pairs (i < j) of a long array, as
    * struct(pa = xs[i], pb = xs[j]) in (i, j) lexicographic order —
    * exactly the flattened nested-transform formulation (on a sorted
    * distinct array this is the pa < pb co-occurrence pair set). Static
    * entry point shared by eval and generated code.
    */
  def orderedPairsArr(xs: ArrayData): ArrayData = {
    val n = xs.numElements()
    // pair count in Long: at n ≥ 65536 the Int product n*(n-1)/2
    // overflows to a negative/truncated size (ADVICE r8) — baskets that
    // large should be capped/salted upstream, so fail loudly, not wrap
    val mL = if (n < 2) 0L else n.toLong * (n - 1) / 2
    if (mL > Int.MaxValue)
      throw new IllegalArgumentException(
        s"orderedPairs: $n elements produce $mL pairs (> Int.MaxValue); " +
          "cap or salt baskets this large before the pair fan-out")
    val m = mL.toInt
    val out = new Array[Any](m)
    var k = 0
    var i = 0
    while (i < n) {
      val a = xs.getLong(i)
      var j = i + 1
      while (j < n) {
        out(k) = InternalRow(a, xs.getLong(j))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  case class OrderedPairsExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(pairType, containsNull = false)

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(LongType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"orderedPairs expects array<bigint>, got $t")
      }

    override def nullSafeEval(input: Any): Any =
      orderedPairsArr(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.ArrayExprs.orderedPairsArr($c);")

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def orderedPairs(xs: Column): Column =
    ColumnBridge.column(OrderedPairsExpr(ColumnBridge.expression(xs)))

  /** Merge-count of the intersection of two SORTED distinct long
    * arrays — the per-pair verify kernel of the containment dedup.
    * `array_intersect` on string arrays builds a hash set and an output
    * array per pair; at 9.9M candidate pairs (sf3) the construction and
    * the string payload dominated the query. The sorted-long merge
    * allocates nothing and compares 8-byte primitives. Static entry
    * point shared by eval and generated code.
    */
  def sortedIntersectCountArr(a: ArrayData, b: ArrayData): Long = {
    val (na, nb) = (a.numElements(), b.numElements())
    var i = 0
    var j = 0
    var n = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }

  case class SortedIntersectCountExpr(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    override def dataType: DataType = LongType

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case (l, r) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"sortedIntersectCount expects two array<bigint>, got $l, $r")
      }

    override def nullSafeEval(a: Any, b: Any): Any =
      sortedIntersectCountArr(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.ArrayExprs.sortedIntersectCountArr($a, $b);")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  def sortedIntersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCountExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
