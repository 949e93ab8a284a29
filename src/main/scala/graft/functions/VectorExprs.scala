package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector-math hot path.
  *
  * Spark's higher-order functions (`zip_with` + `aggregate`) are
  * CodegenFallback — every element goes through interpreted lambda
  * dispatch and an intermediate array is materialized per row. These
  * expressions generate a tight Java loop inside whole-stage codegen
  * instead (no allocation, no virtual calls), which is what a
  * billion-row ANN scan needs.
  *
  * Numeric contract: identical to the HOF formulation in
  * [[VectorFunctions]] — elementwise float→double (exact), sequential
  * left-to-right double accumulation starting at 0.0 — so results are
  * bitwise equal and the DuckDB oracle mirrors stay valid
  * (VectorExprsSpec asserts this).
  */
object VectorExprs {

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(s"expected float/double array, got $t")
  }

  abstract class VecFold extends BinaryExpression {
    override def dataType: DataType = DoubleType
    // the fold returns null on length mismatch even for non-nullable
    // children — without this override codegen would emit an assignment
    // to a FalseLiteral isNull and fail to compile
    override def nullable: Boolean = true
    /** Java expression for the per-element contribution, given element
      * accessor snippets `xi` and `yi` (already double).
      */
    protected def termJava(xi: String, yi: String): String
    protected def term(x: Double, y: Double): Double

    // element accessors are chosen per side: mixed float/double pairs
    // (e.g. float corpus vs double k-means centroids) are legal
    @transient private lazy val leftIsF = elemIsFloat(left)
    @transient private lazy val rightIsF = elemIsFloat(right)

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      // zip_with pads the shorter side with null -> the HOF fold (and the
      // DuckDB mirror) yield NULL on length mismatch; match that.
      if (x.numElements() != y.numElements()) return null
      val n = x.numElements()
      var acc = 0.0
      var i = 0
      while (i < n) {
        // a null element makes the HOF term null and null poisons the
        // double fold -> overall NULL; match that (parquet arrays are
        // containsNull=true even when no nulls occur in the data)
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        val xi = if (leftIsF) x.getFloat(i).toDouble else x.getDouble(i)
        val yi = if (rightIsF) y.getFloat(i).toDouble else y.getDouble(i)
        acc += term(xi, yi)
        i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val getL = if (elemIsFloat(left)) "getFloat" else "getDouble"
        val getR = if (elemIsFloat(right)) "getFloat" else "getDouble"
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        // null-element check mirrors nullSafeEval; skipped entirely when
        // the schema proves containsNull=false (keeps the hot loop tight)
        val mayHaveNulls =
          left.dataType.asInstanceOf[ArrayType].containsNull ||
            right.dataType.asInstanceOf[ArrayType].containsNull
        val nullCheck =
          if (mayHaveNulls)
            s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
          else ""
        s"""
           |if ($a.numElements() != $b.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  int $n = $a.numElements();
           |  double $acc = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    $nullCheck
           |    $acc += ${termJava(s"((double)$a.$getL($i))", s"((double)$b.$getR($i))")};
           |  }
           |  if (!${ev.isNull}) { ${ev.value} = $acc; }
           |}
         """.stripMargin
      })
  }

  /** Sequential dot product: ((0 + x1*y1) + x2*y2) + ... */
  case class DotProductExpr(left: Expression, right: Expression) extends VecFold {
    override protected def termJava(xi: String, yi: String): String = s"$xi * $yi"
    override protected def term(x: Double, y: Double): Double = x * y
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Sequential squared euclidean distance. */
  case class Dist2Expr(left: Expression, right: Expression) extends VecFold {
    override protected def termJava(xi: String, yi: String): String =
      s"($xi - $yi) * ($xi - $yi)"
    override protected def term(x: Double, y: Double): Double = (x - y) * (x - y)
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def dist2(a: Column, b: Column): Column =
    ColumnBridge.column(Dist2Expr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
