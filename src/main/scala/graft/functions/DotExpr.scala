package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native dot product over two `array<double>` columns.
  *
  * The composable form `aggregate(zip_with(a, b, _*_), 0d, _+_)`
  * allocates an intermediate array per row and walks it through
  * higher-order-function plumbing; this expression is a single fused
  * loop (left-to-right accumulation — bit-identical to the composed
  * form and to the DuckDB oracle's list_sum). On the similarity
  * workloads (millions of candidate pairs × 64 dims) the allocation
  * is the dominant cost.
  */
case class DotExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nodeName: String = "graft_dot"

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    DotExpr.compute(x, y) // boxed; null when undefined (see compute)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""java.lang.Double ${ev.value}_boxed = graft.functions.DotExpr.compute($a, $b);
         |if (${ev.value}_boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_boxed.doubleValue(); }
         |""".stripMargin)

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotExpr =
    copy(left = newLeft, right = newRight)
}

object DotExpr {
  /** Null (not a partial sum) on length mismatch or null elements —
    * the same answer the composed `aggregate(zip_with(...))` form
    * gives, so swapping implementations never changes results.
    */
  def compute(x: ArrayData, y: ArrayData): java.lang.Double = {
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  def apply(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.column(DotExpr(bridge.expression(a), bridge.expression(b)))
  }
}
