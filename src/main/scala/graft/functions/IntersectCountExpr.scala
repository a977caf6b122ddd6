package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** `size(array_intersect(a, b))` for two `array<long>` columns as one
  * fused primitive kernel.
  *
  * The composable form materializes the intersection ARRAY per pair
  * (generic ArrayData machinery + an output allocation) only to take
  * its size. The dedup verify arms (dd02/dd08/dd15-family exact
  * Jaccard/containment over hashed shingle sets) evaluate this on
  * every candidate pair — the hottest inner loop in the engine. This
  * kernel copies both sides into primitive long[]s, sorts, and
  * merge-counts DISTINCT common values (array_intersect's multiset
  * semantics) — zero boxing, zero output allocation, and the sort is
  * cheap at shingle-set sizes. Inputs need NOT be pre-sorted.
  *
  * Null semantics: null array → null result; null ELEMENTS are not
  * expected (hash arrays are non-null by construction) and are
  * ignored by the primitive copy — matching array_intersect on the
  * engine's actual inputs, asserted by the randomized spec.
  */
case class IntersectCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nodeName: String = "graft_intersect_count"
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(a: Any, b: Any): Any =
    IntersectCountExpr.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.IntersectCountExpr.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectCountExpr =
    copy(left = newLeft, right = newRight)
}

object IntersectCountExpr {

  def compute(a: ArrayData, b: ArrayData): Long = {
    val x = a.toLongArray()
    val y = b.toLongArray()
    java.util.Arrays.sort(x)
    java.util.Arrays.sort(y)
    var i = 0; var j = 0; var n = 0L
    while (i < x.length && j < y.length) {
      val xi = x(i); val yj = y(j)
      if (xi < yj) i += 1
      else if (xi > yj) j += 1
      else {
        n += 1
        // distinct semantics: skip duplicate runs on both sides
        while (i < x.length && x(i) == xi) i += 1
        while (j < y.length && y(j) == yj) j += 1
      }
    }
    n
  }

  def apply(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.bridge.column(IntersectCountExpr(
      org.apache.spark.sql.graft.bridge.expression(a),
      org.apache.spark.sql.graft.bridge.expression(b)))
}
