package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, BinaryType, LongType, StringType}
import graft.functions.{DotExpr, Hash64Expr, IntersectCountExpr}

/** Catalyst extensions: SQL function registration + an optimizer rule
  * that rewrites the portable hash pattern to the native expression.
  *
  * [[graft.functions.Hashing.hash64]] is deliberately written in
  * portable built-ins (`cast(conv(substr(md5(x),1,15),16,10) as
  * bigint)`) so the DuckDB oracle can mirror it. [[NativeHashRewrite]]
  * recognizes exactly that tree and swaps in [[Hash64Expr]] — the
  * declarative form stays the source of truth, the optimizer picks
  * the fast physical form, Catalyst-style.
  *
  * Wire up with `SparkSession.builder().withExtensions(new
  * GraftExtensions)` or config
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_hash64"),
      new ExpressionInfo(classOf[Hash64Expr].getName, "graft_hash64"),
      (exprs: Seq[Expression]) => Hash64Expr(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotExpr].getName, "graft_dot"),
      (exprs: Seq[Expression]) => DotExpr(exprs.head, exprs(1))))
    e.injectOptimizerRule(_ => NativeHashRewrite)
    e.injectOptimizerRule(_ => IntersectCountRewrite)
    e.injectPlannerStrategy(_ => AsOfStrategy)
  }
}

/** `size(array_intersect(a, b))` over `array<long>` →
  * [[IntersectCountExpr]] (cast back to int — Size's type).
  *
  * The engine's own operators call the kernel explicitly; this rule
  * gives USER queries written in portable built-ins the same fused
  * primitive loop — the intersection array is never materialized when
  * only its cardinality is consumed. Long element type only: that is
  * the proven-equivalent domain (hash arrays), and non-null elements
  * are the library's construction (the kernel ignores null slots,
  * matching array_intersect on such inputs).
  */
object IntersectCountRewrite extends Rule[LogicalPlan] {
  private def longNoNulls(e: Expression): Boolean = e.dataType match {
    // containsNull must be provably false: ArrayData.toLongArray
    // rejects null slots, so the rewrite stays conservative
    case ArrayType(LongType, false) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(ArrayIntersect(a, b), _) if longNoNulls(a) && longNoNulls(b) =>
        Cast(IntersectCountExpr(a, b), org.apache.spark.sql.types.IntegerType)
    }
}

/** `cast(conv(substr(md5(s),1,15),16,10) as bigint)` → `Hash64Expr(s)`. */
object NativeHashRewrite extends Rule[LogicalPlan] {
  private object PortableHash64 {
    def unapply(e: Expression): Option[Expression] = e match {
      case Cast(
          Conv(
            Substring(Md5(inner), Literal(1, _), Literal(15, _)),
            Literal(16, _), Literal(10, _), _),
          LongType, _, _) =>
        inner match {
          case Cast(s, BinaryType, _, _) if s.dataType == StringType => Some(s)
          case _ => None
        }
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressionsWithPruning(_.containsPattern(
      org.apache.spark.sql.catalyst.trees.TreePattern.CAST)) {
      case PortableHash64(s) => Hash64Expr(s)
    }
}
