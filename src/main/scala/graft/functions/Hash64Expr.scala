package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst twin of [[Hashing.hash64]].
  *
  * `conv(substr(md5(x),1,15),16,10)` materializes a 32-char hex
  * string, substrings it, and re-parses it — three UTF8String
  * allocations per value. This expression computes the same 60-bit
  * value straight from the digest bytes (first 15 hex nibbles = first
  * 8 bytes >>> 4), one digest and zero string round-trips. Registered
  * by [[graft.plans.GraftExtensions]], which also rewrites the
  * composed form to this one wherever it appears in a plan.
  */
case class Hash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nodeName: String = "graft_hash64"

  override def nullSafeEval(input: Any): Any =
    Hash64Expr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hash64Expr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Hash64Expr =
    copy(child = newChild)
}

object Hash64Expr {
  private val digests = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** First 60 bits of md5(utf8 bytes) — equals
    * CAST(conv(substr(md5(x),1,15),16,10) AS BIGINT).
    */
  def compute(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    val hi =
      ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
      ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    hi >>> 4
  }

  def apply(c: Column): Column =
    org.apache.spark.sql.graft.bridge.column(Hash64Expr(org.apache.spark.sql.graft.bridge.expression(c)))
}
