package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native MinHash signature over an `array<long>` of shingle hashes.
  *
  * The composable form is K=16 independent
  * `array_min(transform(shs, h => (A_k * pmod(h, 2^32) + B_k) % P))`
  * columns — 16 traversals of the shingle array per row, each
  * allocating a transformed copy through higher-order-function
  * plumbing. This expression is ONE fused loop: each element's
  * `pmod` is computed once and fed to all 16 hash families, the 16
  * running minima live in registers/locals, and no intermediate
  * array is ever materialized. Bit-identical to the composed form
  * on every non-null array (same truncating `%`, same null-element
  * semantics: null elements are skipped by the min exactly as
  * `array_min` skips them; an array with no non-null elements
  * yields null signature slots). ONE intentional divergence: a NULL
  * input array yields a NULL signature here, where the composed
  * `array(array_min(transform(null, …)), …)` yields an array of 16
  * nulls — the strict form is the sane one, and no operator can
  * reach it (every caller filters to ≥3 tokens first); the
  * equivalence spec pins both behaviors.
  *
  * MinHash banding (dd03 and the whole dd family) signs every doc in
  * the corpus — at 100 TB this projection IS the dedup scan cost.
  */
case class MinhashSigExpr(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  // analysis-time type gate: a non-array<long> child fails with a
  // clear error instead of an execution-time ClassCastException
  // (return type inferred — AbstractDataType is private[sql])
  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nodeName: String = "graft_minhash_sig"
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    MinhashSigExpr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.MinhashSigExpr.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): MinhashSigExpr =
    copy(child = newChild)
}

object MinhashSigExpr {
  import Hashing.{MinhashA, MinhashB, MinhashK, MinhashP}

  private val As: Array[Long] = MinhashA.toArray
  private val Bs: Array[Long] = MinhashB.toArray

  /** One pass over the shingle array, all K minima at once. */
  def compute(shs: ArrayData): ArrayData = {
    val n = shs.numElements()
    val mins = new Array[Long](MinhashK)
    val seen = new Array[Boolean](MinhashK)
    var i = 0
    while (i < n) {
      if (!shs.isNullAt(i)) {
        val hm = java.lang.Math.floorMod(shs.getLong(i), 4294967296L)
        var k = 0
        while (k < MinhashK) {
          val v = (As(k) * hm + Bs(k)) % MinhashP
          if (!seen(k) || v < mins(k)) { mins(k) = v; seen(k) = true }
          k += 1
        }
      }
      i += 1
    }
    val out = new Array[Any](MinhashK)
    var k = 0
    while (k < MinhashK) {
      out(k) = if (seen(k)) java.lang.Long.valueOf(mins(k)) else null
      k += 1
    }
    new GenericArrayData(out)
  }

  def apply(shs: Column): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.column(MinhashSigExpr(bridge.expression(shs)))
  }
}
