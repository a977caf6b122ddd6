package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.types.PhysicalDataType
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** AS-OF join as a first-class operator: LogicalPlan + Strategy +
  * physical merge exec (the (c) tier of the extension ladder, for
  * when composition isn't wanted).
  *
  * Semantics: for every left row, attach the latest right row with
  * `right.ts <= left.ts` within the same key (null when none) — the
  * reference's metadata-at-block-height lookup as one operator.
  *
  * Physical contract: both children cluster-distributed on the key
  * and sorted (key, ts) — EnsureRequirements inserts exactly one
  * shuffle + sort per side — then each partition pair streams through
  * a single forward merge with O(1) carried state: no pair explosion,
  * no per-key buffering, the plan shape you want at 100 TB.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTs: Attribute, rightTs: Attribute,
    rightValues: Seq[Attribute],
    outAttrs: Seq[Attribute]) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ outAttrs
  override def producedAttributes: AttributeSet = AttributeSet(outAttrs)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lts, rts, rv, out) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, rv, out) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTs: Attribute, rightTs: Attribute,
    rightValues: Seq[Attribute],
    outAttrs: Seq[Attribute]) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ outAttrs
  override def producedAttributes: AttributeSet = AttributeSet(outAttrs)

  override def requiredChildDistribution: Seq[Distribution] = Seq(
    ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val keyOrd = PhysicalDataType.ordering(leftKey.dataType)
      .asInstanceOf[Ordering[Any]]
    val tsOrd = PhysicalDataType.ordering(leftTs.dataType)
      .asInstanceOf[Ordering[Any]]
    val lKeyIdx = left.output.indexOf(leftKey)
    val lTsIdx = left.output.indexOf(leftTs)
    val rKeyIdx = right.output.indexOf(rightKey)
    val rTsIdx = right.output.indexOf(rightTs)
    val keyType = leftKey.dataType
    val tsType = leftTs.dataType
    val valueProjExprs = rightValues
    val rightOut = right.output
    val nValues = rightValues.size

    val outSchema = output
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val valueProj = UnsafeProjection.create(valueProjExprs, rightOut)
      val outProj = UnsafeProjection.create(outSchema, outSchema)
      val nullRow = new GenericInternalRow(nValues)
      val joiner = new JoinedRow
      val rBuf = rIt.buffered
      var carriedKey: Any = null
      var carriedValues: InternalRow = nullRow

      lIt.map { lRow =>
        val lKey = lRow.get(lKeyIdx, keyType)
        val lTs = lRow.get(lTsIdx, tsType)
        // SQL join semantics: a null key matches nothing. Null-key
        // right rows sort first (nulls-first) and are skipped; a
        // null-key left row takes the null values without moving the
        // cursor.
        if (lKey == null) {
          outProj(joiner(lRow, nullRow))
        } else {
          // advance the right side through every row usable by this
          // left row (null/lesser key just moves the cursor; equal key
          // with r.ts <= l.ts updates the carried value)
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val rRow = rBuf.head
            val rKey = rRow.get(rKeyIdx, keyType)
            val cmp = if (rKey == null) -1 else keyOrd.compare(rKey, lKey)
            if (cmp < 0) { rBuf.next(); advancing = true }
            else if (cmp == 0 && tsOrd.compare(rRow.get(rTsIdx, tsType), lTs) <= 0) {
              // the sorted right iterator reuses UnsafeRow buffers, so
              // both the carried key and values must be deep-copied
              carriedKey = InternalRow.copyValue(rKey)
              carriedValues = valueProj(rRow).copy()
              rBuf.next()
            } else advancing = false
          }
          val values =
            if (carriedKey != null && keyOrd.compare(carriedKey, lKey) == 0) carriedValues
            else nullRow
          outProj(joiner(lRow, values))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
