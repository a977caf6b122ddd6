package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-heap top-k aggregator.
  *
  * `ORDER BY x LIMIT k` plans as TakeOrderedAndProject (fine), but
  * top-k PER GROUP via `row_number().over(window)` sorts every
  * partition of every group. This Aggregator keeps an O(k) heap per
  * group: map-side partial aggregation means each executor ships at
  * most k (value, tag) pairs per group — at 100 TB that's the
  * difference between shuffling the fact table and shuffling k rows
  * per key.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private def ord: Ordering[(Double, Long)] = Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long)

  override def zero: Seq[(Double, Long)] = Vector.empty

  private def trim(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
    if (s.size <= k) s else s.sorted(ord.reverse).take(k)

  override def reduce(buf: Seq[(Double, Long)], in: (Double, Long)): Seq[(Double, Long)] =
    if (buf.size < k) buf :+ in
    // fast path once full: most rows lose to the current minimum and
    // are dropped in O(k) without re-sorting
    else if (ord.lteq(in, buf.minBy(identity)(ord))) buf
    else trim(buf :+ in)

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    trim(a ++ b)

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] =
    buf.sorted(ord.reverse)

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] = bufferEncoder
}

object TopK {
  /** Column form: top-k (value, tag) pairs per group, descending. */
  def topk(value: Column, tag: Column, k: Int): Column = {
    import org.apache.spark.sql.functions._
    val agg = udaf(new TopKAggregator(k))
    agg(value, tag)
  }
}
