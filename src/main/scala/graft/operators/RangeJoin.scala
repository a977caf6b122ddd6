package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join: left points joined to right intervals with
  * `start <= ts <= end`.
  *
  * Spark plans a raw non-equi condition as BroadcastNestedLoopJoin —
  * O(n·m) compares, unusable at scale. The standard fix is binning:
  * bucket points by `floor(ts/bin)`, explode each interval over every
  * bin it overlaps, equi-join on the bin, then re-check the exact
  * predicate. One shuffle on the bin key, compares limited to
  * co-binned pairs. Pick `binSec` near the typical interval length:
  * too small explodes interval replication, too large re-widens the
  * per-bin cross product.
  */
object RangeJoin {

  /** @param left     point side, `tsCol` a timestamp column
    * @param right    interval side with `startCol`/`endCol` timestamps
    * @param binSec   bin width in seconds
    * @param keys     extra equi-join keys (present on both sides) —
    *                 keyed interval joins shuffle on (keys, bin), so
    *                 co-keyed rows land together and cross-key pairs
    *                 are never materialized
    */
  def binned(
      left: DataFrame, right: DataFrame,
      tsCol: String, startCol: String, endCol: String,
      binSec: Long, keys: Seq[String] = Nil): DataFrame = {
    val l = left.withColumn("__bin", floor(col(tsCol).cast("long") / binSec))
    val r = right.withColumn("__bin",
      explode(sequence(
        floor(col(startCol).cast("long") / binSec),
        floor(col(endCol).cast("long") / binSec))))
    l.join(r, keys :+ "__bin")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__bin")
  }
}
