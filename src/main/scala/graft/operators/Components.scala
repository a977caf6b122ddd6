package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the clustering
  * step that turns near-duplicate candidate PAIRS (dd02/dd03/dd05
  * output) into dedup GROUPS with one keeper each.
  *
  * Algorithm: iterative min-label propagation to a fixpoint. Each
  * round is one shuffle-join (edges ⋈ labels) + one aggregate; the
  * frame is localCheckpoint'ed between rounds so round N's lineage
  * does not replay rounds 1..N-1. Convergence takes O(component
  * diameter) rounds — near-dup graphs are star-like, so 2-4 rounds in
  * practice. The driver-side loop holds only a scalar (the changed
  * count); all data stays distributed. This is the standard Spark CC
  * shape (the large/small-star optimization drops in here if
  * components ever get deep).
  */
object Components {

  /** Drop the cached blocks behind a localCheckpoint'd frame (or a
    * projection of one). Only call once no live frame depends on the
    * checkpoint — local checkpoints truncate lineage, so evicted
    * blocks cannot be recomputed.
    */
  private def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** @param pairs  undirected edges, two long columns
    * @return (node, comp) — comp = min node id reachable. The frame is
    *         backed by the final round's local checkpoint; all
    *         intermediate round checkpoints (and the edge cache) are
    *         unpersisted before returning.
    */
  def connectedComponents(
      pairs: DataFrame, srcCol: String, dstCol: String,
      maxRounds: Int = 30): DataFrame = {
    val edges = pairs.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .unionByName(pairs.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .localCheckpoint()
    var comp = edges.select(col("src").as("node")).distinct()
      .withColumn("comp", col("node"))
      .localCheckpoint()
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds <= maxRounds) {
      if (rounds == maxRounds)
        throw new IllegalStateException(
          s"connectedComponents did not converge in $maxRounds rounds " +
            s"($changed labels still moving) — component diameter exceeds " +
            "maxRounds; raise it or switch to large/small-star rounds")
      val nbr = edges.join(comp, edges("dst") === comp("node"))
        .groupBy(col("src")).agg(min(col("comp")).as("nbr_comp"))
      val next = comp.join(nbr, comp("node") === nbr("src"), "left")
        .select(comp("node").as("node"),
          least(comp("comp"), coalesce(col("nbr_comp"), comp("comp"))).as("new_comp"),
          comp("comp").as("old_comp"))
        .localCheckpoint()
      changed = next.filter(col("new_comp") < col("old_comp")).count()
      // next is fully materialized (eager checkpoint) — the previous
      // round's blocks are dead; without this, one RDD leaks per round
      // for the life of the session
      release(comp)
      comp = next.select(col("node"), col("new_comp").as("comp"))
      rounds += 1
    }
    release(edges)
    comp
  }
}
