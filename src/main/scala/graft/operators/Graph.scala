package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-round mass propagation over a bipartite edge list — the
  * Pregel pattern as unrolled equi-join rounds (q56's engine,
  * reusable): rank tables stay entity-sized, every round is one join
  * on an edge endpoint + one aggregate, and the caller owns edge
  * materialization (pass a barriered frame for multi-round use).
  *
  * All arithmetic is integer fixed point (damping in percent,
  * truncating division) so results are deterministic and
  * engine-reproducible — the property every oracle-gated caller
  * relies on.
  */
object Graph {

  /** One damped propagation step across `edges` (cols: `from`, `to`,
    * `w`) from `ranks` (cols: `from`, `rankCol`) with per-source
    * out-weights `outW` (cols: `from`, `out_w`): returns (`to`,
    * `outCol`) where
    * `outCol = base + damp/100 * Σ_from (rank * w div out_w)`.
    */
  def step(edges: DataFrame, ranks: DataFrame, outW: DataFrame,
      from: String, to: String, rankCol: String, outCol: String,
      baseFx: Long, dampPct: Long): DataFrame =
    edges.join(ranks, Seq(from)).join(outW, Seq(from))
      .select(col(to), expr(s"($rankCol * w) div out_w").as("contrib"))
      .groupBy(col(to))
      .agg((lit(baseFx) + expr(s"($dampPct * sum(contrib)) div 100"))
        .as(outCol))

  /** `rounds` full alternations of damped mass propagation over a
    * bipartite graph (`edges` cols: `left`, `right`, `w`), starting
    * from uniform `fx` mass on the left side; returns the right-side
    * ranks (`right`, `rank_fx`) after the final left→right step.
    */
  def propagateBipartite(edges: DataFrame, left: String, right: String,
      rounds: Int, fx: Long, dampPct: Long): DataFrame = {
    require(rounds >= 1, "at least one propagation round")
    val baseFx = (100L - dampPct) * fx / 100L
    val outL = edges.groupBy(col(left)).agg(sum(col("w")).as("out_w"))
    val outR = edges.groupBy(col(right)).agg(sum(col("w")).as("out_w"))
    val r0 = edges.select(col(left)).distinct().withColumn("rank_l", lit(fx))
    def toRight(l: DataFrame): DataFrame =
      step(edges, l, outL, left, right, "rank_l", "rank_r", baseFx, dampPct)
    def toLeft(r: DataFrame): DataFrame =
      step(edges, r, outR, right, left, "rank_r", "rank_l", baseFx, dampPct)
    (1 until rounds).foldLeft(toRight(r0))((r, _) => toRight(toLeft(r)))
      .withColumnRenamed("rank_r", "rank_fx")
  }
}
