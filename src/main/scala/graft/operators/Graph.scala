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

  /** One damped propagation step across `edgesW` (cols: `from`, `to`,
    * `w`, `out_w` — the per-source out-weight ATTACHED to the edge
    * row) from `ranks` (cols: `from`, `rankCol`): returns (`to`,
    * `outCol`) where
    * `outCol = base + damp/100 * Σ_from (rank * w div out_w)`.
    */
  def step(edgesW: DataFrame, ranks: DataFrame,
      from: String, to: String, rankCol: String, outCol: String,
      baseFx: Long, dampPct: Long): DataFrame =
    edgesW.join(ranks, Seq(from))
      .select(col(to), expr(s"($rankCol * w) div out_w").as("contrib"))
      .groupBy(col(to))
      .agg((lit(baseFx) + expr(s"($dampPct * sum(contrib)) div 100"))
        .as(outCol))

  /** `rounds` full alternations of damped mass propagation over a
    * bipartite graph (`edges` cols: `left`, `right`, `w`), starting
    * from uniform `fx` mass on the left side; returns the right-side
    * ranks (`right`, `rank_fx`) after the final left→right step.
    *
    * r14 round shape (guide §2.4, §3.1): the r13 step joined edges ⋈
    * ranks ⋈ out-weights per round — and because rank tables are agg
    * outputs whose size Catalyst cannot estimate, every round planned
    * as TWO SortMergeJoins with a fresh exchange + sort of the
    * fact-sized edge table (q56's census: five 1.3-2.5 s stages, all
    * edge re-sorts). Out-weights are round-INVARIANT, so they attach
    * to the edge rows once per direction, and each direction's edge
    * table is hash-partitioned + sorted by its join key before
    * caching (Par.scatterBy sizing) — every round's join then reuses
    * the cached layout and only the entity-sized rank table moves.
    * This is the scale-correct shape: at 100 TB the rank side (one
    * row per customer/supplier) may be too big to broadcast, and the
    * thing that must NOT re-shuffle per round is the fact-sized edge
    * table.
    */
  def propagateBipartite(edges: DataFrame, left: String, right: String,
      rounds: Int, fx: Long, dampPct: Long): DataFrame = {
    require(rounds >= 1, "at least one propagation round")
    val baseFx = (100L - dampPct) * fx / 100L
    val outL = edges.groupBy(col(left)).agg(sum(col("w")).as("out_w"))
    val outR = edges.groupBy(col(right)).agg(sum(col("w")).as("out_w"))
    def keyed(out: DataFrame, key: String): DataFrame =
      Dedup.barrierAlso(
        graft.core.Par.scatterBy(edges.join(out, Seq(key)), col(key))
          .sortWithinPartitions(col(key)))
    val edgesL = keyed(outL, left)
    val edgesR = keyed(outR, right)
    val r0 = edges.select(col(left)).distinct().withColumn("rank_l", lit(fx))
    def toRight(l: DataFrame): DataFrame =
      step(edgesL, l, left, right, "rank_l", "rank_r", baseFx, dampPct)
    def toLeft(r: DataFrame): DataFrame =
      step(edgesR, r, right, left, "rank_r", "rank_l", baseFx, dampPct)
    (1 until rounds).foldLeft(toRight(r0))((r, _) => toRight(toLeft(r)))
      .withColumnRenamed("rank_r", "rank_fx")
  }
}
