package graft.core

import org.apache.spark.sql.DataFrame

/** Parallelism decoupling for compute-bound stages.
  *
  * Parquet splits follow row-group boundaries, so a table written as
  * few large row groups scans as few tasks — and any expensive per-row
  * stage (md5 shingling, JSON parse/render, regex validation) inherits
  * that parallelism ceiling no matter how many cores exist. When the
  * per-row compute cost dominates the cost of moving the rows, a
  * round-robin repartition to the cluster's parallelism is the
  * standard fix: pay one cheap shuffle of the narrow input, run the
  * hot stage on every core. At 100 TB inputs arrive as thousands of
  * splits and this becomes unnecessary — `spark.graft.scatter.partitions=0`
  * disables it without touching operator code.
  */
object Par {

  /** Round-robin repartition to `spark.graft.scatter.partitions`
    * (default: defaultParallelism; `0` disables).
    */
  def scatter(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    val n = s.conf.getOption("spark.graft.scatter.partitions")
      .map(_.toInt).getOrElse(s.sparkContext.defaultParallelism)
    if (n <= 0) df else df.repartition(n)
  }

  /** Keyed scatter: hash-repartition on `keys` to a SIZE-AWARE
    * partition count. Two properties make this the right shape ahead
    * of a groupBy/join whose reduce side is compute-bound
    * (md5/array/dot kernels) but byte-light:
    * (1) a partitioning on a subset of the downstream grouping/join
    * keys satisfies its required distribution, so this REPLACES the
    * exchange the operator would have planned — same shuffle count;
    * (2) an explicit user partition count is exempt from AQE partition
    * coalescing, which sizes partitions by BYTES and would otherwise
    * fold a 2 MB / 2-CPU-seconds stage onto one task (measured: dd08
    * 3.8 s → 2.2 s, dd15 3.5 s → 2.1 s at sf0.1 from exactly this).
    *
    * Why size-aware and not defaultParallelism like [[scatter]]
    * (VERDICT r13 #4): the r13 unconditional fan-out pinned 32-task
    * exchanges onto byte-tiny frames, and the driver's 32-core lap
    * measured dd08 ANTI-scaling — 9.5 s at 32 cores vs 2.25 s at 8
    * cores for the same 32 partitions — i.e. 32 CONCURRENT sub-100 ms
    * tasks cost more in scheduling/contention than their compute.
    * The scatterBy sites all feed LINEAR per-row kernels, so the
    * right parallelism is proportional to data size: partitions =
    * clamp(leafInputBytes / targetBytes, 1, defaultParallelism),
    * where leafInputBytes is the sum of the frame's source-relation
    * sizes (file-relation statistics — truthful, unlike post-join
    * estimates). With the default 256 KB target a 3 MB sf0.1 corpus
    * scatters ~12 ways; a 10x ladder rung (or any production input)
    * saturates defaultParallelism, so the dial vanishes exactly where
    * AQE would stop coalescing anyway — scale-adaptive, not a
    * local-mode constant. [[scatter]] (round-robin) deliberately keeps
    * the unconditional fan-out: its sites (ss37/q60 BNLJ, ev72
    * from_json) do SUPERLINEAR or heavyweight per-row work where even
    * a tiny frame saturates every core with real compute — the
    * driver's 32-core lap confirmed all three improved while dd08
    * regressed.
    *
    * `spark.graft.scatter.partitions=0` restores the planner-owned
    * exchange without touching operator code; a positive value pins
    * the count for both helpers (ladder/experiment override);
    * `spark.graft.scatter.targetBytes` tunes the density.
    */
  def scatterBy(df: DataFrame, keys: org.apache.spark.sql.Column*): DataFrame = {
    val s = df.sparkSession
    s.conf.getOption("spark.graft.scatter.partitions").map(_.toInt) match {
      case Some(n) if n <= 0 => df
      case Some(n) => df.repartition(n, keys: _*)
      case None =>
        val target = s.conf.getOption("spark.graft.scatter.targetBytes")
          .map(_.toLong).getOrElse(256L * 1024)
        val bytes = leafInputBytes(df)
        val byData = (bytes + target - 1) / math.max(target, 1L)
        val n = math.max(1L, math.min(byData,
          s.sparkContext.defaultParallelism.toLong)).toInt
        df.repartition(n, keys: _*)
    }
  }

  /** Keyed scatter at FULL parallelism — the [[scatterBy]] escape
    * hatch for stages whose per-row kernel is heavy enough that even
    * a byte-tiny frame saturates every core with real compute (dd40's
    * per-pair simhash cap-sweep fold: the size-aware cap measured
    * 2.98 s vs 1.89 s at full fan-out in a same-JVM A/B, the inverse
    * of dd08/dd15). Same AQE-exemption and kill-switch semantics as
    * [[scatterBy]].
    */
  def scatterByDense(df: DataFrame, keys: org.apache.spark.sql.Column*): DataFrame = {
    val s = df.sparkSession
    val n = s.conf.getOption("spark.graft.scatter.partitions")
      .map(_.toInt).getOrElse(s.sparkContext.defaultParallelism)
    if (n <= 0) df else df.repartition(n, keys: _*)
  }

  /** Sum of the frame's leaf-relation size statistics — file sizes
    * for scans, which is the only estimate that stays truthful above
    * joins/explodes (post-join sizeInBytes multiplies). Frames whose
    * lineage reads a source twice (self-joins) count it twice; the
    * dial is log-scale so the 2x does not matter.
    */
  private def leafInputBytes(df: DataFrame): Long = {
    val total = df.queryExecution.analyzed.collectLeaves()
      .map(_.stats.sizeInBytes).sum
    if (total.isValidLong) total.toLong else Long.MaxValue
  }
}
