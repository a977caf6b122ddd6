package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Hashing

/** Reusable sublinear summaries (q55/q61's engines): a count-min
  * sketch and a KMV (bottom-k) distinct sketch, both built on the
  * DuckDB-reproducible [[Hashing.hash64]] so callers can oracle-gate
  * them exactly. Both fold arbitrary input to bounded tables —
  * memory is d·w counters / k hashes whatever the input size.
  */
object Sketch {

  /** The d (seed, bucket) rows for one key column, explodable. */
  def cmsRows(key: Column, d: Int, w: Long): Column =
    array((0 until d).map(sd => struct(
      lit(sd).as("seed"),
      pmod(Hashing.hash64Seeded(key, sd), lit(w)).as("bucket"))): _*)

  /** Build a d×w count-min sketch from per-key weights: input
    * (`key` string column, `weight` long column) → (seed, bucket,
    * counter), at most d·w rows. Callers fold the fact table to
    * per-key counts FIRST (one shuffle) — the sketch then builds
    * from the vocab-sized table.
    */
  def countMin(keyed: DataFrame, key: Column, weight: Column,
      d: Int, w: Long): DataFrame =
    keyed.select(weight.as("_w"), explode(cmsRows(key, d, w)).as("sb"))
      .groupBy(col("sb.seed").as("seed"), col("sb.bucket").as("bucket"))
      .agg(sum(col("_w")).cast("long").as("counter"))

  /** Point-estimate keys against a sketch: returns `probe` plus an
    * `est` column = min over the d counters (never undercounts).
    * The sketch side is broadcast (d·w rows).
    *
    * LEFT join + coalesce-to-0 (ADVICE r6): a probe key hashing to a
    * (seed, bucket) with no build-side mass has a true CMS counter of
    * 0 — an inner join would silently take the min over fewer than d
    * counters (or drop the key entirely), inflating estimates for
    * keys outside the build set.
    */
  def cmsEstimate(sketch: DataFrame, probe: DataFrame, key: Column,
      d: Int, w: Long): DataFrame = {
    val exploded = probe.withColumn("_sb", explode(cmsRows(key, d, w)))
    exploded.join(broadcast(sketch),
        col("_sb.seed") === sketch("seed") &&
          col("_sb.bucket") === sketch("bucket"), "left")
      .withColumn("_counter", coalesce(col("counter"), lit(0L)))
      .groupBy(probe.columns.map(col): _*)
      .agg(min(col("_counter")).cast("long").as("est"))
  }

  /** KMV distinct-count estimate per group: `df` must carry distinct
    * (group, hash) rows with the hash from [[Hashing.hash64]];
    * returns (groups..., h_k, n_kept, est). Bottom-k selection runs
    * through the salted [[Rank.topKByKey]] (no whole-group sort);
    * the estimate divides in the 2^30 domain (see q61) so the
    * arithmetic never overflows and both engines agree exactly.
    */
  def kmvDistinct(hashed: DataFrame, groups: Seq[Column], h: Column,
      k: Int): DataFrame = {
    val halfSpace = 1L << 30
    Rank.topKByKey(hashed, groups, Seq(h.asc), k, saltOn = h)
      .groupBy(groups: _*)
      .agg(max(h).as("h_k"), count(lit(1)).cast("long").as("n_kept"))
      .withColumn("est",
        when(col("n_kept") < k, col("n_kept"))
          .otherwise(expr(
            s"${(k - 1).toLong * halfSpace} div greatest(h_k div $halfSpace, 1)"))
          .cast("long"))
  }

  /** HyperLogLog geometry shared with [[hllDistinct]] and the q13
    * oracle: m = 2^9 registers over the 60-bit [[Hashing.hash64]]
    * space — the low 9 bits pick the register, the remaining 51-bit
    * window w gives rank = 52 − bitlen(w) (52 when w = 0, i.e. the
    * window is all zeros). HllAlphaFx is the standard bias constant
    * α_m = 0.7213/(1 + 1.079/m) at 10^6 fixed point; HllNum is the
    * exact integer numerator α_fx·m²·2^52 of the scaled estimate.
    */
  val HllM = 512
  val HllRMax = 52
  val HllAlphaFx = 719783L
  val HllNum: BigInt = (BigInt(HllAlphaFx) * HllM * HllM) << HllRMax

  /** HyperLogLog distinct-count estimate per group (Flajolet et al.
    * 2007), computed as a RELATIONAL plan on the DuckDB-reproducible
    * [[Hashing.hash64]] so the whole sketch — registers, harmonic
    * sum, estimate — oracle-gates bit-for-bit (Spark's native
    * `approx_count_distinct` HLL++ can only be rows-checked across
    * engines). Same 100 TB shape as the native sketch: one partial-
    * aggregating shuffle folds arbitrary input to ≤ m register rows
    * per group, then a bounded per-group fold; nothing downstream
    * sees more than m rows per group.
    *
    * Exactness across engines: the harmonic sum runs SCALED as
    * S = Σ_j 2^(52−M_j) over all m registers (empty register ⇒
    * M_j = 0 ⇒ term 2^52), so S ≤ m·2^52 = 2^61 — exact BIGINT on
    * both engines; the estimate α_m·m²·2^52/S is [[HllNum]] div S
    * div 10^6 through DECIMAL(38,0)/HUGEINT. Raw estimator only —
    * the small-range linear-counting branch needs ln(), whose
    * cross-engine bit-parity is not established; callers wanting
    * low-range truth keep the exact distinct alongside (q13 does)
    * and the estimate is within ±1.04/√m std error once
    * n ≳ 2m (HllSketchSpec pins the calibration point).
    *
    * `hashed` carries (group, hash) rows with the hash from
    * [[Hashing.hash64]] — duplicates are harmless (register update
    * is max, which is idempotent), pre-distincting just cuts shuffle
    * volume; returns (groups..., n_buckets, est).
    */
  def hllDistinct(hashed: DataFrame, groups: Seq[Column], h: Column): DataFrame =
    hashed
      .withColumn("_h", h)
      .withColumn("_wnd", expr(s"_h div $HllM"))
      .withColumn("_rnk", when(col("_wnd") === 0, lit(HllRMax))
        .otherwise(lit(HllRMax) - length(bin(col("_wnd")))))
      .groupBy(groups :+ (col("_h") % HllM).as("_bucket"): _*)
      .agg(max(col("_rnk")).as("_mj"))
      .groupBy(groups: _*)
      .agg(
        (sum(expr(s"shiftleft(CAST(1 AS BIGINT), $HllRMax - _mj)")).cast("long")
          + (lit(HllM.toLong) - count(lit(1))) * lit(1L << HllRMax)).as("_s"),
        count(lit(1)).cast("long").as("n_buckets"))
      .withColumn("est",
        expr(s"(CAST('$HllNum' AS DECIMAL(38,0)) div _s) div 1000000").cast("long"))
      .drop("_s")
}
