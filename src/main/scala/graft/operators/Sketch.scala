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
}
