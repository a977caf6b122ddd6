package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.Det

/** Round-5 additions: the reference's degraded-mode enrichment
  * semantics under the oracle gate, plus the two pre-flight audits a
  * 100 TB run needs BEFORE committing to a plan — LSH banding
  * occupancy (the dd07 scale lesson as a measurable harness) and
  * per-key skew (the salted-join decision input).
  */
object Round5 {

  /** ev29: every 4th metadata key "fails its lookup" — the
    * deterministic stand-in for token.rs's RPC failures, so the oracle
    * exercises both sides of the miss split.
    */
  val LookupFailMod = 4

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- ev29: degraded-mode enrichment (lookup miss → defaults) -----
    // token.rs:67-155 get_nft_token/get_metadatas: a metadata lookup
    // that errors or parses to garbage yields Ok(None) — the event is
    // STILL DELIVERED, enriched with the default (empty) metadata
    // shape, never dropped. The scalable re-expression is a LEFT join
    // against the metadata dim with explicit default fill on the null
    // side, plus an enrich_status column so the degraded fraction is
    // observable (the reference logs each fallback;
    // at 100 TB a status column census replaces grep-the-logs).
    // The dim drops every LookupFailMod-th key to make misses
    // deterministic; at scale the dim is whatever metadata service
    // snapshot exists, and the same plan holds — broadcast when small,
    // shuffle join when not.
    "ev29_enrich_fallback" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val dim = Tables.customer(s, d)
        .filter(pmod(col("c_custkey"), lit(LookupFailMod)) =!= 0)
        .select(col("c_custkey"), col("c_mktsegment"))
      ev.join(broadcast(dim), ev("user_id") === dim("c_custkey"), "left")
        .select(
          col("user_id"), col("value"),
          when(col("c_custkey").isNotNull, lit("ok"))
            .otherwise(lit("fallback")).as("enrich_status"),
          coalesce(col("c_mktsegment"), lit("UNKNOWN")).as("segment"))
        .groupBy(col("enrich_status"), col("segment"))
        .agg(
          count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
        .orderBy(col("enrich_status"), col("segment"))
    },

    // --- dd17: LSH banding occupancy audit ---------------------------
    // The dd07 postmortem as a first-class harness: banded-LSH cost is
    // Σ c·(c−1)/2 over bucket occupancies c, so a banding layout is
    // judged by its occupancy profile, not by recall alone (the 6-bit
    // layout this repo replaced was oracle-green AND a 100×-scale
    // killer). Per band: bucket count, max occupancy, and the exact
    // candidate-pair total the downstream self-join will generate.
    // At 100 TB this one cheap aggregate runs BEFORE the pair join
    // and rejects a degenerate layout for the cost of a groupBy.
    "dd17_lsh_occupancy" -> { (s, d) =>
      val banded = Dedup.simhashes(s, d).select(col("doc_id"),
        posexplode(array((0 until Dedup.SimhashBands).map(b =>
          shiftright(col("simhash"), b * Dedup.SimhashBandBits)
            .bitwiseAND(Dedup.SimhashBandMask)): _*)))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bval")
      banded.groupBy(col("band").cast("long").as("band"), col("bval"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("band"))
        .agg(
          count(lit(1)).as("n_buckets"),
          sum(col("c")).as("n_docs"),
          max(col("c")).as("max_occupancy"),
          sum(expr("(c * (c - 1)) div 2")).as("n_cand_pairs"))
        .orderBy(col("band"))
    },

    // --- q37: per-key skew profile -----------------------------------
    // The salting decision input (q27's Skew.saltedJoin picks a salt
    // factor; THIS measures whether one is needed): per event_type,
    // how concentrated are rows on the heaviest keys? Reports the
    // heaviest key's share and the share of the top 1% of keys —
    // straggler predictors for any user_id-keyed shuffle. The window
    // ranks the (type, key) COUNT table, which is keys-sized, not
    // fact-sized; ties rank deterministically (count desc, key asc).
    "q37_key_skew" -> { (s, d) =>
      val perKey = Tables.events(s, d)
        .groupBy(col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("c").desc, col("user_id"))
      perKey
        .withColumn("rk", row_number().over(w))
        // key census per type rides a second window over the same
        // partition (no extra shuffle — same partitioning), so the
        // top-1% cutoff ceil(nk/100) is exact integer arithmetic
        .withColumn("nk",
          count(lit(1)).over(Window.partitionBy(col("event_type"))))
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n_keys"),
          sum(col("c")).as("n_rows"),
          max(col("c")).as("max_rows"),
          sum(when(col("rk") <= greatest(expr("(nk + 99) div 100"), lit(1L)),
            col("c")).otherwise(0L)).as("top1pct_rows"))
        .select(col("event_type"), col("n_keys"), col("n_rows"), col("max_rows"),
          col("top1pct_rows"),
          Det.trunc4(col("max_rows").cast("double") / col("n_rows")).as("max_frac"),
          Det.trunc4(col("top1pct_rows").cast("double") / col("n_rows")).as("top1pct_frac"))
        .orderBy(col("event_type"))
    })

  def oracles: Map[String, String] = Map(
    "ev29_enrich_fallback" ->
      s"""WITH dim AS (
         |  SELECT c_custkey, c_mktsegment FROM customer
         |  WHERE c_custkey % $LookupFailMod <> 0)
         |SELECT
         |  CASE WHEN c_custkey IS NOT NULL THEN 'ok' ELSE 'fallback' END AS enrich_status,
         |  COALESCE(c_mktsegment, 'UNKNOWN') AS segment,
         |  COUNT(*) AS n_events,
         |  COUNT(DISTINCT user_id) AS n_users,
         |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         |FROM events LEFT JOIN dim ON user_id = c_custkey
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "dd17_lsh_occupancy" -> {
      val dd04 = Dedup.oracles("dd04_simhash")
      s"""WITH sims AS ($dd04),
         |banded AS (
         |  SELECT doc_id, b AS band,
         |    (simhash >> (b * ${Dedup.SimhashBandBits})) & ${Dedup.SimhashBandMask} AS bval
         |  FROM sims CROSS JOIN (SELECT unnest(range(${Dedup.SimhashBands})) AS b) t),
         |bk AS (SELECT band, bval, COUNT(*) AS c FROM banded GROUP BY band, bval)
         |SELECT band, COUNT(*) AS n_buckets,
         |  CAST(SUM(c) AS BIGINT) AS n_docs,
         |  CAST(MAX(c) AS BIGINT) AS max_occupancy,
         |  CAST(SUM((c * (c - 1)) // 2) AS BIGINT) AS n_cand_pairs
         |FROM bk GROUP BY band ORDER BY band""".stripMargin
    },

    "q37_key_skew" ->
      s"""WITH pk AS (
         |  SELECT event_type, user_id, COUNT(*) AS c
         |  FROM events GROUP BY event_type, user_id),
         |r AS (
         |  SELECT event_type, c,
         |    ROW_NUMBER() OVER (PARTITION BY event_type
         |                       ORDER BY c DESC, user_id) AS rk,
         |    COUNT(*) OVER (PARTITION BY event_type) AS nk
         |  FROM pk)
         |SELECT event_type, COUNT(*) AS n_keys,
         |  CAST(SUM(c) AS BIGINT) AS n_rows,
         |  CAST(MAX(c) AS BIGINT) AS max_rows,
         |  CAST(SUM(CASE WHEN rk <= GREATEST((nk + 99) // 100, 1)
         |    THEN c ELSE 0 END) AS BIGINT) AS top1pct_rows,
         |  ${Det.duckTrunc("CAST(MAX(c) AS DOUBLE) / SUM(c)", 4)} AS max_frac,
         |  ${Det.duckTrunc(
              "CAST(SUM(CASE WHEN rk <= GREATEST((nk + 99) // 100, 1) " +
              "THEN c ELSE 0 END) AS DOUBLE) / SUM(c)", 4)} AS top1pct_frac
         |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin)
}
