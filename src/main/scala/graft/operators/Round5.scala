package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.Det

/** Round-5 additions: the reference's degraded-mode enrichment
  * semantics under the oracle gate.
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
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
}
