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

    // --- ss11: IVF nprobe-recall curve -------------------------------
    // The eval dial ss03 ships without: IVF recall is a function of
    // how many cells the query probes, and the ss08/dd13 pattern says
    // MEASURE the dial, don't assert it. Per nprobe ∈ {1,2,4}:
    // candidate count and recall@10 of probing the query's nprobe
    // nearest cells, against the brute-force top-10. Everything
    // downstream of the one cross-join-with-broadcast-centroids
    // assignment (ss03's plan) is equi-joins on the cell id; the
    // scored frame is shared by truth and all three probe arms.
    "ss11_ivf_nprobe_eval" -> { (s, d) =>
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
        .withColumn("norm", Similarity.l2norm(col("emb")))
      val cents = e.filter(col("vec_id") < Similarity.IvfK)
        .select(col("vec_id").as("c_id"), col("emb").as("c_emb"),
          col("norm").as("c_norm"))
      val byVec = Window.partitionBy(col("vec_id"))
        .orderBy(col("c_cos").desc, col("c_id"))
      val assigned = Dedup.barrier(e
        .crossJoin(broadcast(cents))
        .withColumn("c_cos", Det.trunc4(
          Similarity.dot(col("emb"), col("c_emb")) / (col("norm") * col("c_norm"))))
        .withColumn("rn", row_number().over(byVec))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("emb"), col("norm"), col("c_id").as("cell")))
      val q = assigned.filter(col("vec_id") === 0)
        .select(col("emb").as("q_emb"), col("norm").as("q_norm"))
      // the query's cell ranking: one tiny frame, K rows
      val qcells = cents.crossJoin(broadcast(q))
        .withColumn("qc_cos", Det.trunc4(
          Similarity.dot(col("c_emb"), col("q_emb")) / (col("c_norm") * col("q_norm"))))
        .withColumn("qrank", row_number().over(
          Window.orderBy(col("qc_cos").desc, col("c_id"))))
        .select(col("c_id").as("cell"), col("qrank"))
      val scored = Dedup.barrierAlso(assigned.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .withColumn("cos_sim", Det.trunc4(
          Similarity.dot(col("emb"), col("q_emb")) / (col("norm") * col("q_norm"))))
        .select(col("vec_id"), col("cell"), col("cos_sim")))
      val truth = scored
        .orderBy(col("cos_sim").desc, col("vec_id")).limit(10)
        .select(col("vec_id"))
      val nprobes = { import s.implicits._; Seq(1, 2, 4).toDF("nprobe") }
      val probed = scored
        .join(broadcast(qcells), Seq("cell"))
        .join(broadcast(nprobes), col("qrank") <= col("nprobe"))
      val byProbe = Window.partitionBy(col("nprobe"))
        .orderBy(col("cos_sim").desc, col("vec_id"))
      val approx = probed
        .withColumn("rk", row_number().over(byProbe))
        .filter(col("rk") <= 10)
        .select(col("nprobe"), col("vec_id"), lit(1).as("hit"))
      val cand = probed.groupBy(col("nprobe")).agg(count(lit(1)).as("n_cand"))
      nprobes.crossJoin(broadcast(truth))
        .join(approx, Seq("nprobe", "vec_id"), "left")
        .groupBy(col("nprobe"))
        .agg(count(lit(1)).as("n_truth"),
          sum(coalesce(col("hit"), lit(0))).as("n_hit"))
        .join(cand, Seq("nprobe"))
        .select(col("nprobe").cast("long").as("nprobe"), col("n_cand"),
          col("n_truth"), col("n_hit"),
          Det.trunc4(col("n_hit").cast("double") / col("n_truth"))
            .as("recall_at_10"))
        .orderBy(col("nprobe"))
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

    "ss11_ivf_nprobe_eval" -> {
      val duckNorm = "sqrt(list_sum(list_transform(emb, x -> x * x)))"
      def cos(a: String, b: String, na: String, nb: String) =
        s"floor((list_sum(list_transform(range(len($a)), i -> $a[i+1] * $b[i+1]))" +
          s" / ($na * $nb)) * 10000) / 10000"
      s"""WITH e AS (
         |  SELECT vec_id, emb, $duckNorm AS norm
         |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)),
         |cents AS (
         |  SELECT vec_id AS c_id, emb AS c_emb, norm AS c_norm FROM e
         |  WHERE vec_id < ${Similarity.IvfK}),
         |assigned AS (
         |  SELECT vec_id, emb, norm, c_id AS cell FROM (
         |    SELECT e.vec_id, e.emb, e.norm, c.c_id,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cos("e.emb", "c.c_emb", "e.norm", "c.c_norm")} DESC,
         |          c.c_id) AS rn
         |    FROM e, cents c) WHERE rn = 1),
         |q AS (SELECT emb AS q_emb, norm AS q_norm FROM e WHERE vec_id = 0),
         |qcells AS (
         |  SELECT c_id AS cell, ROW_NUMBER() OVER (ORDER BY qc_cos DESC, c_id) AS qrank
         |  FROM (SELECT c_id,
         |          ${cos("c_emb", "q_emb", "c_norm", "q_norm")} AS qc_cos
         |        FROM cents, q)),
         |scored AS (
         |  SELECT a.vec_id, a.cell,
         |    ${cos("a.emb", "q_emb", "a.norm", "q_norm")} AS cos_sim
         |  FROM assigned a, q WHERE a.vec_id <> 0),
         |truth AS (SELECT vec_id FROM scored ORDER BY cos_sim DESC, vec_id LIMIT 10),
         |nprobes AS (SELECT unnest([1, 2, 4]) AS nprobe),
         |probed AS (
         |  SELECT np.nprobe, s.vec_id, s.cos_sim
         |  FROM scored s JOIN qcells qc ON s.cell = qc.cell
         |  JOIN nprobes np ON qc.qrank <= np.nprobe),
         |approx AS (
         |  SELECT nprobe, vec_id, 1 AS hit FROM (
         |    SELECT nprobe, vec_id,
         |      ROW_NUMBER() OVER (PARTITION BY nprobe
         |        ORDER BY cos_sim DESC, vec_id) AS rk
         |    FROM probed) WHERE rk <= 10),
         |cand AS (SELECT nprobe, COUNT(*) AS n_cand FROM probed GROUP BY nprobe),
         |rec AS (
         |  SELECT np.nprobe, COUNT(*) AS n_truth,
         |    CAST(SUM(COALESCE(hit, 0)) AS BIGINT) AS n_hit
         |  FROM nprobes np CROSS JOIN truth t
         |  LEFT JOIN approx a ON a.nprobe = np.nprobe AND a.vec_id = t.vec_id
         |  GROUP BY np.nprobe)
         |SELECT CAST(rec.nprobe AS BIGINT) AS nprobe, n_cand, n_truth, n_hit,
         |  ${Det.duckTrunc("CAST(n_hit AS DOUBLE) / n_truth", 4)} AS recall_at_10
         |FROM rec JOIN cand ON rec.nprobe = cand.nprobe
         |ORDER BY nprobe""".stripMargin
    },

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
