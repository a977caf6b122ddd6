package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Det

/** Round-4 coverage: evaluation harnesses that keep the approximate
  * scale paths honest. dd13 is the embedding-dedup counterpart of
  * ss08/dd12 — the banded sign-LSH candidate generation that dd05/dd11
  * ship (Dedup.embCandidates) is measured against the exact all-pairs
  * ground truth, so the recall/cost dials of the banding geometry are
  * numbers under the oracle gate, not assumptions.
  */
object Round4 {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- dd13: banded-LSH recall/precision evaluation -----------------
    // Ground truth = ALL within-label pairs at the verify threshold
    // (the one intentionally quadratic arm in the engine — it exists
    // to measure the scale path and runs on eval-sized samples, like
    // ss08's brute-force arm). Candidates/hits come from the SAME
    // helpers dd05/dd11 execute, so the measured recall is the
    // shipped construction's recall, not a reimplementation's.
    "dd13_lsh_recall" -> { (s, d) =>
      val e = Dedup.embBase(s, d)
      val a = e.select(col("label"), col("vec_id").as("vec_a"),
        col("emb").as("emb_a"), col("norm").as("norm_a"))
      val b = e.select(col("label"), col("vec_id").as("vec_b"),
        col("emb").as("emb_b"), col("norm").as("norm_b"))
      val truth = a.join(b, Seq("label"))
        .filter(col("vec_a") < col("vec_b"))
        .filter(Det.trunc4(Similarity.dot(col("emb_a"), col("emb_b")) /
          (col("norm_a") * col("norm_b"))) >= Dedup.EmbThreshold)
        .select(col("vec_a"), col("vec_b"))
      val cand = Dedup.embCandidates(s, d)
      val hits = Dedup.scoreCandidates(s, d, cand)
        .filter(col("cos_sim") >= Dedup.EmbThreshold)
        .select(col("vec_a"), col("vec_b"), lit(1).as("hit"))
      truth.join(hits, Seq("vec_a", "vec_b"), "left")
        .agg(count(lit(1)).as("n_truth"),
          sum(coalesce(col("hit"), lit(0))).as("n_hit"))
        .crossJoin(cand.agg(count(lit(1)).as("n_cand")))
        .select(col("n_truth"), col("n_cand"), col("n_hit"),
          Det.trunc4(col("n_hit").cast("double") / col("n_truth")).as("recall"),
          Det.trunc4(col("n_hit").cast("double") / col("n_cand")).as("verify_rate"))
    }
  )

  def oracles: Map[String, String] = Map(
    "dd13_lsh_recall" -> {
      val cosAB = "floor((list_sum(list_transform(range(len(a.emb))," +
        " i -> a.emb[i+1] * b.emb[i+1])) / (a.norm * b.norm)) * 10000) / 10000"
      s"""WITH e AS (
         |  ${Dedup.duckEmbE}),
         |bands AS (
         |  ${Dedup.duckEmbBands}),
         |cand AS (
         |  ${Dedup.duckEmbCand}),
         |truth AS (
         |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
         |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
         |  WHERE $cosAB >= ${Dedup.EmbThreshold}),
         |hits AS (
         |  SELECT c.vec_a, c.vec_b
         |  FROM cand c JOIN e ea ON c.vec_a = ea.vec_id
         |              JOIN e eb ON c.vec_b = eb.vec_id
         |  WHERE ${Dedup.duckEmbCos} >= ${Dedup.EmbThreshold}),
         |t AS (
         |  SELECT COUNT(*) AS n_truth,
         |    CAST(SUM(CASE WHEN h.vec_a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
         |  FROM truth LEFT JOIN hits h
         |    ON truth.vec_a = h.vec_a AND truth.vec_b = h.vec_b),
         |c AS (SELECT COUNT(*) AS n_cand FROM cand)
         |SELECT n_truth, n_cand, n_hit,
         |  ${Det.duckTrunc("CAST(n_hit AS DOUBLE) / n_truth", 4)} AS recall,
         |  ${Det.duckTrunc("CAST(n_hit AS DOUBLE) / n_cand", 4)} AS verify_rate
         |FROM t, c""".stripMargin
    }
  )
}
