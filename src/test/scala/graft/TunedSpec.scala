package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Round11, Tuned}

/** The tuned-session layer (VERDICT r11 #1): the choosers' decisions
  * applied, with the two contracts that make applying them safe —
  * gated SFs reproduce the oracle-default dials (tuning is identity
  * on oracle laps), and the measured sf10 ladder censuses reproduce
  * the hand-dialed values that fixed the r10 scale cliffs.
  */
class TunedSpec extends SparkSpec {

  test("gated SF picks reproduce the oracle-default dials (identity on laps)") {
    val p = Tuned.picks(spark, sf)
    // q82: every sf0.001 table is far under 64 MiB, so the slot floor
    // binds and the smallest stop covering it is the 32 every gated
    // lap already runs under
    assert(p.shuffleParts === Round11.PartitionDial.min)
    // dd46: eval-scale candidate mass fits the linear budget at the
    // narrowest stop — the 4-bit oracle geometry
    assert(p.bandBits === Dedup.EmbBandBits)
    // the in-order gated corpus: every type picks the shortest stop
    assert(p.watermarkDelaySByType.nonEmpty)
    assert(p.watermarkDelaySByType.values.toSet === Set(Round11.WatermarkDialS.min))
    assert(p.watermarkDelayS === Round11.WatermarkDialS.min)
    assert(p.watermark === s"${Round11.WatermarkDialS.min} seconds")
    // q81: per-type salts are legal dial stops
    assert(p.saltByType.nonEmpty)
    p.saltByType.values.foreach(s => assert(Round11.SaltDial.contains(s)))
  }

  test("session() applies the picks as confs and leaves gated results intact") {
    val parts0 = spark.conf.get("spark.sql.shuffle.partitions")
    val bits0 = spark.conf.getOption("spark.graft.emb.bandBits")
    try {
      val before = SparkEntry.queries("dd05_embed_cosine")(spark, sf)
        .collect().map(_.toString).sorted.toSeq
      val p = Tuned.session(spark, sf)
      assert(spark.conf.get("spark.sql.shuffle.partitions") ===
        p.shuffleParts.toString)
      assert(spark.conf.get("spark.graft.emb.bandBits") === p.bandBits.toString)
      // the tuned confs must not flip a gated result: at gated SFs the
      // band pick IS the oracle default, so the embedding near-dup
      // census is bit-identical under the tuned session
      val after = SparkEntry.queries("dd05_embed_cosine")(spark, sf)
        .collect().map(_.toString).sorted.toSeq
      assert(after === before)
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", parts0)
      bits0 match {
        case Some(b) => spark.conf.set("spark.graft.emb.bandBits", b)
        case None => spark.conf.unset("spark.graft.emb.bandBits")
      }
    }
  }

  test("sf10 ladder byte census picks the measured-fastest 128 partitions") {
    // the measured 100x census (gates ledger 2026-08-16 04:36): the
    // largest fact table (lineitem) estimated 4.44 GB -> needed
    // ceil(4.44e9 / 64 MiB) = 67 parts over the 32-slot floor ->
    // smallest covering stop 128. Validated by the r12 clean min-of-2
    // A/B: dd33 215.5 s at 128 vs 241.2 s at 192 (same-dial spread
    // ±50% — the pick is at least as fast, never the OOM side)
    import spark.implicits._
    val census = Seq(
      ("lineitem", 60000000L, 4440000000L),
      ("orders", 15000000L, 700000000L),
      ("events", 10000000L, 1500000000L),
      ("documents", 500000L, 300000000L))
      .toDF("tbl", "n_rows", "est_bytes")
    assert(Tuned.pickParts(census) === 128L)
  }

  test("a 10 GiB census picks the ladder's 192-partition dial") {
    // the dial the sf10 OOM fix was run under: ceil(10 GiB / 64 MiB)
    // = 160 needed -> smallest stop covering is 192
    import spark.implicits._
    val census = Seq(("fact", 1L, 10L * 1024 * 1024 * 1024))
      .toDF("tbl", "n_rows", "est_bytes")
    assert(Tuned.pickParts(census) === 192L)
  }

  test("sf10 ladder band census picks the hand-dialed 16 bits") {
    // the live 200k-vector census (gates ledger 2026-08-16 04:36):
    // 4-bit geometry prices 2.006e9 candidate pairs vs the 25.6M
    // linear budget; 16-bit prices 121,794 — the chooser must set
    // what the ladder hand-set
    import spark.implicits._
    val census = Seq(
      (4L, 3200000L, 900000L, 2006000000L),
      (8L, 25000000L, 60000L, 150000000L),
      (16L, 180000000L, 400L, 121794L))
      .toDF("band_bits", "n_buckets", "max_occupancy", "candidate_pairs")
    val n = Seq(200000L).toDF("n_corpus")
    assert(Tuned.pickBits(census, n) === 16)
  }

  test("autoSalt: measured types get their pick, unknown types get 1") {
    import spark.implicits._
    val census = Seq(
      ("click", 1000L, 320000L, 30000L), // hot key needs salting
      ("view", 1000L, 3200L, 5L))        // uniform -> salt 1
      .toDF("event_type", "n_keys", "n_rows", "max_rows")
    val picks = Tuned.Picks(32L, 4, Tuned.pickSalts(census), Map.empty)
    assert(Tuned.autoSalt(picks, "view") === 1)
    assert(Tuned.autoSalt(picks, "click") > 1)
    assert(Tuned.autoSalt(picks, "never_seen") === 1)
  }

  test("watermark: the stream-global delay covers every per-type pick") {
    val p = Tuned.Picks(32L, 4, Map.empty,
      Map("a" -> 60L, "b" -> 900L, "c" -> 300L))
    assert(p.watermarkDelayS === 900L)
    assert(p.watermark === "900 seconds")
    // no census rows: fall back to the shortest dial stop
    assert(Tuned.Picks(32L, 4, Map.empty, Map.empty).watermarkDelayS ===
      Round11.WatermarkDialS.head)
  }
}
