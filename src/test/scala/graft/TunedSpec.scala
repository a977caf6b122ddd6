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

  // --- per-type dial consumers (VERDICT r12 #2) -------------------------

  private def withTypeConfs[T](salts: Map[String, Long],
      wms: Map[String, Long])(f: => T): T = {
    spark.conf.set(Tuned.SaltConf, Tuned.fmtTypeMap(salts))
    spark.conf.set(Tuned.WatermarkConf, Tuned.fmtTypeMap(wms))
    try f
    finally {
      spark.conf.unset(Tuned.SaltConf)
      spark.conf.unset(Tuned.WatermarkConf)
    }
  }

  test("per-type confs round-trip and consumers read them") {
    val m = Map("click" -> 8L, "purchase" -> 1L, "view" -> 4L)
    assert(Tuned.parseTypeMap(Tuned.fmtTypeMap(m)) === m)
    assert(Tuned.parseTypeMap("") === Map.empty)
    assert(Tuned.parseTypeMap("garbage") === Map.empty)
    withTypeConfs(m, Map("click" -> 45L)) {
      assert(Tuned.confSaltByType(spark) === m)
      assert(Tuned.confWatermarkFor(spark, "click", "1 hour") === "45 seconds")
      assert(Tuned.confWatermarkFor(spark, "never_seen", "1 hour") === "1 hour")
    }
    // untuned session: empty map, defaults pass through
    assert(Tuned.confSaltByType(spark) === Map.empty)
    assert(Tuned.confWatermarkFor(spark, "click", "1 hour") === "1 hour")
  }

  test("session() publishes the per-type dials on the conf channel") {
    val parts0 = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      val p = Tuned.session(spark, sf)
      assert(Tuned.confSaltByType(spark) === p.saltByType)
      val wm = Tuned.parseTypeMap(spark.conf.get(Tuned.WatermarkConf))
      assert(wm === p.watermarkDelaySByType)
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", parts0)
      Seq("spark.graft.emb.bandBits", Tuned.SaltConf, Tuned.WatermarkConf)
        .foreach(spark.conf.unset)
    }
  }

  test("autoSaltedJoin is result-identical to the plain join for any salt map") {
    import spark.implicits._
    val left = (1 to 200).map(i =>
      (i.toLong, s"id$i", if (i % 3 == 0) "click" else "view", i % 7))
      .toDF("k", "uid", "event_type", "payload")
    val right = (0 to 6).map(i => (i.toLong * 3 % 21, s"dim$i"))
      .toDF("rk", "dim").distinct()
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
      val cols = df.columns.sorted.toIndexedSeq
      df.select(cols.map(col): _*).collect().map(_.toString).sorted.toSeq
    }
    val plain = canon(left.join(right, left("k") === right("rk")))
    for (m <- Seq(Map("click" -> 4L, "view" -> 1L),
        Map("click" -> 8L), Map.empty[String, Long])) {
      val salted = canon(graft.operators.Skew.autoSaltedJoin(
        left, right, "k", "rk", col("uid"), col("event_type"), m))
      assert(salted === plain, s"map=$m")
    }
  }

  test("q27 and ev49 are result-identical under the tuned per-type dials at gated SF") {
    // the round-13 consumer contract: applying the REAL gated-SF picks
    // (plus a deliberately mixed synthetic salt map) must not flip the
    // oracle-gated results — q27's auto-salted join is identical to
    // the static-8 shape by construction, and ev49's single-batch
    // AvailableNow run is exact under any watermark delay
    def runQ27 = SparkEntry.queries("q27_salted_join")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    def runEv49 = SparkEntry.queries("ev49_stream_interval_join")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    val q27Before = runQ27
    val ev49Before = runEv49
    val p = Tuned.picks(spark, sf)
    withTypeConfs(p.saltByType, p.watermarkDelaySByType) {
      assert(runQ27 === q27Before, "q27 under real gated-SF salt picks")
      assert(runEv49 === ev49Before, "ev49 under real gated-SF watermark picks")
    }
    withTypeConfs(Map("click" -> 8L, "purchase" -> 2L), Map("click" -> 45L)) {
      assert(runQ27 === q27Before, "q27 under a mixed synthetic salt map")
    }
  }
}
