package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Round11}

class Round11Spec extends SparkSpec {

  test("dd46 autopick: exactly one geometry chosen, flags consistent") {
    val rows = SparkEntry.queries("dd46_band_autopick")(spark, sf)
      .collect().sortBy(_.getAs[Long]("band_bits"))
    assert(rows.map(_.getAs[Long]("band_bits")).toSeq ===
      Dedup.DialBits.map(_.toLong))
    assert(rows.count(_.getAs[Long]("chosen") == 1L) === 1)
    val n = rows.head.getAs[Long]("n_corpus")
    rows.foreach { r =>
      assert(r.getAs[Long]("pair_budget") ===
        n * Round11.PairBudgetPerVec)
      val within = r.getAs[Long]("candidate_pairs") <=
        r.getAs[Long]("pair_budget")
      assert(r.getAs[Long]("within_budget") === (if (within) 1L else 0L))
    }
    // recall-first: the chosen stop is the narrowest within budget,
    // or the widest when none fits
    val withins = rows.filter(_.getAs[Long]("within_budget") == 1L)
    val expected =
      if (withins.nonEmpty) withins.map(_.getAs[Long]("band_bits")).min
      else rows.map(_.getAs[Long]("band_bits")).max
    val chosen = rows.find(_.getAs[Long]("chosen") == 1L).get
      .getAs[Long]("band_bits")
    assert(chosen === expected)
  }

  test("dd46 at eval scale keeps the oracle default geometry (4 bits)") {
    // the budget constant is calibrated so the chooser only widens
    // when density genuinely grows — a test corpus must not flip the
    // default that every gated lap runs under
    assert(Round11.autoBandBits(spark, sf) === Dedup.EmbBandBits)
  }

  test("the sf10 ladder's measured census picks 16 bits (VERDICT r10 #3)") {
    // the r10 ladder: 200k vectors at 4-bit bands planned ~2x10^9
    // candidate pairs (>54 GB of sort spill, the round's real cliff);
    // 8-bit ~1.5x10^8 still exceeds 32*n = 6.4M; 16-bit fits. The
    // chooser must pick 16 from the census alone — no ladder re-run.
    import spark.implicits._
    val census = Seq(
      (4L, 3200000L, 900000L, 2000000000L),
      (8L, 25000000L, 60000L, 150000000L),
      (16L, 180000000L, 400L, 4000000L))
      .toDF("band_bits", "n_buckets", "max_occupancy", "candidate_pairs")
    val n = Seq(200000L).toDF("n_corpus")
    val picked = Round11.bandAutopick(census, n)
      .filter(col("chosen") === 1L).collect()
    assert(picked.map(_.getAs[Long]("band_bits")).toSeq === Seq(16L))
    // and when NOTHING fits, the widest stop minimizes the overshoot
    val dense = Seq(
      (4L, 1L, 1L, 9000000000L),
      (8L, 1L, 1L, 8000000000L),
      (16L, 1L, 1L, 7000000000L))
      .toDF("band_bits", "n_buckets", "max_occupancy", "candidate_pairs")
    val picked2 = Round11.bandAutopick(dense, n)
      .filter(col("chosen") === 1L).collect()
    assert(picked2.map(_.getAs[Long]("band_bits")).toSeq === Seq(16L))
    assert(picked2.head.getAs[Long]("within_budget") === 0L)
  }
}
