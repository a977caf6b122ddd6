package graft

import org.apache.spark.sql.functions._

/** Planted-fixture coverage for the three operators whose oracle rows
  * are legitimately EMPTY at every gated SF (VERDICT r11, missing #4):
  * q09 (no customer is order-less in the synthetic warehouse), q18
  * (no user is a clicker∩purchaser∖errorer), ss07 (no vector within
  * hamming ≤ 2 of the probe's bucket at spec scale). An empty↔empty
  * hash match proves only schema, so each gets a crafted-parquet run
  * (q48's pattern) asserting a NON-EMPTY result that matches a
  * driver-side recompute. The gated-SF entries stay untouched.
  */
class PlantedFixtureSpec extends SparkSpec {

  private def tempDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$tag").toString

  test("q09 anti-join surfaces planted order-less customers") {
    import spark.implicits._
    val dir = tempDir("q09")
    Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"), (4L, "delta"))
      .toDF("c_custkey", "c_name")
      .write.parquet(s"$dir/customer.parquet")
    // orders exist for customers 1 and 4 only -> 2 and 3 are orphaned
    Seq((100L, 1L), (101L, 1L), (102L, 4L))
      .toDF("o_orderkey", "o_custkey")
      .write.parquet(s"$dir/orders.parquet")
    val got = SparkEntry.queries("q09_antijoin")(spark, dir).collect()
      .map(r => (r.getAs[Long]("c_custkey"), r.getAs[String]("c_name")))
    assert(got.toSeq === Seq((2L, "beta"), (3L, "gamma")))
  }

  test("q18 set algebra keeps exactly the planted click∩purchase∖error cohort") {
    import spark.implicits._
    val dir = tempDir("q18")
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    // u1: click+purchase, clean        -> kept
    // u2: click+purchase+error         -> dropped by except
    // u3: click only                   -> dropped by intersect
    // u4: purchase only                -> dropped by intersect
    // u5: click+purchase, clean        -> kept
    Seq(
      (1L, "click", t0), (1L, "purchase", t0),
      (2L, "click", t0), (2L, "purchase", t0), (2L, "error", t0),
      (3L, "click", t0),
      (4L, "purchase", t0),
      (5L, "click", t0), (5L, "purchase", t0))
      .toDF("user_id", "event_type", "ts")
      .write.parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q18_set_ops")(spark, dir).collect()
      .map(_.getAs[Long]("user_id"))
    assert(got.toSeq === Seq(1L, 5L))
  }

  test("ss07 multi-probe rerank finds planted hamming≤2 neighbors of the probe") {
    import spark.implicits._
    val dir = tempDir("ss07")
    // 64-dim vectors; the 16-bit sketch reads the SIGNS of dims 1-16.
    // probe (vec 0): all +1. Planted neighbors flip the first k dims:
    //   vec 1: k=0 -> hamming 0, cos 1.0
    //   vec 2: k=1 -> hamming 1, cos 62/64 = 0.96875
    //   vec 3: k=2 -> hamming 2, cos 60/64 = 0.9375
    //   vec 4: k=3 -> hamming 3, OUTSIDE the probe radius (excluded
    //          even though its cosine beats nothing — the radius is
    //          the filter, not the score)
    def vec(flips: Int): Seq[Double] =
      (0 until 64).map(i => if (i < flips) -1.0 else 1.0)
    Seq(
      (0L, vec(0)), (1L, vec(0)), (2L, vec(1)), (3L, vec(2)), (4L, vec(3)))
      .toDF("vec_id", "embedding")
      .write.parquet(s"$dir/embeddings.parquet")
    val got = SparkEntry.queries("ss07_rerank")(spark, dir).collect()
    assert(got.map(_.getAs[Long]("vec_id")).toSeq === Seq(1L, 2L, 3L))
    assert(got.map(_.getAs[Long]("hamming")).toSeq === Seq(0L, 1L, 2L))
    // driver-side recompute of the exact cosines (trunc4 floor)
    assert(got.map(_.getAs[Double]("cos_sim")).toSeq ===
      Seq(1.0, math.floor(62.0 / 64 * 10000) / 10000,
        math.floor(60.0 / 64 * 10000) / 10000))
  }
}
