package graft

import org.apache.spark.sql.functions._
import graft.operators.Sketch
import graft.functions.Hashing

class SketchSpec extends SparkSpec {

  import spark.implicits._

  test("countMin never undercounts and isolates keys in empty buckets") {
    val keyed = Seq(("a", 100L), ("b", 7L), ("c", 1L))
      .toDF("k", "cnt")
    val sketch = Sketch.countMin(keyed, col("k"), col("cnt"), 4, 512L)
    assert(sketch.count() <= 4L * 3L)
    val est = Sketch.cmsEstimate(sketch, keyed, col("k"), 4, 512L)
      .collect().map(r => r.getAs[String]("k") -> r.getAs[Long]("est")).toMap
    val truth = Map("a" -> 100L, "b" -> 7L, "c" -> 1L)
    truth.foreach { case (k, v) =>
      assert(est(k) >= v, s"$k undercounted")
    }
    // 3 keys in 512 buckets: collisions are (provably for these
    // fixed hashes) absent, so estimates are exact
    assert(est === truth)
  }

  test("hllDistinct calibration: within 2 std errors at n >> 2m") {
    // 200k distinct keys against m=512 registers: raw-regime HLL,
    // std error 1.04/sqrt(512) = 4.6%. Deterministic hash ⇒ one
    // fixed estimate; the 2σ envelope (9.2%) pins it with margin.
    val n = 200000L
    val hashed = spark.range(n).toDF("x")
      .select(lit("g").as("g"), Hashing.hash64(col("x").cast("string")).as("h"))
      .distinct()
    val r = Sketch.hllDistinct(hashed, Seq(col("g")), col("h")).collect().head
    val est = r.getAs[Long]("est").toDouble
    assert(r.getAs[Long]("n_buckets") === Sketch.HllM.toLong,
      "every register occupied at n >> m")
    assert(math.abs(est - n) / n <= 0.092, s"est $est vs $n")
  }

  test("hllDistinct registers saturate the scaled-sum bound") {
    // 3 keys in 512 registers: mostly-empty sketch — the estimate is
    // the documented raw-regime constant-ish floor (~alpha*m), never
    // a crash or overflow; n_buckets counts exactly the occupied ones
    val hashed = Seq("a", "b", "c").toDF("x")
      .select(lit("g").as("g"), Hashing.hash64(col("x")).as("h"))
      .distinct()
    val r = Sketch.hllDistinct(hashed, Seq(col("g")), col("h")).collect().head
    assert(r.getAs[Long]("n_buckets") === 3L)
    assert(r.getAs[Long]("est") > 0L)
  }

  test("kmvDistinct is exact below k and deterministic") {
    val hashed = (1 to 40).map(i => ("g", i)).toDF("g", "x")
      .select(col("g"), Hashing.hash64(col("x").cast("string")).as("h"))
      .distinct()
    val r = Sketch.kmvDistinct(hashed, Seq(col("g")), col("h"), 64)
      .collect().head
    assert(r.getAs[Long]("n_kept") === 40L)
    assert(r.getAs[Long]("est") === 40L, "below k the sketch is exact")
  }
}
