package graft

import org.apache.spark.sql.Row

class Round8jSpec extends SparkSpec {

  test("dd42 sweep is well-formed; more bits never hurt on this corpus") {
    val rows: Array[Row] = SparkEntry.queries("dd42_bbit_minhash")(spark, sf)
      .collect()
    assert(rows.length === 4)
    val byB = rows.map(r => r.getAs[Long]("b") -> r).toMap
    assert(byB.keySet === Set(1L, 2L, 4L, 8L))
    // the same candidate set is scored under every b
    assert(rows.map(_.getAs[Long]("n_pairs")).distinct.length === 1)
    assert(rows.head.getAs[Long]("n_pairs") > 0)
    rows.foreach { r =>
      assert(r.getAs[Long]("bits_per_sig") ===
        r.getAs[Long]("b") * graft.operators.Dedup.MinhashK)
      assert(r.getAs[Long]("mae_fx") >= 0L)
      assert(r.getAs[Long]("mae_fx") <= r.getAs[Long]("max_abs_err_fx"))
      assert(r.getAs[Long]("max_abs_err_fx") <= 10000L)
    }
    // a single loose ordering claim (variance shrinks with b; on a
    // fixed corpus only the endpoints are safely assertable)
    assert(byB(8L).getAs[Long]("mae_fx") <= byB(1L).getAs[Long]("mae_fx"))
  }

  test("dd42 estimator closed form: hand-checked corners") {
    // f = 1 (all K low-b bits match) → Ĵ = 1 for every b;
    // f = 2^-b exactly → Ĵ = 0; below the base rate clamps to 0
    val k = graft.operators.Dedup.MinhashK
    for (b <- Seq(1, 2, 4, 8)) {
      val m = 1L << b
      def jhat(nMatch: Long): Long =
        math.max(0L, ((nMatch * m - k) * 10000L) / (k * (m - 1)))
      assert(jhat(k) === 10000L, s"b=$b full match")
      if (k % m == 0) assert(jhat(k / m) === 0L, s"b=$b base rate")
      assert(jhat(0) === 0L, s"b=$b clamp")
    }
  }
}
