package graft

class Round8tSpec extends SparkSpec {

  test("q80 histogram selectivity: actuals exact, estimates error-bounded") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q80_histogram_selectivity")(spark, sf)
      .collect()
    assert(rows.length === 4)
    val cents = graft.core.Tables.orders(spark, sf)
      .select(floor(col("o_totalprice") * 100).cast("long").as("c"))
      .collect().map(_.getLong(0))
    val n = cents.length.toLong
    rows.foreach { r =>
      val lo = r.getAs[Long]("p_lo"); val hi = r.getAs[Long]("p_hi")
      val actual = cents.count(c => c >= lo && c <= hi).toLong
      assert(r.getAs[Long]("actual_rows") === actual)
      val est = r.getAs[Long]("est_rows")
      // equi-height bound: the estimate can be off by at most one
      // bucket's mass per probe EDGE (2 partial buckets), plus the
      // truncation of up to 1 row per overlapped bucket
      val bucketMass = (n + 15) / 16
      assert(math.abs(est - actual) <= 2 * bucketMass + 16,
        s"probe [$lo,$hi]: est=$est actual=$actual bound=${2 * bucketMass + 16}")
      assert(est >= 0)
    }
    // the all-range probe estimate is within truncation of exact n
    val all = rows.maxBy(r => r.getAs[Long]("p_hi") - r.getAs[Long]("p_lo"))
    assert(all.getAs[Long]("actual_rows") === n)
    assert(n - all.getAs[Long]("est_rows") <= 16) // <=1 truncated row/bucket
  }
}
