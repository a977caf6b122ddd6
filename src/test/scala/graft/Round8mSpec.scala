package graft

class Round8mSpec extends SparkSpec {

  test("q78 bitmap overlap: set bounds hold for every type pair") {
    val rows = SparkEntry.queries("q78_bitmap_audience")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val a = r.getAs[Long]("users_a"); val b = r.getAs[Long]("users_b")
      val c = r.getAs[Long]("n_common")
      assert(c <= math.min(a, b))
      assert(c >= 0L)
      val j = r.getAs[Long]("jaccard_fx")
      assert(j >= 0L && j <= 10000L)
      assert(j === c * 10000L / (a + b - c))
    }
    // pair frame covers each unordered type pair once
    val pairs = rows.map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b")))
    assert(pairs.distinct.length === pairs.length)
    pairs.foreach { case (a, b) => assert(a < b) }
  }

  test("q78 per-type bitmap popcount equals direct distinct count") {
    import org.apache.spark.sql.functions._
    val direct = graft.core.Tables.events(spark, sf)
      .select(col("event_type"), col("user_id")).distinct()
      .groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = SparkEntry.queries("q78_bitmap_audience")(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("users_a") === direct(r.getAs[String]("type_a")))
      assert(r.getAs[Long]("users_b") === direct(r.getAs[String]("type_b")))
    }
  }

  test("ss37 hubness: census conserves vectors and k-mass") {
    val rows = SparkEntry.queries("ss37_hubness")(spark, sf).collect()
    assert(rows.nonEmpty)
    val nVec = rows.map(_.getAs[Long]("n_vectors")).sum
    val kMass = rows.map(_.getAs[Long]("sum_indeg")).sum
    // every vector appears in exactly one octave bucket; total
    // in-degree = k × queries (each query contributes exactly k)
    assert(nVec === 500L)
    assert(kMass === 5L * 500L)
    rows.foreach { r =>
      val oct = r.getAs[Long]("octave")
      val mx = r.getAs[Long]("max_indeg")
      // octave o holds in-degrees in [2^o − 1, 2^(o+1) − 2]
      assert(mx + 1 >= (1L << oct) && mx + 1 < (1L << (oct + 1)))
    }
  }

  test("pk23 prefix yield: monotone counts and share bounds") {
    val rows = SparkEntry.queries("pk23_prefix_cache_yield")(spark, sf)
      .collect().sortBy(_.getAs[Long]("prefix_len"))
    assert(rows.map(_.getAs[Long]("prefix_len")).toSeq === Seq(8L, 32L, 128L))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_prefixes") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("saved_tokens") >= 0L)
      val share = r.getAs[Long]("saved_share_fx")
      assert(share >= 0L && share <= 10000L)
    }
    // longer prefixes qualify fewer (or equal) docs
    rows.sliding(2).foreach {
      case Array(lo, hi) =>
        assert(lo.getAs[Long]("n_docs") >= hi.getAs[Long]("n_docs"))
      case _ =>
    }
  }
}
