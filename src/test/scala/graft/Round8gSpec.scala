package graft

import org.apache.spark.sql.Row

class Round8gSpec extends SparkSpec {

  test("ss35 frontier is well-formed and monotone in nlist") {
    val rows: Array[Row] = SparkEntry.queries("ss35_nlist_sweep")(spark, sf)
      .collect()
    assert(rows.length === 4)
    val byK = rows.map(r => r.getAs[Long]("nlist") -> r).toMap
    assert(byK.keySet === Set(2L, 4L, 8L, 16L))
    rows.foreach { r =>
      // every layout uses at most nlist cells and covers all queries
      assert(r.getAs[Long]("n_cells_used") <= r.getAs[Long]("nlist"))
      assert(r.getAs[Long]("n_queries") > 0)
      assert(r.getAs[Long]("n_truth") ===
        r.getAs[Long]("n_queries") * 10)
      assert(r.getAs[Long]("n_hit") <= r.getAs[Long]("n_truth"))
      assert(r.getAs[Long]("scanned_fx") <= 1000000L)
      assert(r.getAs[Long]("recall_fx") <= 1000000L)
    }
    // more cells → less scanned per query at nprobe=1 (the cost side
    // must move or the dial is dead). Layouts with different first-K
    // centroid sets don't strictly nest, so recall/max_occ monotonicity
    // is NOT asserted — only the cost direction, which is a pigeonhole
    // expectation robust to testdata regeneration.
    val ks = Seq(2L, 4L, 8L, 16L)
    ks.sliding(2).foreach { case Seq(a, b) =>
      assert(byK(b).getAs[Long]("n_scanned") < byK(a).getAs[Long]("n_scanned"),
        s"nlist $a -> $b did not reduce scan cost")
    }
  }
}
