package graft

class Round8wSpec extends SparkSpec {

  test("ss39: recall bounds, panel size, and delta share sanity") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("ss39_segment_merge_recall")(spark, sf)
      .collect()
    assert(rows.length === 1)
    val r = rows.head
    val e = graft.core.Tables.embeddings(spark, sf)
    val nPanel = e.filter(pmod(col("vec_id"), lit(19L)) === 0).count()
    assert(r.getAs[Long]("n_queries") === nPanel)
    val mean = r.getAs[Long]("mean_recall_fx")
    val min = r.getAs[Long]("min_recall_fx")
    assert(min >= 0 && min <= mean && mean <= 10000)
    // probing 2 of 8 cells per segment should still find most true
    // neighbors (same-label concentration) — a degenerate 0 recall
    // would mean the routing is broken
    assert(mean > 2000, s"mean recall suspiciously low: $mean")
    val delta = r.getAs[Long]("truth_delta_fx")
    // delta holds ~10% of vectors; its share of true neighborhoods
    // should be in the same regime, not 0 and not dominant
    assert(delta >= 0 && delta < 5000)
  }

  test("ss39 truth-side stats match an exact driver brute-force recount") {
    import org.apache.spark.sql.functions._
    val e = graft.core.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("emb"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](2).toArray))
    def norm(v: Array[Double]) = math.sqrt(v.map(x => x * x).sum)
    def cosFx(a: Array[Double], b: Array[Double]) =
      math.floor(a.zip(b).map { case (x, y) => x * y }.sum
        / (norm(a) * norm(b)) * 10000).toLong
    val panel = e.filter(_._1 % 19 == 0)
    // exact global top-5 per query, (fx desc, id) total order — the
    // same truth arm the operator builds; delta share recounts exactly
    val deltaHits = panel.map { q =>
      e.filter(_._1 != q._1)
        .map(v => (v._1, cosFx(v._2, q._2)))
        .sortBy { case (id, fx) => (-fx, id) }.take(5)
        .count(_._1 % 10 == 0).toLong
    }.sum
    val r = SparkEntry.queries("ss39_segment_merge_recall")(spark, sf)
      .collect().head
    assert(r.getAs[Long]("n_queries") === panel.length.toLong)
    assert(r.getAs[Long]("truth_delta_fx")
      === deltaHits * 10000L / (5L * panel.length))
  }
}
