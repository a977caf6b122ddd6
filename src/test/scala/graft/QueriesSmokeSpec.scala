package graft

/** Every SparkEntry query must run at sf0.001 (exact values are the
  * driver's DuckDB gate; this is the fast structural smoke).
  */
class QueriesSmokeSpec extends SparkSpec {

  test("entry flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("entry runs on a bare session (no graft confs/extensions), like the driver smoke") {
    val bare = spark.newSession()
    bare.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    assert(SparkEntry.entry(bare).count() > 0)
  }

  test("every oracle has a query; only sketch ops lack oracles") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracles without query: ${o -- q}")
    assert((q -- o) === Set("q13_approx_distinct"), s"unexpected rows-only queries: ${q -- o}")
  }

  test("q13 approx distinct stays within 10% of exact") {
    // default HLL++ rsd is 5% (a std-dev, not a bound) — 10% envelope
    val rows = SparkEntry.queries("q13_approx_distinct")(spark, sf).collect()
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_customers").toDouble
      val exact = r.getAs[Long]("exact_customers").toDouble
      assert(math.abs(approx - exact) / exact <= 0.10, s"$approx vs $exact")
    }
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }

  test("multimodal mapPartitions plumbing decodes batched payloads") {
    val docs = graft.core.Tables.documents(spark, sf)
    val media = graft.operators.Multimodal.asMedia(docs)
    val decoded = graft.operators.Multimodal.fakeDecode(media)
    val row = decoded.filter(decoded("media_id") === 0).head
    assert(row.getAs[Long]("feat_n_bytes") > 0)
    assert(row.getAs[Int]("feat_first") >= 0)
  }
}
