package graft

/** Every SparkEntry query must run at sf0.001 (exact values are the
  * driver's DuckDB gate; this is the fast structural smoke).
  */
class QueriesSmokeSpec extends SparkSpec {

  test("entry flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle twin") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(q === o, s"queries without oracle: ${q -- o}; oracles without query: ${o -- q}")
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
