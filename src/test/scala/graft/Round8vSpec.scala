package graft

class Round8vSpec extends SparkSpec {

  test("pk26: dedup-then-pack conserves keepers and only shrinks the bill") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("pk26_dedup_aware_packing")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    // keepers across sources = distinct normalized texts in the corpus
    val docs = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"),
        lower(regexp_replace(trim(col("text")), "\\s+", " ")).as("norm"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val keepers = docs.groupBy(_._2).map { case (_, v) => v.map(_._1).min }
      .toSet
    assert(rows.map(_.getAs[Long]("docs_after")).sum === keepers.size.toLong)
    assert(rows.map(_.getAs[Long]("docs_before")).sum === docs.length.toLong)
    rows.foreach { r =>
      assert(r.getAs[Long]("docs_after") <= r.getAs[Long]("docs_before"))
      assert(r.getAs[Long]("bytes_after") <= r.getAs[Long]("bytes_before"))
      assert(r.getAs[Long]("shards_after") <= r.getAs[Long]("shards_before"))
      val fx = r.getAs[Long]("saved_bytes_fx")
      assert(fx >= 0 && fx < 10000)
      // fx re-derives from the byte columns
      assert(fx === (r.getAs[Long]("bytes_before") - r.getAs[Long]("bytes_after"))
        * 10000L / r.getAs[Long]("bytes_before"))
    }
  }
}
