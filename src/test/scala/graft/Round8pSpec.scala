package graft

class Round8pSpec extends SparkSpec {

  test("mm18 tar round-trip: entry conservation and overhead accounting") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("mm18_tar_roundtrip")(spark, sf).collect()
    assert(rows.nonEmpty)
    val totalEntries = rows.map(_.getAs[Long]("n_entries")).sum
    val nDocs = graft.core.Tables.documents(spark, sf).count()
    assert(totalEntries === nDocs) // every doc survives the byte round-trip
    rows.foreach { r =>
      val body = r.getAs[Long]("total_body_bytes")
      val shard = r.getAs[Long]("total_shard_bytes")
      // TAR charges >= 512 header per entry + 1024 terminator per shard
      assert(shard >= body + 512 * r.getAs[Long]("n_entries")
        + 1024 * r.getAs[Long]("n_shards"))
      assert(shard % 512 === 0)
      val ov = r.getAs[Long]("overhead_fx")
      assert(ov > 0 && ov < 10000)
    }
  }

  test("mm18 shard bytes equal the real encoded archive lengths") {
    import org.apache.spark.sql.functions._
    val docs = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("text"))
    val media = graft.operators.Multimodal.tarMedia(docs)
    val one = media.limit(1).collect().head
    val payload = one.getAs[Array[Byte]]("payload")
    val decoded = graft.sources.TarCodec.decode(payload)
    assert(decoded.nonEmpty && decoded.get.nonEmpty)
    // the parsed bodies are the original texts, byte for byte
    val byId = docs.filter(col("source") === one.getAs[String]("source"))
      .filter(expr("doc_id div 16") === one.getAs[Long]("bucket"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
      .toMap
    decoded.get.foreach { e =>
      val id = e.name.stripPrefix("docs/").stripSuffix(".txt").toLong
      assert(new String(e.body, java.nio.charset.StandardCharsets.UTF_8)
        === byId(id))
    }
    assert(decoded.get.size === byId.size)
  }

  test("dd43 anchor sampling: the 1/1 arm is exact, class counts nest") {
    val rows = SparkEntry.queries("dd43_anchor_sampling")(spark, sf)
      .collect().map(r => r.getAs[Long]("sample_denom") -> r).toMap
    assert(rows.keySet === Set(1L, 4L, 16L))
    val full = rows(1L)
    assert(full.getAs[Long]("est_share_fx") === full.getAs[Long]("exact_share_fx"))
    assert(full.getAs[Long]("err_fx") === 0L)
    // classes with fp % 16 == 0 are a subset of fp % 4 == 0 of fp % 1 == 0
    assert(rows(16L).getAs[Long]("n_classes") <= rows(4L).getAs[Long]("n_classes"))
    assert(rows(4L).getAs[Long]("n_classes") <= rows(1L).getAs[Long]("n_classes"))
    rows.values.foreach { r =>
      assert(r.getAs[Long]("dups_sampled") <= r.getAs[Long]("n_docs_sampled"))
      assert(r.getAs[Long]("est_share_fx") >= 0L)
      assert(r.getAs[Long]("est_share_fx") < 10000L)
    }
    // the exact share re-derives from a direct distinct count
    import org.apache.spark.sql.functions._
    val docs = graft.core.Tables.documents(spark, sf)
      .select(lower(regexp_replace(trim(col("text")), "\\s+", " ")).as("norm"))
    val n = docs.count(); val distinct = docs.distinct().count()
    assert(full.getAs[Long]("exact_share_fx") === (n - distinct) * 10000L / n)
  }
}
