package graft

class Round8rSpec extends SparkSpec {

  test("pk25 packing: conservation, overshoot bound, imperative replay") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("pk25_shard_packer")(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = graft.core.Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"),
        (lit(512L) + expr("((octet_length(text) + 511) div 512) * 512"))
          .as("disk"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_.getAs[Long]("n_docs")).sum === docs.length.toLong)
    val target = 1L << 20
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val srcDocs = docs.filter(_._1 == src).sortBy(_._2)
      // a shard overshoots by at most the one straddling doc
      val maxDisk = srcDocs.map(_._3).max
      assert(r.getAs[Long]("max_shard_bytes") <= target + maxDisk + 1024)
      // imperative next-fit-by-offset replay
      var shards = Map.empty[Long, Long].withDefaultValue(0L)
      var cum = 0L
      srcDocs.foreach { case (_, _, disk) =>
        val shard = cum / target
        shards += shard -> (shards(shard) + disk)
        cum += disk
      }
      assert(r.getAs[Long]("n_shards") === shards.size.toLong)
      assert(r.getAs[Long]("max_shard_bytes")
        === shards.values.max + 1024L)
      assert(r.getAs[Long]("n_overshot")
        === shards.values.count(_ + 1024 > target).toLong)
    }
  }

  test("ev81 fano: driver recount matches and bounds hold") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("ev81_fano_overdispersion")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val minutes = graft.core.Tables.events(spark, sf)
      .select(col("event_type"), expr("unix_micros(ts) div 60000000").as("m"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val lo = minutes.map(_._2).min; val hi = minutes.map(_._2).max
    val nMinutes = hi - lo + 1
    rows.foreach { r =>
      assert(r.getAs[Long]("n_minutes") === nMinutes)
      val act = r.getAs[Long]("active_minutes")
      assert(act >= 1 && act <= nMinutes)
      val ty = r.getAs[String]("event_type")
      val byMin = minutes.filter(_._1 == ty).groupBy(_._2)
        .map { case (_, v) => v.length.toLong }
      val s = byMin.sum; val sq = byMin.map(x => x * x).sum
      assert(r.getAs[Long]("n_events") === s)
      assert(r.getAs[Long]("fano_fx")
        === (nMinutes * sq - s * s) * 10000L / (nMinutes * s))
      // variance of a nonneg count process is nonnegative
      assert(r.getAs[Long]("fano_fx") >= 0L)
    }
  }
}
