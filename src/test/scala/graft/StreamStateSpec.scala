package graft
// (streaming state specs)

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamJobs

case class KeyedEvent(event_key: String, ts: Timestamp, v: Int)

class StreamStateSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("dedupWithinWatermark collapses repeated keys in a stream") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[KeyedEvent]
    val out = StreamJobs.dedupWithinWatermark(in.toDF(), Seq("event_key"), "ts")
    val q = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append).start()
    in.addData(
      KeyedEvent("a", ts("2024-01-01 00:00:01"), 1),
      KeyedEvent("a", ts("2024-01-01 00:00:02"), 2),
      KeyedEvent("b", ts("2024-01-01 00:00:03"), 3))
    q.processAllAvailable()
    in.addData(KeyedEvent("a", ts("2024-01-01 00:00:04"), 4))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("dedup_out").collect()
    // one row per key within the watermark window
    assert(rows.map(_.getAs[String]("event_key")).sorted.toSeq === Seq("a", "b"))
  }

  test("streaming as-of enrichment matches the batch operator on ordered batches") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamJobs.AsOfIn
    // versions (side 0) and facts (side 1) from the sf events table,
    // keyed by user; versions = clicks (carry value), facts = purchases
    val ev = graft.core.Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id").as("k"), expr("unix_micros(ts)").as("ts"),
        when(col("event_type") === "click", 0).otherwise(1).as("side"),
        when(col("event_type") === "click", col("value")).as("v"))
      .as[AsOfIn].collect().sortBy(r => (r.ts, r.side))
    val split = ev(ev.length / 2).ts
    val (batch1, batch2) = ev.partition(_.ts <= split)
    // keep batches event-time ordered: batch2 strictly after batch1
    val in = MemoryStream[AsOfIn]
    val q = StreamJobs.streamAsOf(in.toDS()).writeStream
      .format("memory").queryName("asof_stream")
      .outputMode(OutputMode.Append).start()
    in.addData(batch1.toSeq); q.processAllAvailable()
    in.addData(batch2.toSeq); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("asof_stream")
      .select(col("k"), col("ts"), col("asof_v"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getDouble(2)))
      .sortBy(t => (t._1, t._2, Option(t._3).map(_.toString).getOrElse("")))
    val evDf = graft.core.Tables.events(spark, sf)
    val facts = evDf.filter(col("event_type") === "purchase")
      .select(col("user_id").as("k"), expr("unix_micros(ts)").as("ts"))
    val versions = evDf.filter(col("event_type") === "click")
      .select(col("user_id").as("k"), expr("unix_micros(ts)").as("vts"), col("value"))
    val batch = graft.operators.AsOf
      .joinAsOf(facts, versions, "k", "ts", "vts", Seq("value"))
      .select(col("k"), col("ts"), col("asof_value"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getDouble(2)))
      .sortBy(t => (t._1, t._2, Option(t._3).map(_.toString).getOrElse("")))
    assert(streamed.length === batch.length)
    assert(streamed.toSeq === batch.toSeq)
  }

  test("watermark drops late events from windowed aggregation (ev23's streaming twin)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[KeyedEvent]
    val agg = in.toDF().withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("ws"), col("n"))
    val q = agg.writeStream.format("memory").queryName("wm_out")
      .outputMode(OutputMode.Append).start()
    in.addData(KeyedEvent("a", ts("2024-01-01 10:00:00"), 1),
      KeyedEvent("a", ts("2024-01-01 10:30:00"), 2))
    q.processAllAvailable() // watermark after this batch: 10:20
    in.addData(KeyedEvent("a", ts("2024-01-01 10:05:00"), 3), // LATE → dropped
      KeyedEvent("a", ts("2024-01-01 10:25:00"), 4)) // within watermark → kept
    q.processAllAvailable()
    in.addData(KeyedEvent("a", ts("2024-01-01 11:00:00"), 5)) // finalize earlier windows
    q.processAllAvailable()
    q.stop()
    val got = spark.table("wm_out").collect()
      .map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    // the 10:00 window finalized WITHOUT the late 10:05 arrival —
    // exactly the per-key high-water-mark drop ev23 censuses in batch
    assert(got(ts("2024-01-01 10:00:00")) === 1L)
    assert(got(ts("2024-01-01 10:20:00")) === 1L)
    assert(got(ts("2024-01-01 10:30:00")) === 1L)
  }

  test("stream-stream interval join correlates within the bound") {
    implicit val sqlCtx = spark.sqlContext
    val signups = MemoryStream[KeyedEvent]
    val purchases = MemoryStream[KeyedEvent]
    val joined = StreamJobs.intervalJoin(
      signups.toDF().select(col("event_key"), col("ts").as("s_ts")),
      purchases.toDF().select(col("event_key"), col("ts").as("p_ts")),
      "event_key", "s_ts", "p_ts", "1 minute", 3600)
    val q = joined.writeStream.format("memory").queryName("join_out")
      .outputMode(OutputMode.Append).start()
    signups.addData(KeyedEvent("u1", ts("2024-01-01 00:00:00"), 0),
      KeyedEvent("u2", ts("2024-01-01 00:00:00"), 0))
    purchases.addData(
      KeyedEvent("u1", ts("2024-01-01 00:30:00"), 1), // within 1h → match
      KeyedEvent("u2", ts("2024-01-01 02:00:00"), 2)) // outside → no match
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("join_out").collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[String]("event_key") === "u1")
  }

  test("rate limiter decides same-microsecond peers as one group, like the RANGE frame") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamJobs.RateIn
    val in = MemoryStream[RateIn]
    val q = StreamJobs.rateLimit(in.toDS(), limit = 2).writeStream
      .format("memory").queryName("rate_tie_out")
      .outputMode(OutputMode.Append).start()
    // user 1: three events at the SAME t → each RANGE frame holds all
    // three (cnt=3 > 2) → ALL throttle, not just the arrival-order tail.
    // user 2: two peers (cnt=2 ≤ 2) → both admitted.
    // user 1's later lone event: window holds 3 + itself → throttled.
    in.addData(
      RateIn(1L, "a", 1000000L), RateIn(1L, "b", 1000000L), RateIn(1L, "c", 1000000L),
      RateIn(2L, "a", 1000000L), RateIn(2L, "b", 1000000L))
    q.processAllAvailable()
    in.addData(RateIn(1L, "d", 2000000L))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("rate_tie_out").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type")) ->
        r.getAs[Boolean]("throttled")).toMap
    assert(got((1L, "a")) && got((1L, "b")) && got((1L, "c")), s"user-1 peers: $got")
    assert(!got((2L, "a")) && !got((2L, "b")), s"user-2 peers: $got")
    assert(got((1L, "d")), s"post-tie event: $got")
  }

  test("streaming rate limiter matches ev27's batch census on ordered batches") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamJobs.RateIn
    val ev = graft.core.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), expr("unix_micros(ts)").as("t"))
      .as[RateIn].collect().sortBy(_.t)
    val split = ev(ev.length / 2).t
    val (batch1, batch2) = ev.partition(_.t <= split)
    val in = MemoryStream[RateIn]
    val q = StreamJobs.rateLimit(in.toDS()).writeStream
      .format("memory").queryName("rate_out")
      .outputMode(OutputMode.Append).start()
    in.addData(batch1.toSeq); q.processAllAvailable()
    in.addData(batch2.toSeq); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("rate_out")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("throttled"), 1L).otherwise(0L)).as("n_throttled"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val batch = SparkEntry.queries("ev27_rate_limit")(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("n_throttled"))).toMap
    // O(limit)-state streaming decisions == the batch RANGE window's,
    // per event_type — the exactness claim in the rateLimit scaladoc
    assert(streamed === batch)
    assert(ev.nonEmpty)
  }

  test("streaming near-dup equals the batch banded join when buckets fit state") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamNearDup
    import graft.streaming.StreamNearDup.DocSig
    // random 60-bit signatures with planted near-dups: every 5th doc
    // is a ≤3-bit mutation of an earlier one
    val rnd = new scala.util.Random(11)
    val sigs = scala.collection.mutable.ArrayBuffer[Long]()
    (0 until 300).foreach { i =>
      sigs += (if (i % 5 == 0 || sigs.isEmpty) rnd.nextLong() & ((1L << 60) - 1)
        else {
          var s = sigs(rnd.nextInt(sigs.length))
          (0 until rnd.nextInt(4)).foreach(_ => s ^= 1L << rnd.nextInt(60))
          s
        })
    }
    val docs = sigs.zipWithIndex.map { case (s, i) => DocSig(i.toLong, i.toLong, s) }
    val (batch1, batch2) = docs.splitAt(150)
    val in = MemoryStream[DocSig]
    val q = StreamNearDup.nearDup(in.toDS(), maxPerBucket = 1000).writeStream
      .format("memory").queryName("neardup_out")
      .outputMode(OutputMode.Append).start()
    in.addData(batch1.toSeq); q.processAllAvailable()
    in.addData(batch2.toSeq); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("neardup_out")
      .select(col("doc_id"), col("dup_of")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // batch ground truth: ordered pairs sharing >= 1 band at hamming <= 3
    def bands(s: Long): Seq[Long] = (0 until graft.operators.Dedup.SimhashBands)
      .map(b => (b.toLong << 32) |
        ((s >> (b * graft.operators.Dedup.SimhashBandBits)) & graft.operators.Dedup.SimhashBandMask))
    val expected = (for {
      j <- docs.indices; i <- 0 until j
      if java.lang.Long.bitCount(sigs(i) ^ sigs(j)) <= 3
      if bands(sigs(i)).toSet.intersect(bands(sigs(j)).toSet).nonEmpty
    } yield (j.toLong, i.toLong)).toSet
    assert(streamed === expected)
    assert(expected.nonEmpty, "planted near-dups must produce pairs")
    // pigeonhole: at hamming <= 3 the band share is guaranteed, so the
    // banded ground truth IS the plain hamming ground truth
    val plain = (for {
      j <- docs.indices; i <- 0 until j
      if java.lang.Long.bitCount(sigs(i) ^ sigs(j)) <= 3
    } yield (j.toLong, i.toLong)).toSet
    assert(expected === plain)
  }

  test("near-dup bucket state keeps the newest maxPerBucket signatures only") {
    import graft.streaming.StreamNearDup
    import graft.streaming.StreamNearDup.DocSig
    import spark.implicits._
    // 8 identical signatures through one bucket with maxPerBucket=2:
    // each arrival may only match the 2 newest predecessors
    val docs = (0 until 8).map(i => DocSig(i.toLong, i.toLong, 0x123456789ABCDL))
    val hitsDf = StreamNearDup.nearDup(docs.toDS(), maxPerBucket = 2)
    val perDoc = hitsDf.select(col("doc_id"), col("dup_of")).distinct()
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    (2 until 8).foreach { i =>
      assert(perDoc(i.toLong) === Set(i - 1L, i - 2L),
        s"doc $i must match exactly the 2 newest predecessors")
    }
    assert(perDoc(1L) === Set(0L))
  }
}
