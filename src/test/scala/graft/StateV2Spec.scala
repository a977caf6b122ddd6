package graft
// (Spark 4 state API v2 — transformWithState engine parity + features)

import java.sql.Timestamp
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}
import graft.streaming.{StateV2, StreamJobs}
import graft.streaming.StreamJobs.{RateIn, SessionEvent, SessionOut}

case class TtlIn(k: Long, v: Long)
case class TtlOut(k: Long, n: Long)

/** Per-key event counter whose ValueState expires after `ttlMs` of
  * processing time — the v2 TTL feature under test. Top-level (not
  * nested in the suite) so the processor closure captures no
  * non-serializable outer test class.
  */
class TtlCounter(ttlMs: Long) extends StatefulProcessor[Long, TtlIn, TtlOut] {
  @transient private var n: ValueState[Long] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    n = getHandle.getValueState[Long]("n", Encoders.scalaLong,
      TTLConfig(java.time.Duration.ofMillis(ttlMs)))
  override def handleInputRows(k: Long, rows: Iterator[TtlIn],
      timers: TimerValues): Iterator[TtlOut] = {
    val cur = (if (n.exists()) n.get() else 0L) + rows.size
    n.update(cur)
    Iterator.single(TtlOut(k, cur))
  }
}

class StateV2Spec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  /** Drain a memory-stream query to completion under RocksDB (the v2
    * engine's provider requirement) and return the named table rows.
    */
  private def drain[T](in: MemoryStream[T],
      out: org.apache.spark.sql.DataFrame, name: String,
      batches: Seq[Seq[T]]): Array[org.apache.spark.sql.Row] =
    StateV2.withRocksDb(spark) {
      spark.catalog.dropTempView(name)
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append).start()
      try {
        batches.foreach { b =>
          in.addData(b)
          q.processAllAvailable()
        }
      } finally q.stop()
      spark.table(name).collect()
    }

  test("sessionizeTws output == flatMapGroupsWithState sessionize on the sf feed") {
    implicit val sqlCtx = spark.sqlContext
    val ev = graft.core.Tables.events(spark, sf)
      .select(col("user_id"), col("ts")).as[SessionEvent]
      .collect().sortBy(_.ts.getTime)
    val split = ev(ev.length / 2).ts.getTime
    val (b1, b2) = ev.partition(_.ts.getTime <= split)

    def run(f: org.apache.spark.sql.Dataset[SessionEvent] => org.apache.spark.sql.Dataset[SessionOut],
        name: String): Seq[(Long, Long, Long)] = {
      val in = MemoryStream[SessionEvent]
      drain(in, f(in.toDS()).toDF(), name, Seq(b1.toSeq, b2.toSeq))
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    }

    val v1 = run(StreamJobs.sessionize(_, 600, flushIdle = false), "sess_v1")
    val v2 = run(StateV2.sessionizeTws(_, 600), "sess_v2")
    assert(v1.nonEmpty, "parity base emitted no sessions — feed broken")
    assert(v2 === v1)
  }

  test("v2 engine refuses the heap provider (withRocksDb is load-bearing)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[SessionEvent]
    val out = StateV2.sessionizeTws(in.toDS(), 600)
    // depending on where Spark validates the provider this surfaces at
    // start() or as a StreamingQueryException from the first batch —
    // either way the run must FAIL and name the provider constraint
    val ex = intercept[Throwable] {
      val q = out.writeStream.format("memory").queryName("sess_nope")
        .outputMode(OutputMode.Append).start()
      try { in.addData(SessionEvent(1L, ts(10))); q.processAllAvailable() }
      finally q.stop()
    }
    def chain(t: Throwable): String =
      if (t == null) "" else t.toString + chain(t.getCause)
    val msg = chain(ex).toLowerCase
    assert(msg.contains("rocksdb") || msg.contains("provider") ||
      msg.contains("unsupported"), s"unexpected failure: ${chain(ex)}")
  }

  test("event-time timer flushes an idle key's session when the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[SessionEvent]
    // user 1: two events 10 s apart, then idle; user 2's late event
    // pushes the watermark past user 1's last + gap, so the TIMER
    // closes session (n=2, dur=10) — TimeMode.None would hold it open
    val feed = in.toDS().withWatermark("ts", "1 second")
      .as[SessionEvent]
    val out = StateV2.sessionizeTws(feed, gapSec = 60, timed = true)
    val rows = drain(in, out.toDF(), "sess_timed", Seq(
      Seq(SessionEvent(1L, ts(100)), SessionEvent(1L, ts(110))),
      Seq(SessionEvent(2L, ts(1000))),
      // one more batch so the watermark computed from batch 2 (999 s)
      // is applied and fires user 1's timer at 110 + 60 = 170 s
      Seq(SessionEvent(2L, ts(1001)))))
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows.contains((1L, 2L, 10L)),
      s"idle session not flushed by event-time timer: $rows")
  }

  test("rateLimitTws output == v1 rateLimit including same-timestamp peers") {
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000000000L
    val evs = Seq(
      RateIn(7L, "click", base),
      RateIn(7L, "click", base + 1),
      RateIn(7L, "view", base + 2), // 3rd in window of limit 2 → throttled
      RateIn(7L, "view", base + 2), // same-ts peer decides atomically
      RateIn(8L, "click", base + 5)
    )
    val (b1, b2) = evs.splitAt(3)

    def run(f: org.apache.spark.sql.Dataset[RateIn] => org.apache.spark.sql.Dataset[StreamJobs.RateOut],
        name: String): Seq[(Long, String, Long, Boolean)] = {
      val in = MemoryStream[RateIn]
      drain(in, f(in.toDS()).toDF(), name, Seq(b1, b2))
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
        .toSeq.sorted
    }

    val v1 = run(StreamJobs.rateLimit(_, limit = 2, windowUs = 100L), "rate_v1")
    val v2 = run(StateV2.rateLimitTws(_, limit = 2, windowUs = 100L), "rate_v2")
    assert(v1.nonEmpty && v2 === v1)
  }

  test("firstSeenTws emits each (user, type) pair once across batches, at its min t") {
    implicit val sqlCtx = spark.sqlContext
    import StateV2.TypedEvent
    val in = MemoryStream[TypedEvent]
    val rows = drain(in, StateV2.firstSeenTws(in.toDS()).toDF(), "fs_v2", Seq(
      Seq(TypedEvent(1L, "click", 30), TypedEvent(1L, "click", 10),
        TypedEvent(2L, "view", 40)),
      // re-delivery of (1, click) and a genuinely new pair
      Seq(TypedEvent(1L, "click", 50), TypedEvent(1L, "view", 60))))
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq.sorted
    assert(rows === Seq((1L, "click", 10L), (1L, "view", 60L), (2L, "view", 40L)))
  }

  test("state TTL expires idle ValueState between batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[TtlIn]
    val out = in.toDS().groupByKey(_.k)
      .transformWithState[TtlOut](new TtlCounter(500),
        TimeMode.ProcessingTime(), OutputMode.Append())
    // batch 1 counts to 1; after > ttl of wall time the state has
    // expired, so batch 2 restarts at 1 instead of reaching 2.
    // ProcessingTime mode keeps scheduling TTL-eviction batches, so
    // processAllAvailable never settles — poll the sink instead.
    val rows = StateV2.withRocksDb(spark) {
      spark.catalog.dropTempView("ttl_v2")
      val q = out.toDF().writeStream.format("memory").queryName("ttl_v2")
        .outputMode(OutputMode.Append).start()
      def awaitRows(n: Int): Unit = {
        val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
        while (spark.table("ttl_v2").count() < n) {
          assert(System.nanoTime() < deadline, s"sink never reached $n rows")
          Thread.sleep(100)
        }
      }
      try {
        in.addData(TtlIn(1L, 1)); awaitRows(1)
        Thread.sleep(1200)
        in.addData(TtlIn(1L, 1)); awaitRows(2)
      } finally q.stop()
      spark.table("ttl_v2").collect()
    }.map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows === Seq((1L, 1L), (1L, 1L)),
      s"TTL did not expire the counter: $rows")
  }
}
