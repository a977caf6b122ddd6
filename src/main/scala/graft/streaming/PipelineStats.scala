package graft.streaming

import java.util.concurrent.atomic.{AtomicLong, AtomicReference}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Observability analog of the reference's stats loop
  * (stats.rs:7-73 `Stats` + `stats_logger`, wired in main.rs:111-143):
  * a process-wide gauge of work done / in flight plus a human log line
  * in the reference's exact shape
  * (`# <last> | Blocks processing: <n> | Blocks done: <n>. Bps <r> b/s`).
  *
  * On Spark the unit of work is a query execution (batch) or a
  * micro-batch (streaming) instead of a block, so the listener counts
  * those: registered on a session's [[QueryExecutionListener]] bus it
  * sees every action's completion with its duration; the in-flight
  * gauge comes from the SparkListener job events (jobs started minus
  * jobs ended — the `block_heights_processing` set analog).
  *
  * Rates are computed between snapshots exactly like the reference's
  * logger (stats.rs:36-38 keeps `prev_blocks_processed_count` and
  * divides by the interval), so a caller polling [[statsLine]] every
  * 10 s reproduces the reference's cadence. All state is atomic — the
  * listener bus invokes callbacks from its own thread.
  */
object PipelineStats {

  /** One completed execution (the "block processed" event). */
  final case class Done(name: String, durationMs: Long, rows: Option[Long])

  /** Point-in-time view, comparable across polls for rates. */
  final case class Snapshot(
      done: Long, failed: Long, inFlight: Long,
      rowsOut: Long, lastDurationMs: Long, atMs: Long) {

    /** stats.rs:36-56: work/sec since `prev`, and the reference's log
      * line. `last` stands in for the last-processed height.
      */
    def ratePerSec(prev: Snapshot): Double = {
      val dt = (atMs - prev.atMs) / 1000.0
      if (dt <= 0) 0.0 else (done - prev.done) / dt
    }
    def statsLine(prev: Snapshot, last: String = ""): String =
      f"# $last | Blocks processing: $inFlight | Blocks done: $done. " +
        f"Bps ${ratePerSec(prev)}%.2f b/s"
  }

  final class Listener extends QueryExecutionListener {
    private val nDone = new AtomicLong(0)
    private val nFailed = new AtomicLong(0)
    private val nRows = new AtomicLong(0)
    private val lastMs = new AtomicLong(0)
    private val lastDone = new AtomicReference[Done](null)
    // jobs started − ended, maintained by the SparkListener half
    private[PipelineStats] val jobsInFlight = new AtomicLong(0)

    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
      val rows = qe.executedPlan.metrics.get("numOutputRows").map(_.value)
      nDone.incrementAndGet()
      rows.foreach(nRows.addAndGet)
      lastMs.set(durationNs / 1000000L)
      lastDone.set(Done(funcName, durationNs / 1000000L, rows))
    }

    override def onFailure(funcName: String, qe: QueryExecution, error: Exception): Unit = {
      nFailed.incrementAndGet()
    }

    def last: Option[Done] = Option(lastDone.get)
    def snapshot(): Snapshot = Snapshot(
      nDone.get, nFailed.get, jobsInFlight.get,
      nRows.get, lastMs.get, System.currentTimeMillis())
  }

  /** Register a fresh listener pair on the session: query completions
    * via the listener manager, the in-flight gauge via a SparkListener
    * on job start/end. Returns the listener for polling; remove with
    * [[unregister]] (long-lived sessions otherwise accumulate one
    * listener per call, like any listener bus).
    */
  def register(spark: SparkSession): Listener = {
    val l = new Listener
    spark.listenerManager.register(l)
    val jobs = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(s: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        l.jobsInFlight.incrementAndGet()
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        l.jobsInFlight.decrementAndGet()
    }
    sparkListeners.put(l, (spark, jobs))
    spark.sparkContext.addSparkListener(jobs)
    l
  }

  def unregister(l: Listener): Unit =
    Option(sparkListeners.remove(l)).foreach { case (spark, jobs) =>
      spark.listenerManager.unregister(l)
      spark.sparkContext.removeSparkListener(jobs)
    }

  private val sparkListeners =
    new java.util.concurrent.ConcurrentHashMap[
      Listener, (SparkSession, org.apache.spark.scheduler.SparkListener)]()

  /** The CONTINUOUS half of the stats loop: the reference's logger
    * reports per-interval progress of an always-on pipeline, which on
    * Spark is a streaming query's micro-batch progress events. Counts
    * batches (the "block" unit of a streaming run), input rows, and
    * the engine-reported processing rate; active = queries started
    * minus terminated (the in-flight gauge for streams).
    */
  final class StreamListener
      extends org.apache.spark.sql.streaming.StreamingQueryListener {
    import org.apache.spark.sql.streaming.StreamingQueryListener._
    private val nBatches = new AtomicLong(0)
    private val nRows = new AtomicLong(0)
    private val nActive = new AtomicLong(0)
    private val lastRate = new AtomicReference[java.lang.Double](0.0)

    override def onQueryStarted(e: QueryStartedEvent): Unit =
      nActive.incrementAndGet()
    override def onQueryProgress(e: QueryProgressEvent): Unit = {
      nBatches.incrementAndGet()
      nRows.addAndGet(e.progress.numInputRows)
      val r = e.progress.processedRowsPerSecond
      if (!r.isNaN) lastRate.set(r)
    }
    override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
      nActive.decrementAndGet()

    def snapshot(): Snapshot = Snapshot(
      nBatches.get, 0, nActive.get, nRows.get,
      0, System.currentTimeMillis())
    def rowsPerSec: Double = lastRate.get
  }

  /** Register the streaming-progress listener; remove with
    * [[unregisterStream]].
    */
  def registerStream(spark: SparkSession): StreamListener = {
    val l = new StreamListener
    spark.streams.addListener(l)
    streamSessions.put(l, spark)
    l
  }

  def unregisterStream(l: StreamListener): Unit =
    Option(streamSessions.remove(l)).foreach(_.streams.removeListener(l))

  private val streamSessions =
    new java.util.concurrent.ConcurrentHashMap[StreamListener, SparkSession]()
}
