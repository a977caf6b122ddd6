package graft
// (offline checkpoint state inspection — Spark 4 state data source)

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.{StateInspect, StateV2, StreamJobs}
import graft.streaming.StreamJobs.ChangeIn

class StateInspectSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-si-$tag").toString

  test("statestore source reads a v1 (flatMapGroupsWithState) checkpoint's per-key state") {
    implicit val sqlCtx = spark.sqlContext
    val dir = tmpDir("v1")
    val in = MemoryStream[ChangeIn]
    val q = StreamJobs.streamCompact(in.toDS()).writeStream
      .format("parquet").option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        ChangeIn(1L, 10L, 0L, "set", Some(1.0)),
        ChangeIn(1L, 20L, 1L, "set", Some(2.0)),
        ChangeIn(2L, 10L, 2L, "set", Some(9.0)))
      q.processAllAvailable()
    } finally q.stop()

    val meta = StateInspect.metadata(spark, s"$dir/ckpt")
    assert(meta.count() === 1)
    assert(meta.select("operatorName").as[String].head()
      .contains("flatMapGroupsWithState"))

    // per-key state = the latest (ts, off) record per key (the v1
    // source nests the user state under value.groupState)
    val st = StateInspect.state(spark, s"$dir/ckpt")
      .select(col("key.value").as("k"),
        col("value.groupState.ts").as("ts"),
        col("value.groupState.v").as("v"))
      .as[(Long, Long, Double)].collect().toSeq.sorted
    assert(st === Seq((1L, 20L, 2.0), (2L, 10L, 9.0)))
  }

  test("statestore source reads a v2 (transformWithState) state variable by name") {
    implicit val sqlCtx = spark.sqlContext
    val dir = tmpDir("v2")
    val in = MemoryStream[StreamJobs.SessionEvent]
    StateV2.withRocksDb(spark) {
      val q = StateV2.sessionizeTws(in.toDS(), gapSec = 600).toDF()
        .writeStream
        .format("parquet").option("path", s"$dir/out")
        .option("checkpointLocation", s"$dir/ckpt")
        .outputMode(OutputMode.Append).start()
      try {
        in.addData(
          StreamJobs.SessionEvent(7L, new java.sql.Timestamp(100 * 1000L)),
          StreamJobs.SessionEvent(7L, new java.sql.Timestamp(110 * 1000L)),
          StreamJobs.SessionEvent(8L, new java.sql.Timestamp(500 * 1000L)))
        q.processAllAvailable()
      } finally q.stop()
    }

    val meta = StateInspect.metadata(spark, s"$dir/ckpt")
    assert(meta.select("operatorName").as[String].head()
      .contains("transformWithState"))

    // the "session" ValueState holds each user's open session
    val st = StateInspect.state(spark, s"$dir/ckpt",
        stateVar = Some("session"))
      .select(col("key.value").as("user"),
        col("value.start").as("start"), col("value.last").as("last"),
        col("value.n").as("n"))
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    assert(st === Seq((7L, 100L, 110L, 2L), (8L, 500L, 500L, 1L)))
  }

  test("v1→v2 migration: dumped v1 state seeds a v2 run that continues emission-for-emission") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamJobs.{SessionEvent, SessionState, SessionOut}
    def ev(u: Long, sec: Long) = SessionEvent(u, new java.sql.Timestamp(sec * 1000L))
    val gap = 100L
    val batch1 = Seq(ev(1, 0), ev(1, 50), ev(2, 0))
    val batch2 = Seq(ev(1, 500), ev(2, 60), ev(3, 10))

    // 1) the v1 job processes batch1 and stops (checkpointed)
    val dir = tmpDir("mig")
    val in1 = MemoryStream[SessionEvent]
    val q1 = StreamJobs.sessionize(in1.toDS(), gap, flushIdle = false)
      .toDF().writeStream
      .format("parquet").option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode(OutputMode.Append).start()
    try { in1.addData(batch1); q1.processAllAvailable() } finally q1.stop()
    val batch1Emissions = spark.read
      .schema(implicitly[org.apache.spark.sql.Encoder[SessionOut]].schema)
      .parquet(s"$dir/out").as[SessionOut].collect().toSeq
    assert(batch1Emissions.isEmpty) // all three sessions still open

    // 2) dump its per-key state offline
    val dumped = StateInspect.state(spark, s"$dir/ckpt")
      .select(col("key.value").as("_1"),
        col("value.groupState.start").as("start"),
        col("value.groupState.last").as("last"),
        col("value.groupState.n").as("n"))
      .select(col("_1"), struct(col("start"), col("last"), col("n")).as("_2"))
      .as[(Long, SessionState)]
    assert(dumped.count() === 2) // users 1 and 2 hold open sessions

    // 3) a v2 job seeded with the dump processes batch2 only
    val in2 = MemoryStream[SessionEvent]
    val migrated = StateV2.withRocksDb(spark) {
      spark.catalog.dropTempView("mig_v2")
      val q = StateV2.sessionizeTwsFrom(in2.toDS(), dumped, gap).toDF()
        .writeStream.format("memory").queryName("mig_v2")
        .outputMode(OutputMode.Append).start()
      try { in2.addData(batch2); q.processAllAvailable() } finally q.stop()
      spark.table("mig_v2").as[SessionOut].collect().toSeq.sortBy(_.user_id)
    }

    // 4) reference: an uninterrupted v1 run over both batches
    val in3 = MemoryStream[SessionEvent]
    spark.catalog.dropTempView("mig_ref")
    val q3 = StreamJobs.sessionize(in3.toDS(), gap, flushIdle = false)
      .toDF().writeStream.format("memory").queryName("mig_ref")
      .outputMode(OutputMode.Append).start()
    try {
      in3.addData(batch1); q3.processAllAvailable()
      in3.addData(batch2); q3.processAllAvailable()
    } finally q3.stop()
    val reference = spark.table("mig_ref").as[SessionOut]
      .collect().toSeq.sortBy(_.user_id)

    // user 1's first session (2 events, 50 s) closes in batch2; the
    // migrated v2 run emits exactly what the never-stopped v1 run does
    assert(reference === Seq(SessionOut(1L, 2L, 50L)))
    assert(migrated === reference)
  }
}
