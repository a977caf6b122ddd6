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
}
