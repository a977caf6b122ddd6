package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventStreams

class BlockSourceSpec extends SparkSpec {

  private def blocks = spark.read
    .format("graft.sources.BlockSource")
    .option("startHeight", 5000).option("numBlocks", 20)
    .option("logsPerBlock", 9).option("numPartitions", 3)
    .load()

  test("DSv2 block source produces the configured deterministic range") {
    assert(blocks.count() === 20 * 9)
    assert(blocks.select(min(col("block_height")), max(col("block_height")))
      .head.toSeq === Seq(5000L, 5019L))
    assert(blocks.rdd.getNumPartitions === 3)
  }

  test("block source feeds the event pipeline end-to-end") {
    val events = EventStreams.validated(EventStreams.extractEvents(blocks))
    assert(events.count() === 20 * 3) // every 3rd log is an event
    val flat = EventStreams.flattenNep171(events)
    assert(flat.count() === events.count()) // one token per mint
    assert(flat.filter(col("token_id") === "5000:0").count() === 1)
  }

  test("streaming block source resumes from the checkpoint without duplication") {
    // the sync-from-interruption claim: stop after the first batch,
    // restart with the same checkpoint, and the union of both runs is
    // exactly-once over the full chain
    // memory sinks refuse checkpoint recovery — use the fault-tolerant
    // parquet sink, whose committed output is the exactly-once record
    val base = java.nio.file.Files.createTempDirectory("graft-blocks-resume").toString
    val chk = s"$base/chk"; val out = s"$base/out"
    def reader = spark.readStream
      .format("graft.sources.BlockSource")
      .option("startHeight", 7000).option("numBlocks", 30)
      .option("logsPerBlock", 4).option("numPartitions", 2)
      .option("blocksPerBatch", 10)
      .load()
    // run 1: exactly one micro-batch (Trigger.Once semantics), then stop
    val q1 = reader.writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", chk)
      .trigger(org.apache.spark.sql.streaming.Trigger.Once()).start()
    q1.awaitTermination()
    val part1 = spark.read.parquet(out)
      .select(col("block_height"), col("receipt_id")).collect().toSet
    assert(part1.nonEmpty && part1.size < 30 * 4, s"run 1 drained ${part1.size}")
    // run 2: same checkpoint → resumes at the committed height and drains
    val q2 = reader.writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", chk)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q2.awaitTermination()
    val all = spark.read.parquet(out)
      .select(col("block_height"), col("receipt_id")).collect()
    assert(all.length === 30 * 4, s"expected exactly-once ${30 * 4}, got ${all.length}")
    assert(all.toSet.size === 30 * 4)
    assert(all.map(_.getLong(0)).min === 7000L && all.map(_.getLong(0)).max === 7029L)
  }

  test("streaming block source drains the chain in height-bounded micro-batches") {
    val q = spark.readStream
      .format("graft.sources.BlockSource")
      .option("startHeight", 5000).option("numBlocks", 40)
      .option("logsPerBlock", 6).option("numPartitions", 3)
      .option("blocksPerBatch", 10)
      .load()
      .writeStream.format("memory").queryName("graft_blocks_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val rows = spark.table("graft_blocks_stream")
    assert(rows.count() === 40L * 6)
    assert(rows.select(min(col("block_height")), max(col("block_height")))
      .head.toSeq === Seq(5000L, 5039L))
    // no height delivered twice, and admission control actually split
    // the drain into multiple 10-block batches
    assert(rows.select(col("block_height"), col("receipt_id")).distinct().count() === 40L * 6)
    assert(q.recentProgress.count(_.numInputRows > 0) >= 4, {
      q.recentProgress.map(p => p.numInputRows).mkString(",")
    })
    // the streamed frame drives the same pipeline as the batch read
    val events = EventStreams.validated(
      EventStreams.extractEvents(spark.table("graft_blocks_stream")))
    assert(events.count() === 40 * 2) // logs 0 and 3 of 6 are events
  }
}
