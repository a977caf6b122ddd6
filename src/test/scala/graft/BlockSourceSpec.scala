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
