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
}
