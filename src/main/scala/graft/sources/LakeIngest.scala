package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reader for the real NEAR indexer/lake `StreamerMessage` JSON shape.
  *
  * The reference consumes `near_indexer::StreamerMessage` structs
  * (main.rs:113-141 listen_blocks) and walks
  * `shards[].receipt_execution_outcomes[].execution_outcome.outcome
  * .logs[]` with the block header's height/timestamp and the
  * receipt's id/receiver attached (events.rs:102-145 store_events +
  * events.rs:297-320 extract_events). The same struct is what NEAR
  * Lake publishes as one JSON document per block, so a file of those
  * documents (JSONL) is the batch-ingestable twin of the reference's
  * live stream.
  *
  * This module is that ingest: [[streamerSchema]] types exactly the
  * fields the reference reads (from_json ignores the many extra
  * fields a real lake document carries — chunks, state changes,
  * validator proposals — which is the columnar analog of serde's
  * ignored fields), and [[outcomeLogs]] is the triple unnest that
  * turns one block document into one row per outcome log line, in the
  * `(log, receipt_id, block_timestamp, block_height, shard_id,
  * contract_account_id)` shape [[graft.streaming.EventStreams]]
  * consumes. Scale note: the explode chain is map-side only — no
  * shuffle between "read block JSON" and "extracted event rows", so
  * ingest parallelism is exactly file-split parallelism.
  */
object LakeIngest {

  /** The subset of `near_indexer::StreamerMessage` the reference
    * reads (field names are the public serde/JSON spelling).
    */
  private val headerType = StructType(Seq(
    StructField("height", LongType),
    StructField("hash", StringType),
    StructField("prev_hash", StringType),
    StructField("timestamp", LongType),
    StructField("timestamp_nanosec", StringType)))

  private val receiptType = StructType(Seq(
    StructField("predecessor_id", StringType),
    StructField("receipt_id", StringType),
    StructField("receiver_id", StringType)))

  private val outcomeType = StructType(Seq(
    StructField("executor_id", StringType),
    StructField("gas_burnt", LongType),
    StructField("logs", ArrayType(StringType))))

  private val executionOutcomeType = StructType(Seq(
    StructField("id", StringType),
    StructField("outcome", outcomeType)))

  private val outcomeWithReceiptType = StructType(Seq(
    StructField("receipt", receiptType),
    StructField("execution_outcome", executionOutcomeType)))

  private val shardType = StructType(Seq(
    StructField("shard_id", LongType),
    StructField("receipt_execution_outcomes", ArrayType(outcomeWithReceiptType))))

  val streamerSchema: StructType = StructType(Seq(
    StructField("block", StructType(Seq(
      StructField("author", StringType),
      StructField("header", headerType)))),
    StructField("shards", ArrayType(shardType))))

  /** One StreamerMessage JSON per row → one row per outcome log line.
    *
    * Mirrors store_events/extract_events: height+timestamp come from
    * the block header (events.rs:110-111), shard_id from the shard
    * (events.rs:271-274), receipt_id/receiver from the outcome's
    * receipt (events.rs:304-310). The prefix filter and envelope
    * parse stay in [[graft.streaming.EventStreams.extractEvents]] so
    * live (Kafka/BlockSource) and lake ingests share one code path.
    */
  def outcomeLogs(messages: DataFrame, json: Column): DataFrame =
    messages
      .select(from_json(json, streamerSchema).as("m"))
      .select(
        col("m.block.header.height").as("block_height"),
        col("m.block.header.timestamp").as("block_timestamp"),
        explode(col("m.shards")).as("shard"))
      .select(
        col("block_height"), col("block_timestamp"),
        col("shard.shard_id").as("shard_id"),
        explode(col("shard.receipt_execution_outcomes")).as("o"))
      .select(
        col("block_height"), col("block_timestamp"), col("shard_id"),
        col("o.receipt.receipt_id").as("receipt_id"),
        col("o.receipt.receiver_id").as("contract_account_id"),
        explode(col("o.execution_outcome.outcome.logs")).as("log"))
      .select("log", "receipt_id", "block_timestamp", "block_height",
        "shard_id", "contract_account_id")

  /** Batch read of a NEAR-Lake-layout directory/file of JSONL block
    * documents. `spark.read.text` (not `spark.read.json`) so the
    * schema is pinned to [[streamerSchema]] rather than inferred per
    * file — at 100 TB an inference pass over the corpus is a full
    * extra scan.
    */
  def readJsonl(spark: SparkSession, path: String): DataFrame =
    outcomeLogs(spark.read.text(path), col("value"))

  /** Streaming twin — same parse, `readStream` file source. */
  def readJsonlStream(spark: SparkSession, path: String): DataFrame =
    outcomeLogs(spark.readStream.text(path), col("value"))
}
