package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.model.NearEvent

/** The reference pipeline over real `EVENT_JSON:` log lines — shared
  * by batch and Structured Streaming (every stage is a pure
  * `DataFrame => DataFrame`, so the same code runs under both
  * engines; streaming-only pieces live in [[StreamJobs]]).
  *
  * Stage ↔ reference map:
  *  - [[extractEvents]]   ← events.rs:283-350 extract_events
  *  - [[validated]]       ← event_types.rs:8-24 + events.rs:310-340
  *  - [[filterContracts]] ← events.rs:252-281 collect_events filters
  *  - [[flattenNep171]]   ← event_types.rs:42-66 try_flatten_nep171_event
  *  - [[enrichMetadata]]  ← events.rs:198-250 + token.rs get_metadatas,
  *                          re-expressed as a broadcast dim join (the
  *                          reference does per-token RPCs — at 100 TB
  *                          only a join survives)
  *  - [[toKafkaRecords]]  ← events.rs:76-98 send_event (key/topic/value)
  */
object EventStreams {

  import NearEvent._

  /** Log lines → validated event envelopes with emit_info attached.
    *
    * Input schema: (log: String, receipt_id, block_timestamp,
    * block_height, shard_id, contract_account_id) — one row per
    * outcome log line, the Spark-shaped IndexerExecutionOutcome.
    */
  def extractEvents(logs: DataFrame): DataFrame = {
    val payload = expr(s"substring(trim(log), ${EventJsonPrefix.length + 1})")
    logs
      .filter(startswith(trim(col("log")), lit(EventJsonPrefix)))
      .withColumn("payload", trim(payload))
      .withColumn("env", from_json(col("payload"), envelopeSchema))
      .select(
        col("env.standard").as("standard"),
        col("env.version").as("version"),
        col("env.event").as("event"),
        col("payload").as("data"),
        struct(
          col("receipt_id"), col("block_timestamp"), col("block_height"),
          col("shard_id"), col("contract_account_id")).as("emit_info"))
  }

  /** The NEP name-validation predicate (event_types.rs:8-24) — shared
    * by [[validated]], [[extractWithDeadLetter]] and status-column
    * censuses so the split condition can never diverge.
    */
  def isValid: Column =
    col("standard").isNotNull && col("event").isNotNull &&
      col("standard").rlike(NameRegex) && col("event").rlike(NameRegex)

  /** Drop events failing NEP name validation (invalid are logged by
    * the reference; here they're filterable for a dead-letter sink).
    */
  def validated(events: DataFrame): DataFrame =
    events.filter(isValid)

  /** Typed view of the extracted envelope — `Dataset[NearEventRow]`
    * for compile-time field checks in user pipelines.
    */
  def typedEvents(events: DataFrame): org.apache.spark.sql.Dataset[graft.model.NearEventRow] = {
    implicit val enc: org.apache.spark.sql.Encoder[graft.model.NearEventRow] =
      org.apache.spark.sql.Encoders.product[graft.model.NearEventRow]
    events.select(
      col("standard"), col("version"), col("event"), col("data"), col("emit_info")
    ).as[graft.model.NearEventRow]
  }

  /** Valid/invalid split: the reference logs-and-drops invalid events
    * (events.rs:310-340); at scale the scalable analog is a dead-letter
    * frame that routes to its own sink instead of vanishing into logs.
    */
  def extractWithDeadLetter(logs: DataFrame): (DataFrame, DataFrame) = {
    val all = extractEvents(logs)
    (all.filter(isValid),
      all.filter(!isValid || col("standard").isNull || col("event").isNull))
  }

  /** Whitelist/blacklist on contract id; empty list = no constraint. */
  def filterContracts(events: DataFrame, whitelist: Seq[String], blacklist: Seq[String]): DataFrame = {
    val wl = if (whitelist.isEmpty) lit(true)
      else col("emit_info.contract_account_id").isin(whitelist: _*)
    val bl = if (blacklist.isEmpty) lit(true)
      else !col("emit_info.contract_account_id").isin(blacklist: _*)
    events.filter(wl && bl)
  }

  /** event_types.rs:26-34 to_key: contract id, else standard.event. */
  def eventKey: Column =
    coalesce(col("emit_info.contract_account_id"),
      concat_ws(".", col("standard"), col("event")))

  /** event_types.rs:37-40 to_topic. */
  def eventTopic(prefix: String): Column =
    concat_ws(".", lit(prefix), col("standard"), col("event"))

  /** NEP-171 mint/transfer array payloads → one row per element.
    * Non-NEP-171 events pass through unexploded with a null flat slot
    * filtered out (the reference returns an empty vec for those).
    */
  def flattenNep171(events: DataFrame): DataFrame = {
    val isMint = col("standard") === "nep171" && col("event") === "nft_mint"
    val isTransfer = col("standard") === "nep171" && col("event") === "nft_transfer"
    val parsed = events
      .withColumn("mint_arr",
        when(isMint, from_json(get_json_object(col("data"), "$.data"), org.apache.spark.sql.types.ArrayType(mintDataSchema))))
      .withColumn("xfer_arr",
        when(isTransfer, from_json(get_json_object(col("data"), "$.data"), org.apache.spark.sql.types.ArrayType(transferDataSchema))))
    val mints = parsed.filter(isMint)
      .select(col("standard"), col("version"), col("event"), col("emit_info"),
        explode(col("mint_arr")).as("m"))
      .select(col("standard"), col("version"), col("event"), col("emit_info"),
        col("m.owner_id").as("owner_id"),
        lit(null).cast("string").as("old_owner_id"),
        lit(null).cast("string").as("new_owner_id"),
        explode(col("m.token_ids")).as("token_id"),
        col("m.memo").as("memo"))
    val xfers = parsed.filter(isTransfer)
      .select(col("standard"), col("version"), col("event"), col("emit_info"),
        explode(col("xfer_arr")).as("t"))
      .select(col("standard"), col("version"), col("event"), col("emit_info"),
        lit(null).cast("string").as("owner_id"),
        col("t.old_owner_id").as("old_owner_id"),
        col("t.new_owner_id").as("new_owner_id"),
        explode(col("t.token_ids")).as("token_id"),
        col("t.memo").as("memo"))
    mints.unionByName(xfers)
  }

  /** Broadcast-join flat events with a token-metadata dim table keyed
    * (contract_account_id, token_id); derives `_id = contract:token`
    * (token.rs:23-26 build_id) and parses `metadata_extra` from the
    * metadata's JSON `extra` (token.rs:146-155).
    */
  def enrichMetadata(flat: DataFrame, tokens: DataFrame): DataFrame = {
    val t = broadcast(tokens.select(
      col("contract_account_id").as("t_contract"),
      col("token_id").as("t_token"),
      col("title"), col("media"), col("extra")))
    flat.join(t,
        col("emit_info.contract_account_id") === col("t_contract") &&
        col("token_id") === col("t_token"), "left")
      .withColumn("_id",
        concat_ws(":", col("emit_info.contract_account_id"), col("token_id")))
      .withColumn("metadata_extra",
        get_json_object(col("extra"), "$"))
      .drop("t_contract", "t_token")
  }

  /** Kafka-record shape: (key, value JSON, topic) + the catch-all
    * topic fanout (events.rs:148-196 sends every event to both its
    * own topic and `all_topic`).
    */
  def toKafkaRecords(events: DataFrame, prefix: String, allTopic: String): DataFrame = {
    // serialize the stage shape that arrives: the envelope after
    // extract/validate, or the flat per-token record after
    // flatten+enrich (events.rs:198-250 serializes the FLAT event)
    val value = to_json(struct(events.columns.map(col).toSeq: _*))
    // explode over the two destinations rather than unionAll: a union
    // re-evaluates the whole upstream parse pipeline per branch, the
    // explode computes it once and fans out rows
    events.select(
      eventKey.as("key"), value.as("value"),
      explode(array(eventTopic(prefix), lit(allTopic))).as("topic"))
  }

  /** Per-contract ordered delivery (events.rs:147-196 send_events:
    * each contract's group is iterated SEQUENTIALLY in block order,
    * and the metadata sends use FuturesOrdered — events.rs:225-230).
    * Kafka preserves order per (topic, partition) and keyed records
    * land in one partition, so the producer-side obligation is that
    * one contract's records are written by ONE task, consecutively,
    * height-ascending. This transform pins exactly that: a hash
    * repartition on the event key (all of a contract's records in one
    * task = one producer) and a within-task sort on
    * (key, block_height, shard_id, receipt_id). The serialization
    * stages above it are map-only (project + generate), so the
    * ordering survives to the sink untouched. Apply under
    * foreachBatch — streaming DataFrames reject sorts, and the Kafka
    * writer is driven per micro-batch anyway; sequential micro-batches
    * over a height-monotonic source (BlockSource) extend the guarantee
    * across batches.
    */
  def orderedKafkaRecords(events: DataFrame, prefix: String, allTopic: String): DataFrame =
    toKafkaRecords(
      events.repartition(eventKey)
        .sortWithinPartitions(eventKey, col("emit_info.block_height"),
          col("emit_info.shard_id"), col("emit_info.receipt_id")),
      prefix, allTopic)

  /** The metadata-topic delivery (events.rs:168-225
    * send_event_with_metadata): flattened+enriched per-token records
    * go to `<event_topic>_metadata` — a THIRD delivery alongside the
    * specific and catch-all envelope deliveries, not a replacement for
    * them. Input is the [[flattenNep171]]→[[enrichMetadata]] frame;
    * the flat record serializes whole, like the reference's enriched
    * event JSON.
    */
  def metadataRecords(enriched: DataFrame, prefix: String): DataFrame = {
    val value = to_json(struct(enriched.columns.map(col).toSeq: _*))
    enriched.select(
      eventKey.as("key"), value.as("value"),
      concat(eventTopic(prefix), lit("_metadata")).as("topic"))
  }
}
