package graft.model

import org.apache.spark.sql.types._

/** Data model mirroring the reference's event types
  * (/root/reference/src/event_types.rs, token.rs) as Spark schemas +
  * case classes.
  *
  * `data` is kept as a JSON string at the envelope level (the
  * reference's `EventData::Generic`); NEP-171 payloads additionally
  * parse into typed arrays for flattening. This keeps the envelope
  * schema stable while allowing standard-specific projection — the
  * Spark-idiomatic version of Rust's untagged enum.
  */
object NearEvent {

  /** event_types.rs:69-76 EmitInfo. */
  val emitInfoSchema: StructType = StructType(Seq(
    StructField("receipt_id", StringType),
    StructField("block_timestamp", LongType),
    StructField("block_height", LongType),
    StructField("shard_id", LongType),
    StructField("contract_account_id", StringType)))

  /** token.rs:51-66 TokenMetadata (subset actually used by NEP-171). */
  val tokenMetadataSchema: StructType = StructType(Seq(
    StructField("title", StringType),
    StructField("description", StringType),
    StructField("media", StringType),
    StructField("copies", LongType),
    StructField("extra", StringType),
    StructField("reference", StringType),
    StructField("collection_id", StringType)))

  /** event_types.rs:96-106 Nep171MintData (pre-enrichment fields). */
  val mintDataSchema: StructType = StructType(Seq(
    StructField("owner_id", StringType),
    StructField("token_ids", ArrayType(StringType)),
    StructField("memo", StringType)))

  /** event_types.rs:108-120 Nep171TransferData. */
  val transferDataSchema: StructType = StructType(Seq(
    StructField("authorized_id", StringType),
    StructField("old_owner_id", StringType),
    StructField("new_owner_id", StringType),
    StructField("token_ids", ArrayType(StringType)),
    StructField("memo", StringType)))

  /** Envelope: event_types.rs:13-23 NearEvent with `data` kept raw. */
  val envelopeSchema: StructType = StructType(Seq(
    StructField("standard", StringType),
    StructField("version", StringType),
    StructField("event", StringType)))

  /** event_types.rs:8-10 — validation regexes for standard/event. */
  val NameRegex = "^[a-zA-Z0-9._-]+$"

  /** events.rs:286 — the log-line marker. */
  val EventJsonPrefix = "EVENT_JSON:"
}

/** Typed rows for Dataset use. */
case class EmitInfo(
    receipt_id: String,
    block_timestamp: Long,
    block_height: Long,
    shard_id: Long,
    contract_account_id: String)

case class NearEventRow(
    standard: String,
    version: String,
    event: String,
    data: String,
    emit_info: EmitInfo)

case class TokenRow(
    contract_account_id: String,
    token_id: String,
    title: String,
    media: String,
    extra: String)
