package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventStreams

class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  private def logRow(log: String, contract: String = "nft.example.near") =
    (log, "rcpt1", 1700000000000L, 1234L, 0L, contract)

  private val mintLog =
    """EVENT_JSON:{"standard":"nep171","version":"1.0.0","event":"nft_mint","data":[{"owner_id":"alice.near","token_ids":["1:1","1:2"]},{"owner_id":"bob.near","token_ids":["2:1"]}]}"""
  private val transferLog =
    """EVENT_JSON:{"standard":"nep171","version":"1.0.0","event":"nft_transfer","data":[{"old_owner_id":"alice.near","new_owner_id":"bob.near","token_ids":["1:1"]}]}"""
  private val genericLog =
    """EVENT_JSON:{"standard":"ft_exchange","version":"2.0.0","event":"swap","data":{"amount":42}}"""
  private val invalidNameLog =
    """EVENT_JSON:{"standard":"bad standard!","version":"1.0.0","event":"x","data":{}}"""
  private val nonEventLog = "plain log line, not an event"

  private def logs = Seq(
    logRow(mintLog), logRow(transferLog), logRow(genericLog, "dex.near"),
    logRow(invalidNameLog), logRow(nonEventLog), logRow("  " + mintLog + "  "))
    .toDF("log", "receipt_id", "block_timestamp", "block_height", "shard_id", "contract_account_id")

  test("extractEvents keeps only EVENT_JSON lines and attaches emit_info") {
    val ev = EventStreams.extractEvents(logs)
    assert(ev.count() === 5) // all but the plain line (incl. padded dup)
    val first = ev.filter(col("event") === "swap").head
    assert(first.getAs[org.apache.spark.sql.Row]("emit_info")
      .getAs[String]("contract_account_id") === "dex.near")
  }

  test("validated drops events failing the NEP name regex") {
    val ev = EventStreams.validated(EventStreams.extractEvents(logs))
    assert(ev.count() === 4)
    assert(ev.filter(col("standard") === "bad standard!").count() === 0)
  }

  test("filterContracts applies white/blacklists like collect_events") {
    val ev = EventStreams.validated(EventStreams.extractEvents(logs))
    assert(EventStreams.filterContracts(ev, Seq("dex.near"), Nil).count() === 1)
    assert(EventStreams.filterContracts(ev, Nil, Seq("dex.near")).count() === 3)
    assert(EventStreams.filterContracts(ev, Nil, Nil).count() === 4)
  }

  test("flattenNep171 explodes mint/transfer arrays per token like try_flatten") {
    val ev = EventStreams.validated(EventStreams.extractEvents(logs))
      .dropDuplicates("standard", "event", "data")
    val flat = EventStreams.flattenNep171(ev)
    // mint: alice 2 tokens + bob 1; transfer: 1 token
    assert(flat.count() === 4)
    assert(flat.filter(col("event") === "nft_mint").count() === 3)
    assert(flat.filter(col("owner_id") === "alice.near").count() === 2)
    val x = flat.filter(col("event") === "nft_transfer").head
    assert(x.getAs[String]("new_owner_id") === "bob.near")
    assert(x.getAs[String]("token_id") === "1:1")
  }

  test("enrichMetadata broadcast-joins token metadata and derives _id") {
    val ev = EventStreams.validated(EventStreams.extractEvents(logs))
      .dropDuplicates("standard", "event", "data")
    val flat = EventStreams.flattenNep171(ev)
    val tokens = Seq(
      ("nft.example.near", "1:1", "Token One", "ipfs://x", """{"rarity":"epic"}"""))
      .toDF("contract_account_id", "token_id", "title", "media", "extra")
    val enriched = EventStreams.enrichMetadata(flat, tokens)
    assert(enriched.count() === 4)
    val hit = enriched.filter(col("title").isNotNull)
    assert(hit.count() === 2) // mint 1:1 and transfer 1:1
    assert(hit.head.getAs[String]("_id") === "nft.example.near:1:1")
    assert(enriched.filter(col("token_id") === "2:1").head.getAs[String]("title") == null)
  }

  test("typedEvents gives a compile-time-checked Dataset[NearEventRow]") {
    val ev = EventStreams.typedEvents(
      EventStreams.validated(EventStreams.extractEvents(logs)))
    val mints = ev.filter(_.event == "nft_mint")
      .map(e => e.emit_info.contract_account_id)(
        org.apache.spark.sql.Encoders.STRING)
    assert(mints.collect().toSet === Set("nft.example.near"))
  }

  test("toKafkaRecords emits per-event topic + catch-all fanout") {
    val ev = EventStreams.validated(EventStreams.extractEvents(logs))
    val recs = EventStreams.toKafkaRecords(ev, "near.events", "near.events.all")
    assert(recs.count() === ev.count() * 2)
    assert(recs.filter(col("topic") === "near.events.all").count() === ev.count())
    assert(recs.filter(col("topic") === "near.events.nep171.nft_mint").count() === 2)
    // key = contract id when emit_info present (to_key)
    assert(recs.filter(col("key") === "nft.example.near").count() > 0)
  }
}
