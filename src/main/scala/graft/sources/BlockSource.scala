package graft.sources

import java.util
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/** DataSource V2 stand-in for the reference's block source.
  *
  * near-event-streams consumes `near_indexer::StreamerMessage`s — a
  * stream of blocks, each carrying shard execution outcomes with log
  * lines (main.rs listen_blocks, events.rs store_events). In Spark the
  * equivalent ingress is a TableProvider: this one synthesizes a
  * deterministic block range, split into one partition per height
  * band, so `spark.read.format("graft.sources.BlockSource")` yields
  * the same (log, emit-info) shape [[graft.streaming.EventStreams]]
  * consumes. Options: `startHeight`, `numBlocks`, `logsPerBlock`,
  * `numPartitions`.
  *
  * Every N-th log is a valid `EVENT_JSON:` NEP-171 mint, the rest are
  * plain log noise — mirroring real chains where most receipt logs
  * are not events.
  */
class BlockSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    BlockSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new BlockTable(new CaseInsensitiveStringMap(properties))
}

object BlockSource {
  val schema: StructType = StructType(Seq(
    StructField("log", StringType, nullable = false),
    StructField("receipt_id", StringType, nullable = false),
    StructField("block_timestamp", LongType, nullable = false),
    StructField("block_height", LongType, nullable = false),
    StructField("shard_id", LongType, nullable = false),
    StructField("contract_account_id", StringType, nullable = false)))

  /** Deterministic log line for (height, idx): every 3rd is an event. */
  def logLine(height: Long, idx: Int): String =
    if (idx % 3 == 0)
      s"""EVENT_JSON:{"standard":"nep171","version":"1.0.0","event":"nft_mint","data":[{"owner_id":"owner$idx.near","token_ids":["$height:$idx"]}]}"""
    else s"executed receipt $height/$idx"
}

private class BlockTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "graft_blocks"
  override def schema(): StructType = BlockSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = new util.HashMap[String, String](options.asCaseSensitiveMap())
    merged.putAll(opts.asCaseSensitiveMap())
    new BlockScanBuilder(new CaseInsensitiveStringMap(merged))
  }
}

private class BlockScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with Scan with Batch {
  private val start = options.getLong("startHeight", 1000L)
  private val n = options.getLong("numBlocks", 100L)
  private val logsPerBlock = options.getInt("logsPerBlock", 10)
  private val parts = options.getInt("numPartitions", 4)

  override def build(): Scan = this
  override def readSchema(): StructType = BlockSource.schema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    BlockRange.split(start, start + n, parts, logsPerBlock)

  override def createReaderFactory(): PartitionReaderFactory = new BlockReaderFactory

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new BlockMicroBatchStream(start, start + n, logsPerBlock, parts,
      options.getLong("blocksPerBatch", 25L))
}

private case class BlockRange(from: Long, until: Long, logsPerBlock: Int) extends InputPartition

private object BlockRange {
  def split(from: Long, until: Long, parts: Int, logsPerBlock: Int): Array[InputPartition] = {
    val n = until - from
    val per = math.max(1L, (n + parts - 1) / parts)
    (0 until parts).iterator
      .map(i => BlockRange(from + i * per, math.min(from + (i + 1) * per, until), logsPerBlock))
      .filter(r => r.from < r.until)
      .map(_.asInstanceOf[InputPartition]).toArray
  }
}

/** Height offset for the streaming block source: the chain position IS
  * the offset, exactly the reference's sync-mode coordinate
  * (configs.rs SyncModeSubCommand — from-interruption = checkpointed
  * offset, from-block --height = `startHeight` option).
  */
private case class HeightOffset(h: Long) extends Offset {
  override def json: String = h.toString
}

/** MicroBatchStream over the synthetic chain: each batch admits at
  * most `blocksPerBatch` heights ([[SupportsAdmissionControl]]), the
  * batch's height range splits into the same [[BlockRange]] partitions
  * the batch scan uses, and Trigger.AvailableNow drains to the chain
  * tip then stops ([[SupportsTriggerAvailableNow]]). Restarting from a
  * checkpoint resumes at the committed height — the reference's
  * sync-from-interruption.
  */
private class BlockMicroBatchStream(
    start: Long, endOfChain: Long, logsPerBlock: Int, parts: Int, perBatch: Long)
  extends MicroBatchStream with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  override def initialOffset(): Offset = HeightOffset(start)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(startOffset: Offset, limit: ReadLimit): Offset = {
    val from = startOffset.asInstanceOf[HeightOffset].h
    HeightOffset(math.min(from + perBatch, endOfChain))
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException("use latestOffset(start, limit)")

  override def reportLatestOffset(): Offset = HeightOffset(endOfChain)

  override def prepareForTriggerAvailableNow(): Unit = ()

  override def planInputPartitions(startOff: Offset, endOff: Offset): Array[InputPartition] =
    BlockRange.split(
      startOff.asInstanceOf[HeightOffset].h,
      endOff.asInstanceOf[HeightOffset].h,
      parts, logsPerBlock)

  override def createReaderFactory(): PartitionReaderFactory = new BlockReaderFactory

  override def deserializeOffset(json: String): Offset = HeightOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private class BlockReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[BlockRange]
    new PartitionReader[InternalRow] {
      private var h = r.from
      private var i = -1
      override def next(): Boolean = {
        i += 1
        if (i >= r.logsPerBlock) { i = 0; h += 1 }
        h < r.until
      }
      override def get(): InternalRow = InternalRow(
        UTF8String.fromString(BlockSource.logLine(h, i)),
        UTF8String.fromString(s"r$h-$i"),
        h * 1000000L,
        h,
        (i % 4).toLong,
        UTF8String.fromString(s"contract${i % 5}.near"))
      override def close(): Unit = ()
    }
  }
}
