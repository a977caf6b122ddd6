package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.util.concurrent.atomic.AtomicInteger

/** End-to-end EFFECTIVE exactly-once for the durable upsert path:
  * Structured Streaming guarantees at-least-once foreachBatch
  * delivery (a batch whose sink ran but whose commit didn't land is
  * REPLAYED on restart), so the store converges iff the sink is
  * idempotent under batch replay. ev50 claims that composition;
  * these tests drive it through the two failure modes a cluster
  * actually sees — a clean stop/restart with new data, and a crash
  * AFTER the sink applied a batch but BEFORE the checkpoint commit —
  * and gate the surviving store against the batch latest-version-wins
  * oracle over all input.
  */
class StreamRestartSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_${name}_").toString

  private def writeFeed(dir: String, rows: Seq[(Long, Long, String, Boolean)]): Unit =
    rows.toDF("k", "version", "v", "deleted")
      .coalesce(1).write.mode("append").parquet(dir)

  private def feedSchema = Seq.empty[(Long, Long, String, Boolean)]
    .toDF("k", "version", "v", "deleted").schema

  /** Batch oracle: latest version per key wins, tombstones drop. */
  private def oracle(dir: String): Map[Long, (Long, String)] =
    spark.read.parquet(dir)
      .withColumn("_rk", expr(
        "row_number() over (partition by k order by version desc)"))
      .filter(col("_rk") === 1).filter(!col("deleted"))
      .select(col("k"), col("version"), col("v"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap

  private def readStoreMap(store: String): Map[Long, (Long, String)] =
    spark.read.parquet(store)
      .select(col("k"), col("version"), col("v"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap

  private def runOnce(in: String, store: String, ckpt: String,
      beforeCommit: () => Unit = () => ()): Unit = {
    val q = spark.readStream.schema(feedSchema).parquet(in)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.sinks.Sinks.upsertByKey(b.toDF(), store, "k", "version")
        beforeCommit()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally q.stop()
  }

  test("stop → new data → restart from checkpoint lands on the batch oracle") {
    val in = tmp("rst_in"); val store = tmp("rst_store") + "/s"
    val ckpt = tmp("rst_ckpt")
    writeFeed(in, Seq((1L, 1L, "a1", false), (2L, 1L, "b1", false),
      (3L, 1L, "c1", false)))
    runOnce(in, store, ckpt)
    assert(readStoreMap(store) === oracle(in))
    // phase 2: updates, a tombstone, a new key — only the NEW files
    // may be processed on restart (the checkpoint owns the offset)
    writeFeed(in, Seq((1L, 2L, "a2", false), (2L, 2L, "", true),
      (4L, 1L, "d1", false)))
    runOnce(in, store, ckpt)
    val expect = oracle(in)
    assert(readStoreMap(store) === expect)
    assert(expect.keySet === Set(1L, 3L, 4L))
    assert(expect(1L) === ((2L, "a2")))
    // phase 3: an idle restart (no new data) must not change the store
    runOnce(in, store, ckpt)
    assert(readStoreMap(store) === expect)
  }

  test("crash after sink write, before checkpoint commit: replay converges") {
    val in = tmp("crash_in"); val store = tmp("crash_store") + "/s"
    val ckpt = tmp("crash_ckpt")
    writeFeed(in, Seq((1L, 1L, "a1", false), (2L, 1L, "b1", false)))
    runOnce(in, store, ckpt)
    writeFeed(in, Seq((1L, 2L, "a2", false), (3L, 1L, "c1", false)))
    // the sink APPLIES the batch, then the query dies before the
    // checkpoint commit — the worst ordering: work done, not recorded
    val crashes = new AtomicInteger(0)
    val failed = intercept[Exception] {
      runOnce(in, store, ckpt, () => {
        if (crashes.getAndIncrement() == 0)
          throw new RuntimeException("injected crash before commit")
      })
    }
    assert(failed.getMessage != null)
    // the batch's effects are already in the store (at-least-once)…
    assert(readStoreMap(store)(1L) === ((2L, "a2")))
    // …and the restart REPLAYS it into the same final state: the
    // latest-version-wins upsert is idempotent, so replay ≠ double-count
    runOnce(in, store, ckpt)
    assert(readStoreMap(store) === oracle(in))
    assert(readStoreMap(store).keySet === Set(1L, 2L, 3L))
    // a further idle restart stays converged
    runOnce(in, store, ckpt)
    assert(readStoreMap(store) === oracle(in))
  }
}
