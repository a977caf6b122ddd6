package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Storage-side sinks for the batch/streaming pipeline output — the
  * counterpart of the Kafka delivery path (StreamJobs.Kafka) for
  * pipelines that land in a partitioned object store instead of a
  * topic.
  *
  * Both sinks are idempotent under re-run, which is the property that
  * matters at 100 TB: a failed-and-retried job must not duplicate or
  * half-overwrite yesterday's output.
  */
object Sinks {

  /** Partition-granular idempotent write: INSERT OVERWRITE semantics
    * scoped to the partitions present in `df` (dynamic partition
    * overwrite). Re-running a day's job rewrites exactly that day's
    * directories and leaves every other partition byte-identical —
    * the restartable-backfill contract. Partition columns also prune
    * downstream reads (`WHERE day = …` never touches other dirs).
    */
  def partitionedParquet(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write
      // per-write override: no session-wide conf flip needed
      .option("partitionOverwriteMode", "dynamic")
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Keyed upsert-compaction into a parquet directory: latest record
    * per key wins by (version, tiebreak = incoming over existing),
    * tombstones (`deleted = true`) drop the key. The batch analog of
    * materializing a compacted Kafka topic (ev22/StreamCompact) to
    * storage, shaped for `foreachBatch`: each call folds one batch
    * into the store.
    *
    * Write protocol: stage → swap. The merged snapshot writes to a
    * staging directory first and moves into place only after success,
    * so a mid-write failure leaves the previous snapshot intact
    * (parquet directory writes are not atomic; the rename is). Every
    * rename's BOOLEAN result is checked — Hadoop FileSystem.rename
    * reports most failures by returning false, not throwing — and a
    * failed swap restores the backup before propagating, so there is
    * no code path that deletes the only surviving snapshot. A crash
    * between the two renames (target moved to backup, staging not yet
    * moved in) is healed on the next call (and by [[readStore]]):
    * the backup is restored before merging.
    * State is O(live keys) — the same bound the compacted topic
    * itself holds.
    */
  def upsertByKey(
      batch: DataFrame,
      path: String,
      keyCol: String,
      versionCol: String,
      deletedCol: String = "deleted"): Unit = {
    val spark = batch.sparkSession
    val target = new org.apache.hadoop.fs.Path(path)
    // FS from the path's scheme, not the default-scheme FS — the
    // store may be s3a:///abfs:// while defaultFS is file:// or hdfs://
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val backup = new org.apache.hadoop.fs.Path(path + "._prev")
    def mv(from: org.apache.hadoop.fs.Path, to: org.apache.hadoop.fs.Path): Unit =
      if (!fs.rename(from, to))
        throw new java.io.IOException(s"rename $from -> $to returned false")
    // heal a crash between the swap renames: no live target but a
    // backup means the previous call died mid-swap — the backup IS
    // the last complete snapshot, so restore it before merging
    if (!fs.exists(target) && fs.exists(backup)) mv(backup, target)
    val existing =
      if (fs.exists(target)) spark.read.parquet(path)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], batch.schema)
    // incoming rows outrank existing rows at equal version: a re-run
    // of the same batch must converge to the same snapshot, not flap
    val merged = existing.withColumn("_src", lit(0))
      .unionByName(batch.withColumn("_src", lit(1)))
      .withColumn("_rk", row_number().over(
        Window.partitionBy(col(keyCol))
          .orderBy(col(versionCol).desc, col("_src").desc)))
      .filter(col("_rk") === 1)
      .filter(!coalesce(col(deletedCol), lit(false)))
      .drop("_rk", "_src")
    val staging = new org.apache.hadoop.fs.Path(path + "._staging")
    fs.delete(staging, true)
    merged.write.mode(SaveMode.Overwrite).parquet(staging.toString)
    fs.delete(backup, true)
    val hadTarget = fs.exists(target)
    if (hadTarget) mv(target, backup)
    try mv(staging, target)
    catch { case e: Throwable =>
      // the old snapshot is sitting in backup — put it back before
      // propagating so readers never observe an empty store
      if (hadTarget) mv(backup, target)
      throw e
    }
    // only now is the new snapshot live; dropping the backup is safe
    fs.delete(backup, true)
  }

  /** Read the compacted store (empty frame with `schema` if nothing
    * has been written yet). A store that crashed between upsertByKey's
    * swap renames — no live target, backup present — reads from the
    * backup: that directory is the last COMPLETE snapshot, never a
    * partial write (staging is a different path).
    */
  def readStore(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val target = new org.apache.hadoop.fs.Path(path)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val backup = new org.apache.hadoop.fs.Path(path + "._prev")
    if (fs.exists(target)) spark.read.parquet(path)
    else if (fs.exists(backup)) spark.read.parquet(backup.toString)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }
}
