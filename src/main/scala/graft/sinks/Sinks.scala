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

  /** Partitioned write + `_MANIFEST.json`: the corpus-build contract
    * that a dataset directory carries its own audit record (what
    * pk07/pk12 compute as queries, persisted next to the data). The
    * manifest is written AFTER the data commit, so its presence
    * certifies a complete write — consumers that require it get
    * all-or-nothing semantics on top of the dynamic-overwrite
    * idempotence. Contents are deterministic (row/file/byte counts
    * and per-partition-column row counts — no timestamps), so a
    * re-run of identical input produces a byte-identical manifest.
    * Counts come from ONE aggregate over the written files — reading
    * back what was committed, not what the writer intended.
    */
  /** Manifest breakdown cap (VERDICT r12 #6): per partition column at
    * most this many values are listed individually — the heaviest row
    * counts first (value string as the deterministic tiebreak); the
    * tail rolls up into a `partition_overflow` entry with its total
    * rows and distinct-value count. The per-column collect is thereby
    * bounded at TopK rows regardless of partition-column cardinality,
    * so a high-cardinality column can never make the manifest itself
    * the write bottleneck.
    */
  val ManifestTopK = 128

  def parquetWithManifest(df: DataFrame, path: String,
      partitionCols: Seq[String]): String = {
    val spark = df.sparkSession
    partitionedParquet(df, path, partitionCols)
    val written = spark.read.parquet(path)
    val nRows = written.count()
    // (column, listed values sorted by value, overflow (rows, values))
    val perPart: Seq[(String, Seq[(String, Long)], Option[(Long, Long)])] =
      partitionCols.map { c =>
        val counts = written.groupBy(col(c))
          .agg(count(lit(1)).cast("long").as("_n"))
        // distributed top-K — the ONLY driver-side rows are the K
        // listed values plus one 2-value aggregate for the rollup
        val top = counts
          .orderBy(col("_n").desc, col(c).cast("string").asc_nulls_first)
          .limit(ManifestTopK).collect()
          .map(r => (Option(r.get(0)).fold("null")(_.toString), r.getLong(1)))
          .toSeq
        val overflow =
          if (top.size < ManifestTopK) None
          else {
            val a = counts.agg(count(lit(1)).cast("long").as("nv"),
              sum(col("_n")).cast("long").as("nr")).head()
            val (nv, nr) = (a.getLong(0), a.getLong(1))
            val rest = (nr - top.map(_._2).sum, nv - top.size.toLong)
            if (rest._2 > 0) Some(rest) else None
          }
        (c, top.sortBy(_._1), overflow)
      }
    val target = new org.apache.hadoop.fs.Path(path)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = {
      val it = fs.listFiles(target, true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet"))
          buf += ((f.getPath.getName, f.getLen))
      }
      buf.toSeq
    }
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    }
    val partJson = perPart.map { case (c, vs, _) =>
      s""""${esc(c)}":{${vs.map { case (v, n) => s""""${esc(v)}":$n""" }.mkString(",")}}"""
    }.mkString(",")
    // overflow section only when a column actually overflowed TopK, so
    // every pre-cap manifest (all current callers) stays byte-identical
    val overflowJson = {
      val o = perPart.collect { case (c, _, Some((nr, nv))) =>
        s""""${esc(c)}":{"n_rows":$nr,"n_values":$nv}"""
      }
      if (o.isEmpty) "" else s""","partition_overflow":{${o.mkString(",")}}"""
    }
    val manifest =
      s"""{"n_rows":$nRows,"n_files":${files.size},""" +
        s""""total_bytes":${files.map(_._2).sum},""" +
        s""""partitions":{$partJson}$overflowJson}"""
    val mPath = new org.apache.hadoop.fs.Path(path, "_MANIFEST.json")
    val out = fs.create(mPath, true)
    try out.write(manifest.getBytes("UTF-8")) finally out.close()
    manifest
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
