package graft.core

import org.apache.spark.sql.SparkSession

/** The 100 TB deployment posture as code — the session configuration
  * this library is designed against, so a user standing up a
  * 1000-executor job starts from the settings every operator's plan
  * shape assumes instead of rediscovering them.
  *
  * Everything here is standard open-source Spark configuration; the
  * values encode the repo's §5 scale design:
  *  - AQE on with coalescing + skew-join: plans are written
  *    declaratively and let runtime re-planning pick partition counts
  *    and split skewed joins (q27's salting handles the keys AQE
  *    cannot see, e.g. pre-aggregation hot keys).
  *  - shuffle.partitions ≈ 2× total cores: the INITIAL number only —
  *    AQE coalesces down; undersizing it is the one mistake AQE
  *    cannot fix (a 200-partition default on 4000 cores serializes
  *    the big shuffles).
  *  - maxPartitionBytes 256 MB: scan tasks sized so a full row-group
  *    of the wide tables (documents with text, embeddings arrays)
  *    fits comfortably in executor memory with room for the
  *    per-partition hash tables the dedup operators build.
  *  - runtime bloom filters on: the q04-style semi-join reduction is
  *    asserted by PlanAuditSpec at cluster posture.
  *  - RocksDB state store: at 100 TB the stateful streaming jobs
  *    (stream dedup, sessionization, stream-stream joins) carry
  *    state far beyond executor heap; the default HDFS-backed
  *    provider keeps every version IN MEMORY per executor, RocksDB
  *    spills to local disk with incremental checkpointing. Same
  *    state semantics — RocksDbStateSpec runs the stateful jobs
  *    under it and pins output equality against the default
  *    provider.
  *  - UTC session timezone and nanosAsLong: the engine-parity
  *    contract every oracle-gated operator is proven under.
  *  - GraftExtensions: the AsOfJoin strategy, native hash/dot/
  *    intersect kernels, and their rewrite rules.
  */
object ClusterConf {

  /** Apply the posture to a builder. `totalCores` = executors ×
    * cores/executor (e.g. 1000 × 4). Returns the builder for
    * chaining; nothing here depends on cluster manager or deploy
    * mode.
    */
  def apply(b: SparkSession.Builder, totalCores: Int): SparkSession.Builder =
    // both registration routes: the conf string is what spark-submit
    // ships to a cluster (static conf, read at CONTEXT creation), the
    // builder-level instance is what activates the extensions when
    // this builder constructs a session over an ALREADY-RUNNING
    // SparkContext (notebooks, shared test JVMs) — there the static
    // conf on the builder is silently ignored
    b.withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.shuffle.partitions", math.max(64, totalCores * 2).toString)
      .config("spark.sql.files.maxPartitionBytes", (256L * 1024 * 1024).toString)
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")

  /** The local test twin — identical semantics-bearing settings
    * (timezone, extensions, parquet handling) at local parallelism,
    * so a plan verified here is the plan the cluster runs.
    */
  def local(cores: Int): SparkSession.Builder =
    apply(SparkSession.builder().master(s"local[$cores]"), cores)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false")
}
