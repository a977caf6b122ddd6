package graft.tools

import org.apache.spark.sql.SparkSession

/** Scale-ladder runner for the STATEFUL stream lane (VERDICT r11 #4):
  * runs the named stream operators against a corpus dir, one JSON
  * line per operator with wall seconds, per-event microseconds, and
  * the state-store footprint of the drained query
  * ([[graft.streaming.StreamJobs.lastStateMetrics]]) — the numbers
  * that validate the ev62/ev75 sizing models at 100× data.
  *
  * Provider comes from SPARK_GRAFT_STATE_PROVIDER (same contract as
  * Verify/Bench; `rocksdb` = the production posture). Dials from
  * SPARK_GRAFT_CPUS / SPARK_GRAFT_SHUFFLE_PARTITIONS.
  *
  * Usage: runMain graft.tools.StreamLadder <sfDir> ev45,ev46,...
  */
object StreamLadder {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val prefixes = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shufParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufParts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      // ladder-tool allowance: the memory-sink snapshot ops (ev49/
      // ev51) ship their pre-census rows to the driver; at the 1000x
      // events rung that exceeds the 1g default maxResultSize (the
      // production posture is the file sink — this is measurement
      // tooling only)
      .config("spark.driver.maxResultSize",
        sys.env.getOrElse("SPARK_GRAFT_MAX_RESULT", "4g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    sys.env.get("SPARK_GRAFT_STATE_PROVIDER").foreach { p =>
      val cls =
        if (p == "rocksdb")
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
        else p
      spark.conf.set("spark.sql.streaming.stateStore.providerClass", cls)
    }
    // SPARK_GRAFT_TUNED=1 (same contract as Bench): the engine sets
    // the dials from its gated censuses — including the PER-TYPE
    // watermark picks ev49 consumes (VERDICT r12 #2) — so the ladder
    // can run a tuned stream leg and record its state footprint.
    // Requires the corpus to carry all census tables.
    if (sys.env.get("SPARK_GRAFT_TUNED").contains("1")) {
      val p = graft.operators.Tuned.session(spark, dir)
      println(s"""{"tuned":{"parts":${p.shuffleParts},"bandBits":${p.bandBits},""" +
        s""""salts":"${graft.operators.Tuned.fmtTypeMap(p.saltByType)}",""" +
        s""""watermarks_s":"${graft.operators.Tuned.fmtTypeMap(p.watermarkDelaySByType)}"}}""")
    }
    val nEvents = spark.read.parquet(s"$dir/events.parquet").count()
    println(s"""{"corpus":"$dir","n_events":$nEvents,"provider":"${
      sys.env.getOrElse("SPARK_GRAFT_STATE_PROVIDER", "default")}"}""")
    val selected = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => prefixes.exists(n.startsWith) }
    selected.foreach { case (name, fn) =>
      graft.streaming.StreamJobs.lastStateMetrics = None
      val t0 = System.nanoTime()
      try {
        val out = fn(spark, dir)
        out.write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        val usPerEvent = wall * 1e6 / math.max(nEvents, 1L)
        val (rows, bytes) = graft.streaming.StreamJobs.lastStateMetrics
          .getOrElse((-1L, -1L))
        // result rows outside the timing (the drain dominates; this is
        // the empty-result tripwire — a stream that read zero events
        // must not pass as a fast leg)
        val nOut = out.count()
        println(f"""{"op":"$name","sec":$wall%.2f,"us_per_event":$usPerEvent%.2f,"state_rows":$rows,"state_bytes":$bytes,"out_rows":$nOut}""")
      } catch { case e: Throwable =>
        println(s"""{"op":"$name","error":"${e.getMessage.take(120)}"}""")
      }
      graft.streaming.StreamJobs.cleanupFileSnapshots()
    }
    spark.stop()
  }
}
