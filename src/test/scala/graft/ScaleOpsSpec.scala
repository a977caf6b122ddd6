package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{Skew, TopK}

class ScaleOpsSpec extends SparkSpec {

  test("runtime bloom filter injects on a selective shuffle join when enabled") {
    // the engine-level scale feature for selective fact-fact joins:
    // Catalyst injects a bloom filter built from the filtered side
    // into the probe side's scan, cutting shuffle volume. Thresholds
    // are sized for clusters, so force-enable for the tiny test data;
    // results must be identical either way.
    val conf = spark.conf
    val prevEnabled = conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    val prevThresh = conf.get(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "10GB")
    val prevBroadcast = conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      // bloom filters target SHUFFLE joins (a broadcast join already
      // prunes at the probe); tiny test dims would broadcast, so
      // force the shuffle path the feature exists for
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val selective = Tables.orders(spark, sf)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val joined = Tables.lineitem(spark, sf)
        .join(selective, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"no bloom filter injected:\n$plan")
      // and the filter is transparent: same result with it disabled
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val plain = Tables.lineitem(spark, sf)
        .join(selective, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
      assert(joined.collect().toSet === plain.collect().toSet)
    } finally {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", prevEnabled)
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        prevThresh)
      conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
    }
  }

  test("TopK aggregator matches the window-rank formulation per group") {
    val o = Tables.orders(spark, sf)
    val viaAgg = o.groupBy(col("o_custkey"))
      .agg(TopK.topk(col("o_totalprice"), col("o_orderkey"), 3).as("top"))
      .select(col("o_custkey"), posexplode(col("top")))
      .select(col("o_custkey"), (col("pos") + 1).as("rn"),
        col("col._2").as("o_orderkey"), col("col._1").as("o_totalprice"))
    val viaWindow = SparkEntry.queries("q06_window_rank")(spark, sf)
    assert(viaAgg.count() === viaWindow.count())
    assert(viaAgg.exceptAll(viaWindow).count() === 0)
    assert(viaWindow.exceptAll(viaAgg).count() === 0)
  }

  test("joinAsOf matches the naive pair-explosion formulation") {
    val ev = Tables.events(spark, sf)
    val l = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val r = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("r_user"), col("ts").as("c_ts"), col("value"))
    val naive = l.join(r, l("user_id") === r("r_user") && r("c_ts") <= l("ts"), "left")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_id"))
          .orderBy(col("c_ts").desc_nulls_last)))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("value").as("asof_value"))
    val fast = graft.operators.AsOf
      .joinAsOf(l, r.withColumnRenamed("r_user", "user_id"), "user_id", "ts", "c_ts", Seq("value"))
      .select(col("event_id"), col("asof_value"))
    assert(fast.count() === l.count())
    assert(fast.exceptAll(naive).count() === 0)
    assert(naive.exceptAll(fast).count() === 0)
  }

  test("native AsOfJoinExec matches the composed union formulation") {
    val ev = Tables.events(spark, sf)
    val l = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val r = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("c_ts"), col("value"))
    val composed = graft.operators.AsOf
      .joinAsOf(l, r, "user_id", "ts", "c_ts", Seq("value"))
      .select(col("event_id"), col("asof_value"))
    val native = graft.operators.AsOf
      .joinAsOfNative(l, r, "user_id", "ts", "c_ts", Seq("value"))
      .select(col("event_id"), col("asof_value"))
    assert(native.queryExecution.executedPlan.toString.contains("AsOfJoin"),
      native.queryExecution.executedPlan.toString)
    assert(native.count() === composed.count())
    assert(native.exceptAll(composed).count() === 0)
    assert(composed.exceptAll(native).count() === 0)
  }

  test("as-of join: string keys survive buffer reuse; NULL values carry atomically") {
    // String keys stress UnsafeRow buffer reuse in the sorted right
    // reader (a carried key held by reference would mutate after
    // advancing); NULL right values must be carried as the latest
    // row's NULL, not skipped for an older non-null, and multi-column
    // carries must stay atomic per right row.
    val l = spark.range(0, 300)
      .select(concat(lit("k"), lpad((col("id") % 50).cast("string"), 3, "0")).as("k"),
        (col("id") * 7 % 200).as("ts"), col("id").as("lid"))
    val r = spark.range(0, 200)
      .select(concat(lit("k"), lpad((col("id") % 60).cast("string"), 3, "0")).as("k"),
        col("id").as("rts"),
        when(col("id") % 4 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("v"), col("id"))).as("v"),
        col("id").as("rid"))
    val naive = l.join(r, Seq("k"), "left")
      .filter(col("rts").isNull || col("rts") <= col("ts"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("lid")).orderBy(col("rts").desc_nulls_last)))
      .filter(col("rn") === 1)
      .select(col("lid"), col("v").as("asof_v"), col("rid").as("asof_rid"))
    // the filter above drops left rows with a key match but no rts<=ts row;
    // restore them with a null-extending join back to l
    val naiveFull = l.select(col("lid")).join(naive, Seq("lid"), "left")
    val composed = graft.operators.AsOf
      .joinAsOf(l, r, "k", "ts", "rts", Seq("v", "rid"))
      .select(col("lid"), col("asof_v"), col("asof_rid"))
    val native = graft.operators.AsOf
      .joinAsOfNative(l, r, "k", "ts", "rts", Seq("v", "rid"))
      .select(col("lid"), col("asof_v"), col("asof_rid"))
    assert(composed.count() === 300)
    assert(composed.exceptAll(naiveFull).count() === 0)
    assert(naiveFull.exceptAll(composed).count() === 0)
    // Run the native exec with forced sort spills: spilled sort
    // readers reuse a per-record buffer, so a carried key held by
    // reference (not copied) visibly corrupts here. The threshold is
    // read from SparkEnv.conf at each sorter's creation, so in local
    // mode this takes effect without a new context.
    val envConf = org.apache.spark.SparkEnv.get.conf
    val spillKey = "spark.shuffle.spill.numElementsForceSpillThreshold"
    envConf.set(spillKey, "8")
    try {
      assert(native.count() === 300)
      assert(native.exceptAll(naiveFull).count() === 0)
      assert(naiveFull.exceptAll(native).count() === 0)
    } finally envConf.remove(spillKey)
    // the NULL-carry path is genuinely exercised: some row's latest
    // version is NULL while an older non-null version exists
    assert(naiveFull.filter(col("asof_v").isNull && col("asof_rid").isNotNull).count() > 0)
  }

  test("binned range join equals the naive non-equi join") {
    val ev = Tables.events(spark, sf)
    val points = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("ts"))
    // intervals: [click ts, click ts + 45 min]
    val ranges = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("range_id"), col("ts").as("start_ts"),
        (col("ts") + expr("INTERVAL 45 MINUTES")).as("end_ts"))
    val naive = points.join(ranges,
      col("ts") >= col("start_ts") && col("ts") <= col("end_ts"))
      .select(col("event_id"), col("range_id"))
    val binned = graft.operators.RangeJoin
      .binned(points, ranges, "ts", "start_ts", "end_ts", 1800)
      .select(col("event_id"), col("range_id"))
    assert(binned.count() === naive.count())
    assert(binned.exceptAll(naive).count() === 0)
    assert(naive.exceptAll(binned).count() === 0)
    // and the binned plan avoids the nested-loop join
    assert(!binned.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
  }

  test("saltedJoin returns exactly the plain join result") {
    val ev = Tables.events(spark, sf)
    val c = Tables.customer(spark, sf)
    val plain = ev.join(c, ev("user_id") === c("c_custkey"))
      .select(col("event_id"), col("c_custkey"))
    val salted = Skew.saltedJoin(ev, c, "user_id", "c_custkey", col("event_id"), 8)
      .select(col("event_id"), col("c_custkey"))
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0)
  }
}
