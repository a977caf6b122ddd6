package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{Skew, TopK}

class ScaleOpsSpec extends SparkSpec {

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
