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
