package graft

import org.apache.spark.sql.functions._
import graft.core.Tables

/** Bucketing = the static co-location strategy for repeated big-big
  * joins at 100 TB: both sides pre-hashed into the same bucket count
  * on the join key, so the join plans with NO shuffle exchange.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed tables join without a shuffle exchange") {
    val o = Tables.orders(spark, sf)
    val c = Tables.customer(spark, sf)
    spark.sql("DROP TABLE IF EXISTS g_orders_b")
    spark.sql("DROP TABLE IF EXISTS g_customer_b")
    o.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("g_orders_b")
    c.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("g_customer_b")

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("g_orders_b")
        .join(spark.table("g_customer_b"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning(o_custkey"), plan)
      assert(!plan.contains("Exchange hashpartitioning(c_custkey"), plan)
      assert(plan.contains("SortMergeJoin"), plan)
      assert(joined.agg(sum(col("n"))).head.getLong(0) === o.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS g_orders_b")
      spark.sql("DROP TABLE IF EXISTS g_customer_b")
    }
  }
}
