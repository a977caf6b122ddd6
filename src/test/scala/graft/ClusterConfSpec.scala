package graft

import org.apache.spark.sql.SparkSession

class ClusterConfSpec extends SparkSpec {

  test("ClusterConf.local applies the posture settings and activates the extensions") {
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s = graft.core.ClusterConf.local(3).getOrCreate()
      assert(s.conf.get("spark.sql.adaptive.enabled") === "true")
      assert(s.conf.get("spark.sql.adaptive.skewJoin.enabled") === "true")
      assert(s.conf.get("spark.sql.session.timeZone") === "UTC")
      assert(s.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled") === "true")
      // the graft extensions registered on THIS session
      assert(s.sql("SELECT graft_hash64('x') AS h").head.getLong(0) >= 0L)
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("ClusterConf sizes shuffle partitions to the core budget") {
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s = graft.core.ClusterConf
        .apply(SparkSession.builder().master("local[2]"), 4000).getOrCreate()
      assert(s.conf.get("spark.sql.shuffle.partitions") === "8000")
      assert(s.conf.get("spark.sql.files.maxPartitionBytes") ===
        (256L * 1024 * 1024).toString)
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
