package graft

import org.apache.spark.sql.SparkSession

class ClusterConfSpec extends SparkSpec {

  // Evaluate the shared suite session BEFORE any clear: the finally
  // blocks must restore the ORIGINAL extensions-bearing session, not
  // re-resolve the lazy val to whatever session the test just built
  // (which is exactly how a session without the AsOf strategy once
  // leaked into every suite that ran after this one).
  private def withFreshSessionSlot[A](body: => A): A = {
    val orig = spark
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try body
    finally {
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }

  test("ClusterConf.local applies the posture settings and activates the extensions") {
    withFreshSessionSlot {
      val s = graft.core.ClusterConf.local(3).getOrCreate()
      assert(s.conf.get("spark.sql.adaptive.enabled") === "true")
      assert(s.conf.get("spark.sql.adaptive.skewJoin.enabled") === "true")
      assert(s.conf.get("spark.sql.session.timeZone") === "UTC")
      assert(s.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled") === "true")
      // the graft extensions registered on THIS session — must hold
      // even when the builder reuses an already-running SparkContext
      // (the static spark.sql.extensions conf is ignored there; the
      // builder-level withExtensions instance is what carries it)
      assert(s.sql("SELECT graft_hash64('x') AS h").head.getLong(0) >= 0L)
    }
  }

  test("ClusterConf sizes shuffle partitions to the core budget") {
    withFreshSessionSlot {
      val s = graft.core.ClusterConf
        .apply(SparkSession.builder().master("local[2]"), 4000).getOrCreate()
      assert(s.conf.get("spark.sql.shuffle.partitions") === "8000")
      assert(s.conf.get("spark.sql.files.maxPartitionBytes") ===
        (256L * 1024 * 1024).toString)
    }
  }
}
