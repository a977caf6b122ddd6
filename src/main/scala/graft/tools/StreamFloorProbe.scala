package graft.tools

/** Stream-lane floor census (dev tool, r14 optimization round): run
  * each streaming-lane query N times under the bench session contract
  * and print, per run, the wall time plus the engine's own per-batch
  * duration breakdown (triggerExecution / queryPlanning / walCommit /
  * addBatch / getBatch / commitOffsets ...) captured by
  * StreamJobs.lastRunDurations — i.e. WHERE the fixed micro-batch
  * cost sits (VERDICT r13 #5).
  *
  * Usage: runMain graft.tools.StreamFloorProbe [sfDir] [n] [name...]
  */
object StreamFloorProbe {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val n = if (args.length > 1) args(1).toInt else 2
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else graft.Bench.StreamingLane.toSeq.sorted
    val spark = graft.Bench.buildSession(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    graft.Bench.warmupLoop(spark, d, 20000L)
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      (1 to n).foreach { i =>
        graft.streaming.StreamJobs.lastRunDurations = Nil
        val t0 = System.nanoTime()
        fn(spark, d).write.format("noop").mode("overwrite").save()
        val sec = math.round((System.nanoTime() - t0) / 1e6) / 1e3
        val batches = graft.streaming.StreamJobs.lastRunDurations.map {
          case (id, m) =>
            val parts = m.toSeq.sortBy(-_._2)
              .map { case (k, v) => s""""$k":$v""" }.mkString(",")
            s"""{"batch":$id,$parts}"""
        }.mkString("[", ",", "]")
        println(s"""{"query":"$name","run":$i,"sec":$sec,"batches":$batches}""")
        graft.streaming.StreamJobs.cleanupFileSnapshots()
      }
    }
    spark.stop()
  }
}
