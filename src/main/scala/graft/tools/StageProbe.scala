package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** Per-stage wall-time census over the whole query surface (dev
  * tool, r13 optimization round). For each query it runs ONE noop
  * lap under the bench session contract and attributes every
  * completed stage to that query via a listener, reporting stage
  * count, the slowest stages, and — the specific smell this tool
  * exists for — long stages with ONE task (the single-row-group
  * parquet scan pins any narrow compute stage to one core unless the
  * operator scatters; guide §2.6 idle-capacity, skill gotcha
  * "single-row-group → one scan task").
  *
  * Usage: runMain graft.tools.StageProbe [sfDir] [name...]
  * Output: one JSON line per query to stdout (grep ^\{ to collect).
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Bench.buildSession(cpus)
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val stages = new ConcurrentLinkedQueue[(Int, Int, Long)]() // id, tasks, ms
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val ms = (for {
          s <- si.submissionTime; c <- si.completionTime
        } yield c - s).getOrElse(-1L)
        stages.add((si.stageId, si.numTasks, ms))
      }
    })
    graft.Bench.warmupLoop(spark, d, 20000L)
    Thread.sleep(500); stages.clear()
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      val t0 = System.nanoTime()
      try {
        fn(spark, d).write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300) // let listener events drain
        val ss = stages.asScala.toSeq; stages.clear()
        val total = ss.map(_._3).sum
        val single = ss.filter(s => s._2 == 1 && s._3 >= 100)
          .sortBy(-_._3).take(5)
          .map(s => s"""{"stage":${s._1},"ms":${s._3}}""").mkString(",")
        val top = ss.sortBy(-_._3).take(5)
          .map(s => s"""{"stage":${s._1},"tasks":${s._2},"ms":${s._3}}""")
          .mkString(",")
        println(s"""{"query":"$n","sec":${math.round(sec * 1000) / 1000.0},""" +
          s""""n_stages":${ss.size},"stage_ms":$total,""" +
          s""""top":[$top],"single_task_hot":[$single]}""")
      } catch { case e: Throwable =>
        stages.clear()
        println(s"""{"query":"$n","error":"${e.getClass.getSimpleName}"}""")
      }
      graft.streaming.StreamJobs.cleanupFileSnapshots()
    }
    spark.stop()
  }
}
