package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Per-operator shuffle budget (VERDICT r9 #5): counts Exchange nodes
  * in each batch operator's initial physical plan and generates
  * docs/SHUFFLES.md. ShuffleBudgetSpec recomputes the same counts and
  * fails on any operator whose count GREW vs the committed table —
  * the explode-trap / stage-reuse regression class (dd20, dd33, dd44,
  * tx11, dd27/dd32) is exactly a shuffle/stage-count diff, so this
  * pins it the way PlanAudit pins plan shapes.
  *
  * Counts are plan-shape properties (independent of core count and
  * AQE runtime re-planning — the initial plan is what the lint sees
  * on both sides). Streaming-lane operators are excluded: building
  * their result frame executes the stream, and the returned frame is
  * a sink read whose plan is not the budgeted pipeline.
  *
  * Usage: runMain graft.tools.ShuffleProbe [sfDir] [outFile]
  * Defaults: /root/testdata/sf0.001 (the spec's corpus) and
  * docs/SHUFFLES.md.
  */
object ShuffleProbe {

  /** (shuffle exchanges, broadcast exchanges) in a frame's initial plan. */
  def countPlan(df: org.apache.spark.sql.DataFrame): (Int, Int) = {
    val s = df.queryExecution.executedPlan.toString
    val sh = "Exchange (hash|range|RoundRobin|Single)".r.findAllIn(s).size
    val bc = "BroadcastExchange".r.findAllIn(s).size
    (sh, bc)
  }

  /** (shuffle exchanges, broadcast exchanges) in an operator's plan. */
  def counts(spark: SparkSession, d: String, name: String): (Int, Int) =
    countPlan(graft.SparkEntry.queries(name)(spark, d))

  /** Batch-lane operator names (streaming excluded — see scaladoc). */
  def batchOps: Seq[String] =
    graft.SparkEntry.queries.keys.toSeq.sorted
      .filterNot(graft.Bench.StreamingLane.contains)

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = if (args.length > 1) args(1) else "docs/SHUFFLES.md"
    val spark = graft.core.ClusterConf.local(8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rows = batchOps.map { name =>
      val (sh, bc) = counts(spark, d, name)
      (name, sh, bc)
    }
    val sb = new StringBuilder
    sb ++= "# Shuffle budget (generated — graft.tools.ShuffleProbe)\n\n"
    sb ++= s"Initial-plan Exchange counts per batch operator at $d.\n"
    sb ++= "ShuffleBudgetSpec fails any operator whose shuffle count\n"
    sb ++= "GROWS vs this table; regenerate after an intentional change:\n"
    sb ++= "`sbt \"runMain graft.tools.ShuffleProbe\"`.\n\n"
    sb ++= "| operator | shuffles | broadcasts |\n| --- | --- | --- |\n"
    rows.foreach { case (n, s, b) => sb ++= s"| $n | $s | $b |\n" }
    sb ++= s"\nTotal: ${rows.map(_._2).sum} shuffles, ${rows.map(_._3).sum} " +
      s"broadcasts across ${rows.size} batch operators; " +
      s"max per operator ${rows.map(_._2).max}.\n"
    Files.writeString(Paths.get(out), sb.toString)
    rows.sortBy(-_._2).take(12).foreach { case (n, s, b) => println(s"SHUF $n $s $b") }
    println(s"SHUF_MAX ${rows.map(_._2).max} TOTAL ${rows.map(_._2).sum} WROTE $out")
    spark.stop()
  }
}
