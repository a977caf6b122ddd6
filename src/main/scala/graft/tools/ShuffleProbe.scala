package graft.tools
import org.apache.spark.sql.SparkSession
object ShuffleProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.ClusterConf.local(8).getOrCreate()
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val rows = graft.SparkEntry.queries.keys.toSeq.sorted.map { name =>
      val s = graft.SparkEntry.queries(name)(spark, d).queryExecution.executedPlan.toString
      val sh = "Exchange (hash|range|RoundRobin|Single)".r.findAllIn(s).size
      val bc = "BroadcastExchange".r.findAllIn(s).size
      (name, sh, bc)
    }
    rows.sortBy(-_._2).take(12).foreach { case (n, s, b) => println(s"SHUF $n $s $b") }
    println(s"SHUF_MAX ${rows.map(_._2).max} TOTAL ${rows.map(_._2).sum}")
    spark.stop()
  }
}
