package graft.core

import org.apache.spark.sql.DataFrame

/** Parallelism decoupling for compute-bound stages.
  *
  * Parquet splits follow row-group boundaries, so a table written as
  * few large row groups scans as few tasks — and any expensive per-row
  * stage (md5 shingling, JSON parse/render, regex validation) inherits
  * that parallelism ceiling no matter how many cores exist. When the
  * per-row compute cost dominates the cost of moving the rows, a
  * round-robin repartition to the cluster's parallelism is the
  * standard fix: pay one cheap shuffle of the narrow input, run the
  * hot stage on every core. At 100 TB inputs arrive as thousands of
  * splits and this becomes unnecessary — `spark.graft.scatter.partitions=0`
  * disables it without touching operator code.
  */
object Par {

  /** Round-robin repartition to `spark.graft.scatter.partitions`
    * (default: defaultParallelism; `0` disables).
    */
  def scatter(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    val n = s.conf.getOption("spark.graft.scatter.partitions")
      .map(_.toInt).getOrElse(s.sparkContext.defaultParallelism)
    if (n <= 0) df else df.repartition(n)
  }
}
