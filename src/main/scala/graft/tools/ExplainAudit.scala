package graft.tools

/** Prints formatted plans for the audit queries (dev tool): verifies
  * filters/projections reach the parquet scan (PushedFilters /
  * ReadSchema), dims broadcast, and top-k plans as
  * TakeOrderedAndProject.
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q02_filter_project", "q03_revenue_by_nation", "q05_top_customers",
        "q12_multijoin_pushdown", "ev01_extract_parse", "ss01_topk_cosine")
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      graft.SparkEntry.queries(n)(spark, d).explain("formatted")
    }
    spark.stop()
  }
}
