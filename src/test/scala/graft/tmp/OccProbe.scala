package graft.tmp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object OccProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val banded = graft.operators.Dedup.simhashBanded(s, "/root/testdata/sf0.1").persist()
    val occ = banded.groupBy(col("band"), col("bval")).agg(count(lit(1)).as("occ"))
    val pairs = banded.join(occ, Seq("band", "bval"))
      .select(col("band"), col("bval"), col("occ"), col("doc_id").as("doc_a"), col("simhash").as("sh_a"))
      .join(banded.select(col("band"), col("bval"), col("doc_id").as("doc_b"), col("simhash").as("sh_b")), Seq("band", "bval"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"), col("sh_a"), col("sh_b"))
      .agg(min(col("occ")).as("min_occ"))
      .withColumn("is_true", when(expr("bit_count(sh_a ^ sh_b)") <= 3, 1L).otherwise(0L))
      .persist()
    for (cap <- Seq(128L, 512L, 1024L, 2048L)) {
      val r = pairs.agg(
        count(lit(1)).as("full"),
        sum(when(col("min_occ") <= cap, 1L).otherwise(0L)).as("kept"),
        sum(col("is_true")).as("tfull"),
        sum(when(col("min_occ") <= cap, col("is_true")).otherwise(0L)).as("tkept")).head
      println(s"cap=$cap pairs ${r.getLong(1)}/${r.getLong(0)} true ${r.get(3)}/${r.get(2)}")
    }
    s.stop()
  }
}
