package graft.tools

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.Hashing
import graft.operators.Dedup

/** Ad-hoc stage timing for the heavy dedup operators (dev tool). */
object PerfProbe {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[probe] $name%-32s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    time("warmup")(spark.read.parquet(s"$d/lineitem.parquet").count())
    val docs = Tables.documents(spark, d)
    time("docs scan")(docs.count())
    time("md5(text) x1")(docs.select(md5(col("text")).as("h"))
      .agg(count(col("h"))).collect())
    time("hash64(text) x1")(docs.select(Hashing.hash64(col("text")).as("h"))
      .agg(max(col("h"))).collect())

    val toks = docs.withColumn("toks", split(trim(col("text")), "\\s+"))
      .filter(size(col("toks")) >= 3)
    time("shingle strings")(toks.select(Dedup.shingleStrings(col("toks")).as("s"))
      .agg(sum(size(col("s")))).collect())
    time("shingle hashes")(toks.select(Dedup.shingleHashes(col("toks")).as("s"))
      .agg(sum(size(col("s")))).collect())
    val shs = toks.select(col("doc_id"), Dedup.shingleHashes(col("toks")).as("shs"))
    val shsC = shs.persist(); shsC.count()
    time("minhash sig fused (cold)")(shs.select(Dedup.minhashSig(col("shs")).as("sig"))
      .agg(sum(size(col("sig")))).collect())
    // A/B on the SAME cached shingle table — isolates the signature
    // projection from the md5 shingling upstream
    time("minhash composed (cached shs)")(
      shsC.select(Dedup.minhashSigComposed(col("shs")).as("sig"))
        .agg(sum(size(col("sig")))).collect())
    time("minhash fused (cached shs)")(
      shsC.select(Dedup.minhashSig(col("shs")).as("sig"))
        .agg(sum(size(col("sig")))).collect())
    time("minhash composed (cached, run 2)")(
      shsC.select(Dedup.minhashSigComposed(col("shs")).as("sig"))
        .agg(sum(size(col("sig")))).collect())
    time("minhash fused (cached, run 2)")(
      shsC.select(Dedup.minhashSig(col("shs")).as("sig"))
        .agg(sum(size(col("sig")))).collect())
    shsC.unpersist()

    val ds = shs.withColumn("bucket", array_min(col("shs")))
    time("bucket pairs join (recompute)")(
      ds.select(col("bucket"), col("doc_id").as("doc_a"), col("shs").as("sh_a"))
        .join(ds.select(col("bucket"), col("doc_id").as("doc_b"), col("shs").as("sh_b")), Seq("bucket"))
        .filter(col("doc_a") < col("doc_b")).agg(count(lit(1))).collect())
    val cached = ds.persist()
    cached.count()
    time("bucket pairs join (cached)")(
      cached.select(col("bucket"), col("doc_id").as("doc_a"), col("shs").as("sh_a"))
        .join(cached.select(col("bucket"), col("doc_id").as("doc_b"), col("shs").as("sh_b")), Seq("bucket"))
        .filter(col("doc_a") < col("doc_b")).agg(count(lit(1))).collect())
    time("pairs + intersect (cached)")(
      cached.select(col("bucket"), col("doc_id").as("doc_a"), col("shs").as("sh_a"))
        .join(cached.select(col("bucket"), col("doc_id").as("doc_b"), col("shs").as("sh_b")), Seq("bucket"))
        .filter(col("doc_a") < col("doc_b"))
        .select(size(array_intersect(col("sh_a"), col("sh_b"))).as("c"))
        .agg(sum(col("c"))).collect())
    time("dd01 fp only")(docs.select(Hashing.hash64(lower(regexp_replace(trim(col("text")), "\\s+", " "))).as("fp")).agg(max(col("fp"))).collect())
    time("dd01 fp+group")(docs.select(col("doc_id"), Hashing.hash64(lower(regexp_replace(trim(col("text")), "\\s+", " "))).as("fp")).groupBy(col("fp")).agg(min(col("doc_id"))).agg(count(lit(1))).collect())
    time("dd02 full")(Dedup.queries("dd02_ngram_jaccard")(spark, d).count())
    time("dd03 full")(Dedup.queries("dd03_minhash_lsh")(spark, d).count())
    time("dd01 full")(Dedup.queries("dd01_exact")(spark, d).count())
    spark.stop()
  }
}
