package graft

import org.apache.spark.sql.functions._
import graft.functions.{DotExpr, Hash64Expr, Hashing}

class CatalystSpec extends SparkSpec {
  import spark.implicits._

  test("Hash64Expr equals the portable md5/conv form on varied input") {
    val df = spark.range(1000)
      .select(concat(lit("s"), col("id")).as("s"))
      .union(Seq("", "abc", "héllo wörld", "é中文").toDF("s"))
    val diff = df.select(
        Hash64Expr(col("s")).as("native"),
        Hashing.hash64(col("s")).as("portable"))
      .filter(col("native") =!= col("portable"))
    assert(diff.count() === 0)
  }

  test("NativeHashRewrite rewrites the portable pattern in the optimized plan") {
    val df = spark.range(3).select(col("id").cast("string").as("s"))
      .select(Hashing.hash64(col("s")).as("h"))
    val optimized = df.queryExecution.optimizedPlan
    assert(optimized.toString.contains("graft_hash64"), optimized.toString)
    assert(!optimized.toString.contains("md5"), optimized.toString)
    // and it computes the portable value ("0" hashes like DuckDB's)
    val viaNative = df.head.getLong(0)
    val viaSql = spark.sql("SELECT CAST(conv(substr(md5('0'),1,15),16,10) AS BIGINT)").head.getLong(0)
    assert(viaNative === viaSql)
  }

  test("graft_hash64/graft_dot are registered as SQL functions") {
    assert(spark.sql("SELECT graft_hash64('abc')").head.getLong(0) === 648541476951500027L)
    assert(spark.sql("SELECT graft_dot(array(1.0d,2.0d), array(3.0d,4.0d))").head.getDouble(0) === 11.0)
  }

  test("DotExpr equals the composable aggregate/zip_with fold") {
    val df = Tables.range(spark)
    val composed = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val diff = df.select(DotExpr(col("a"), col("b")).as("n"), composed.as("c"))
      .filter(col("n") =!= col("c"))
    assert(diff.count() === 0)
  }

  object Tables {
    def range(s: org.apache.spark.sql.SparkSession) = {
      import s.implicits._
      graft.core.Tables.embeddings(s, sf)
        .select(col("embedding").cast("array<double>").as("a"))
        .withColumn("b", reverse(col("a")))
    }
  }

  test("IntersectCountRewrite swaps size(array_intersect) for the fused kernel") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // non-literal arrays of non-nullable longs: ArrayType(LongType,
    // containsNull = false) — the rule's proven-safe domain — and
    // immune to constant folding collapsing the expression away
    val df = spark.range(4)
      .select(array(col("id"), col("id") + 1, col("id") * 2).as("a"),
        array(col("id") + 1, col("id") + 2).as("b"))
      .select(size(array_intersect(col("a"), col("b"))).as("n"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_intersect_count"),
      s"rule did not fire:\n$optimized")
    assert(df.collect().map(_.getInt(0)).toSeq === Seq(1, 1, 2, 1))
  }
}
