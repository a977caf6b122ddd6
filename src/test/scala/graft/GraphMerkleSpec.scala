package graft

import org.apache.spark.sql.functions._
import graft.operators.{Graph, Merkle}

class GraphMerkleSpec extends SparkSpec {

  import spark.implicits._

  test("Graph.propagateBipartite conserves the damping floor and replays a tiny graph") {
    // K2 x K1: two customers both buying from one supplier, weights 1/3
    val edges = Seq(("c1", "s1", 1L), ("c2", "s1", 3L))
      .toDF("cust", "supp", "w")
    val r = Graph.propagateBipartite(edges, "cust", "supp", 1, 1000000L, 85L)
      .collect()
    assert(r.length === 1)
    // each customer has out_w = its own w, so contributes its full
    // rank: rank_s = 150000 + 85*(1000000 + 1000000)/100
    assert(r.head.getAs[Long]("rank_fx") === 150000L + 85L * 2000000L / 100L)
  }

  test("Graph.propagateBipartite splits mass by weight") {
    val edges = Seq(("c1", "s1", 1L), ("c1", "s2", 3L))
      .toDF("cust", "supp", "w")
    val r = Graph.propagateBipartite(edges, "cust", "supp", 1, 1000000L, 85L)
      .collect().map(x => x.getString(0) -> x.getAs[Long]("rank_fx")).toMap
    assert(r("s1") === 150000L + 85L * (1000000L / 4L) / 100L)
    assert(r("s2") === 150000L + 85L * (3000000L / 4L) / 100L)
  }

  test("Merkle summaries detect a single changed row and ignore reordering") {
    val a = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("k", "v")
    val b = Seq((3L, "z"), (1L, "x"), (2L, "y")).toDF("k", "v") // reordered
    val c = Seq((1L, "x"), (2L, "CHANGED"), (3L, "z")).toDF("k", "v")
    def s(df: org.apache.spark.sql.DataFrame, n: String, d: String) =
      Merkle.summarize(df, col("k"), Seq(col("v")), 8L, n, d)
    val cleanDiff = Merkle.diff(s(a, "n_t1", "digest_t1"), s(b, "n_t2", "digest_t2"))
    assert(cleanDiff.filter(col("dirty")).count() === 0L)
    val dirtyDiff = Merkle.diff(s(a, "n_t1", "digest_t1"), s(c, "n_t2", "digest_t2"))
    val dirty = dirtyDiff.filter(col("dirty")).collect()
    assert(dirty.length === 1, "exactly the changed key's bucket is dirty")
    assert(dirty.head.getAs[Long]("rows_delta") === 0L,
      "an in-place change moves the digest, not the count")
  }
}
