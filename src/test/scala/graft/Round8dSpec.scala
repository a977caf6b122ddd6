package graft

import org.apache.spark.sql.functions._

class Round8dSpec extends SparkSpec {

  private val sf001 = "/root/testdata/sf0.001"

  test("dd41 census: class identities hold on testdata") {
    val row = SparkEntry.queries("dd41_cross_snapshot")(spark, sf).head()
    val nV1 = row.getAs[Long]("n_v1")
    val nV2 = row.getAs[Long]("n_v2")
    val nRemoved = row.getAs[Long]("n_removed")
    val nTrueNew = row.getAs[Long]("n_true_new")
    val nExact = row.getAs[Long]("n_exact_link")
    val nExactOk = row.getAs[Long]("n_exact_correct")
    val nResid = row.getAs[Long]("n_resid")
    val nLsh = row.getAs[Long]("n_lsh_link")
    val nLshOk = row.getAs[Long]("n_lsh_correct")
    val nUnlinked = row.getAs[Long]("n_unlinked")
    // the two versions partition v2 into exact-linked + residue, and
    // the residue into lsh-linked + unlinked
    assert(nExact + nResid === nV2)
    assert(nLsh + nUnlinked === nResid)
    assert(nExactOk <= nExact && nLshOk <= nLsh)
    assert(nRemoved > 0 && nTrueNew > 0)
    // modified docs exist (doc_id%5==2 ∧ %7∉{0}) so the exact stage
    // cannot cover all carried docs; the LSH stage must recover some
    assert(nResid > 0)
    assert(nLshOk > 0, "banded probe re-linked no modified doc")
    assert(nV1 > 0 && nV2 > 0)
    // links are verified at jfx >= 5000, so the mean is in range
    val meanJfx = row.getAs[Long]("mean_link_jfx")
    assert(meanJfx >= 5000L && meanJfx <= 10000L)
  }

  test("dd41 recall: most modified carried docs re-link to their true pred") {
    // ground truth at sf0.001: carried+modified docs are
    // doc_id%7 ∉ {0,6} ∧ doc_id%5==2 minus any whose v1 predecessor
    // has <3 tokens (no signature → honest recall loss)
    val docs = graft.core.Tables.documents(spark, sf001)
      .select(col("doc_id"), col("text"))
    val modified = docs
      .filter(pmod(col("doc_id"), lit(7)) =!= 6)
      .filter(pmod(col("doc_id"), lit(7)) =!= 0)
      .filter(pmod(col("doc_id"), lit(5)) === 2)
      .filter(size(split(trim(col("text")), "\\s+")) >= 3)
      .count()
    val row = SparkEntry.queries("dd41_cross_snapshot")(spark, sf001).head()
    val nLshOk = row.getAs[Long]("n_lsh_correct")
    // the 3-token append keeps Jaccard ≈ (m-2)/(m+1) >> 0.5 for the
    // testdata's doc lengths, and (4,4) banding at that similarity
    // has near-1 collision probability — demand ≥ 80% end-to-end
    assert(modified > 0)
    assert(nLshOk * 10 >= modified * 8,
      s"recall too low: $nLshOk correct links of $modified modified docs")
  }
}
