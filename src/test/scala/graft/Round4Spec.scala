package graft

import org.apache.spark.sql.functions._

/** Round-4 additions: the banded embedding-dedup construction and its
  * recall evaluation.
  */
class Round4Spec extends SparkSpec {

  private lazy val vecs = graft.core.Tables.embeddings(spark, sf)
    .select(col("vec_id"), col("label"), col("embedding").cast("array<double>"))
    .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toArray))

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    val t = dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    math.floor(t * 10000) / 10000
  }

  private def bands(v: Array[Double]): Seq[Long] =
    (0 until operators.Dedup.EmbBands).map { j =>
      (0 until operators.Dedup.EmbBandBits).map { i =>
        if (v(j * operators.Dedup.EmbBandBits + i) > 0.0) 1L << i else 0L
      }.sum
    }

  private def shareBand(a: Array[Double], b: Array[Double]): Boolean =
    bands(a).zip(bands(b)).exists { case (x, y) => x == y }

  test("dd13 recall eval matches a driver-side recompute of all three censuses") {
    val th = operators.Dedup.EmbThreshold
    var nTruth = 0L; var nCand = 0L; var nHit = 0L
    for (a <- vecs; b <- vecs if a._2 == b._2 && a._1 < b._1) {
      val isTruth = cos(a._3, b._3) >= th
      val isCand = shareBand(a._3, b._3)
      if (isTruth) nTruth += 1
      if (isCand) nCand += 1
      if (isTruth && isCand) nHit += 1
    }
    val row = SparkEntry.queries("dd13_lsh_recall")(spark, sf).collect().head
    assert(row.getLong(0) === nTruth)
    assert(row.getLong(1) === nCand)
    assert(row.getLong(2) === nHit)
    assert(row.getAs[Double]("recall") === math.floor(nHit.toDouble / nTruth * 10000) / 10000)
    // the whole point of the eval: on this data the dial is usable
    assert(nTruth > 0 && nHit.toDouble / nTruth > 0.8)
  }

  test("dd05 candidates are bucket-bounded: strictly fewer than within-label all-pairs") {
    val allPairs = vecs.groupBy(_._2).values
      .map(g => g.size.toLong * (g.size - 1) / 2).sum
    val row = SparkEntry.queries("dd13_lsh_recall")(spark, sf).collect().head
    val nCand = row.getLong(1)
    // bucketed generation must beat the all-pairs count it replaces.
    // At the gated verify threshold (0.2 — a deliberately wide near-
    // neighborhood so the gate has rows) the banding trims ~36% here;
    // selectivity rises steeply with the threshold because band
    // agreement tracks sign agreement, and the JOIN KEY (not this
    // ratio) is what kills the within-label quadratic at scale.
    assert(nCand < (allPairs * 3) / 4, s"candidates $nCand vs all-pairs $allPairs")
  }

  test("dd05 equals the all-pairs result restricted to band-sharing pairs") {
    val th = operators.Dedup.EmbThreshold
    val expected = (for {
      a <- vecs; b <- vecs
      if a._2 == b._2 && a._1 < b._1 && shareBand(a._3, b._3)
      c = cos(a._3, b._3) if c >= th
    } yield (a._1, b._1, c)).toSet
    val got = SparkEntry.queries("dd05_embed_cosine")(spark, sf).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getAs[Double]("cos_sim"))).toSet
    assert(got === expected)
  }
}
