package graft

class Round8sSpec extends SparkSpec {

  test("mm19 wav round-trip: every clip survives the real container") {
    val rows = SparkEntry.queries("mm19_wav_roundtrip")(spark, sf).collect()
    assert(rows.nonEmpty)
    val nDocs = graft.core.Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_clips")).sum === nDocs)
    rows.foreach { r =>
      assert(r.getAs[Long]("min_rate") === 16000L)
      assert(r.getAs[Long]("max_rate") === 16000L)
      // container = 44-byte header + 2 bytes/sample, exactly
      assert(r.getAs[Long]("total_bytes")
        === 44L * r.getAs[Long]("n_clips") + 2L * r.getAs[Long]("total_samples"))
    }
  }

  test("wav codec: round-trip, chunk-walk past unknown chunks, corrupt None") {
    import graft.sources.WavCodec
    val samples = Array.tabulate(777)(k => ((k * 131) % 4096 - 2048).toShort)
    val enc = WavCodec.encode(8000, samples)
    val (rate, dec) = WavCodec.decode(enc).get
    assert(rate === 8000 && dec.toSeq === samples.toSeq)
    // splice an unknown LIST chunk (odd size -> padded) before data
    val head = enc.take(36) // RIFF..fmt chunk end
    val tail = enc.drop(36) // data chunk
    val junk = Array[Byte]('L', 'I', 'S', 'T', 5, 0, 0, 0, 1, 2, 3, 4, 5, 0)
    val riffSize = (enc.length - 8 + junk.length).toLong
    val spliced = head ++ junk ++ tail
    spliced(4) = (riffSize & 0xff).toByte
    spliced(5) = ((riffSize >> 8) & 0xff).toByte
    spliced(6) = ((riffSize >> 16) & 0xff).toByte
    spliced(7) = ((riffSize >> 24) & 0xff).toByte
    val (rate2, dec2) = WavCodec.decode(spliced)
      .getOrElse(fail("chunk-walk failed over LIST"))
    assert(rate2 === 8000 && dec2.toSeq === samples.toSeq)
    // corruption: every structural violation is None, never a throw
    assert(WavCodec.decode(null).isEmpty)
    assert(WavCodec.decode(enc.take(40)).isEmpty)        // truncated
    val badMagic = enc.clone(); badMagic(0) = 'X'.toByte
    assert(WavCodec.decode(badMagic).isEmpty)
    val badSize = enc.clone(); badSize(4) = (badSize(4) ^ 1).toByte
    assert(WavCodec.decode(badSize).isEmpty)             // riff size wrong
    val stereo = enc.clone(); stereo(22) = 2
    assert(WavCodec.decode(stereo).isEmpty)              // mono only
    assert(WavCodec.decode(enc ++ Array[Byte](0)).isEmpty) // trailing junk
  }

  test("dd44: weighting can only demote boilerplate ties, and bands bound") {
    val rows = SparkEntry.queries("dd44_weighted_jaccard")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val bj = r.getAs[Long]("band_j"); val bw = r.getAs[Long]("band_jw")
      assert(bj >= 0 && bj <= 4 && bw >= 0 && bw <= 4)
      val mj = r.getAs[Long]("mean_j_fx"); val mw = r.getAs[Long]("mean_jw_fx")
      assert(mj >= 0 && mj <= 10000 && mw >= 0 && mw <= 10000)
      // band means sit inside their band's quintile (mean of values in
      // [band*2000, min((band+1)*2000, 10001)) stays in range)
      assert(mj >= bj * 2000 && (bj == 4L || mj < (bj + 1) * 2000))
      assert(mw >= bw * 2000 && (bw == 4L || mw < (bw + 1) * 2000))
    }
    assert(rows.map(_.getAs[Long]("n_pairs")).sum > 0)
  }

  test("dd44 weighted Jaccard matches a driver recount on one pair") {
    import org.apache.spark.sql.functions._
    // rebuild the heaviest exact-dup pair's weighted J by hand
    val docs = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def shingles(t: String): Set[String] = {
      val toks = t.trim.split("\\s+")
      if (toks.length < 3) Set.empty
      else toks.sliding(3).map(_.mkString(" ")).toSet
    }
    val sets = docs.map { case (id, t) => id -> shingles(t) }
      .filter(_._2.nonEmpty)
    val nDocs = sets.length.toLong
    val df = sets.flatMap(_._2).groupBy(identity).map { case (k, v) =>
      k -> v.length.toLong }
    def bitlen(x: Long) = 63L - java.lang.Long.numberOfLeadingZeros(x)
    def wOf(s: String) = bitlen(nDocs) - bitlen(df(s)) + 1
    // find one pair with J >= 0.8 (identical or near-identical docs)
    val byFp = sets.groupBy(_._2)
    val dupClass = byFp.values.find(_.length >= 2)
    dupClass.foreach { cls =>
      val Seq(a, b) = cls.take(2).map(_._2).toSeq
      val iw = (a & b).toSeq.map(wOf).sum
      val uw = (a ++ b).toSeq.distinct.map(wOf).sum
      // identical sets: weighted J is exactly 1 -> lands in band 4
      assert(iw * 10000L / uw === 10000L)
    }
  }
}
