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

  test("dd44 weighting demotes boilerplate-only overlap on an adversarial corpus") {
    // two docs share ONLY a boilerplate run present in EVERY doc
    // (df = N -> weight 1); their own content is unique (df = 1 ->
    // weight floor(log2 N) + 1). Unweighted J clears the 0.5 near-dup
    // bar; weighted J collapses.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val boiler = "hdr one two three four five six seven eight nine"
    val n = 64
    val docs = (0 until n).map { i =>
      (i.toLong, s"$boiler u$i v$i")
    }.toDF("doc_id", "text")
    val sh = graft.operators.Dedup.docShinglesOf(docs)
      .select(col("doc_id"), explode(col("shs")).as("h"))
    val df = sh.groupBy("h").agg(count(lit(1)).as("df"))
    val w = df.select(col("h"),
      ((length(bin(lit(n.toLong))) - 1) - (length(bin(col("df"))) - 1) + 1)
        .cast("long").as("w"))
    val wsh = sh.join(w, Seq("h")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("h"), r.getAs[Long]("w")))
    val a = wsh.filter(_._1 == 0L); val b = wsh.filter(_._1 == 1L)
    val aSet = a.map(_._2).toSet; val bSet = b.map(_._2).toSet
    val shared = aSet & bSet
    val jUnweighted = shared.size * 10000L / (aSet.size + bSet.size - shared.size)
    val wOf = wsh.map(t => t._2 -> t._3).toMap
    val iw = shared.toSeq.map(wOf).sum
    val uw = (aSet ++ bSet).toSeq.map(wOf).sum
    val jWeighted = iw * 10000L / uw
    assert(jUnweighted >= 5000L, s"fixture must clear the near-dup bar: $jUnweighted")
    assert(jWeighted < jUnweighted / 2,
      s"weighting must demote boilerplate overlap: $jWeighted vs $jUnweighted")
    // boilerplate shingles (in all docs) really weigh 1
    shared.foreach(s => assert(wOf(s) === 1L))
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
