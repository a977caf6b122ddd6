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

  test("ntileExact reproduces the ntile window across sizes, ties and remainders") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(42)
    // sizes straddling n<buckets, n=buckets, n%buckets!=0; keys drawn
    // from a small domain so ties are dense and the custkey-style
    // tiebreak carries the ordering
    // threshold 0 forces the range-bucket path (these frames would all
    // take the local-sort fast path otherwise); default exercises the
    // local path — both must be bit-identical to the ntile window
    for (thr <- Seq("0", (1L << 20).toString)) {
      spark.conf.set("spark.graft.ntile.localThreshold", thr)
      try {
        for (n <- Seq(1, 3, 5, 7, 64, 997); cuts <- Seq(3, 63)) {
          val rows = (1 to n).map(i => (i.toLong, rnd.nextInt(7)))
          val df = rows.toDF("id", "key")
          val expected = df.withColumn("t",
              ntile(5).over(Window.orderBy(col("key"), col("id"))))
            .select(col("id"), col("t"))
            .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
          val got = operators.Rank.ntileExact(df, 5, "t", col("key"), Seq(col("id")), cuts)
            .select(col("id"), col("t"))
            .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
          assert(got === expected, s"n=$n cuts=$cuts thr=$thr")
        }
      } finally spark.conf.unset("spark.graft.ntile.localThreshold")
    }
  }

  test("kr8 matches a driver-side Karp-Rabin recompute") {
    import spark.implicits._
    val docs = Seq("abcdefghij", "the quick brown fox", "aaaaaaaaaa",
      "punctuation, too! and 123 digits")
    def krRef(s: String, i: Int): Long =
      (0 until 8).foldLeft(0L) { (acc, k) =>
        (acc * graft.functions.Hashing.KrB + s.charAt(i + k).toLong) %
          graft.functions.Hashing.KrM
      }
    val got = docs.toDF("text")
      .withColumn("cps", transform(sequence(lit(1), length(col("text"))),
        j => ascii(col("text").substr(j, lit(1))).cast("long")))
      .withColumn("gh", transform(sequence(lit(0), length(col("text")) - 8),
        i => graft.functions.Hashing.kr8(col("cps"), i)))
      .select(col("text"), col("gh"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    for (s <- docs)
      assert(got(s) === (0 to s.length - 8).map(krRef(s, _)), s)
  }

  test("tx06 vocab rows are bounded to the top-50 by frequency") {
    val rows = SparkEntry.queries("tx06_collect_tokens")(spark, sf).collect()
    assert(rows.nonEmpty)
    // recompute per-lang token frequencies driver-side at this tiny SF
    val freqs = graft.core.Tables.documents(spark, sf)
      .select(col("lang"), col("text")).collect()
      .flatMap(r => r.getString(1).trim.split("\\s+").map(r.getString(0) -> _))
      .groupBy(identity).map { case ((l, t), xs) => (l, t, xs.length) }
      .toSeq.groupBy(_._1)
    for (r <- rows) {
      val lang = r.getString(0); val vocab = r.getString(1).split(" ")
      val byLang = freqs(lang).map { case (_, t, n) => (t, n) }
      assert(vocab.length <= 50 && vocab.length === math.min(50, byLang.size))
      assert(r.getLong(2) === byLang.size.toLong)
      val expected = byLang.sortBy { case (t, n) => (-n, t) }
        .take(50).map(_._1)
      assert(vocab.toSeq === expected, lang)
    }
  }

  test("tx13 bigram-LM scores equal a driver-side recompute") {
    val docs = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+"))
      .filter(_._2.length >= 2)
    val bgs = docs.map { case (id, t) =>
      id -> t.sliding(2).map(_.mkString(" ")).toSeq
    }
    val freq = bgs.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong)
    val expected = bgs.map { case (id, b) =>
      val s = b.map(freq).sum
      id -> (b.size.toLong, math.floor(s.toDouble / b.size * 10000) / 10000)
    }.toMap
    val got = SparkEntry.queries("tx13_bigram_lm")(spark, sf)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("avg_bg_freq"))).toMap
    assert(got === expected)
    // fluency signal sanity: repeated-pair docs exist, score > 1 somewhere
    assert(expected.values.exists(_._2 > 1.0))
  }

  test("ss09 Lloyd iteration matches a driver-side recompute") {
    def rawCos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); i += 1 }
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    // centroids with the query's decimal(27,10)-per-value arithmetic
    def centroid(g: Seq[Array[Double]]): Array[Double] =
      Array.tabulate(g.head.length) { i =>
        g.map(v => BigDecimal(v(i)).setScale(10, BigDecimal.RoundingMode.HALF_UP))
          .sum.toDouble / g.size
      }
    val cents = vecs.groupBy(_._2).view
      .mapValues(g => centroid(g.map(_._3).toSeq)).toMap.toSeq.sortBy(_._1)
    val assigned = vecs.map { case (id, lbl, emb) =>
      val best = cents.foldLeft((-2.0, -1)) { case (acc, (cl, c)) =>
        val s = rawCos(emb, c); if (s > acc._1) (s, cl) else acc
      }._2
      (id, lbl, emb, best)
    }
    val expected = assigned.groupBy(_._4).map { case (cl, g) =>
      val nc = centroid(g.map(_._3).toSeq)
      val drift = rawCos(cents.toMap.apply(cl), nc)
      cl -> (g.size.toLong, g.count(v => v._2 != v._4).toLong,
        math.floor(drift * 10000) / 10000)
    }
    val got = SparkEntry.queries("ss09_kmeans_iterate")(spark, sf)
      .collect().map(r => r.getInt(0) ->
        (r.getAs[Long]("n_assigned"), r.getAs[Long]("n_moved"),
          r.getAs[Double]("centroid_drift"))).toMap
    assert(got === expected)
    assert(got.values.map(_._1).sum === vecs.length.toLong)
  }

  test("dd14 contamination census equals a driver-side n-gram recompute") {
    def h64(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val docs = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).trim.split("\\s+")))
    // short docs generate no grams but REMAIN train docs (trivially
    // uncontaminated) — the census denominator covers every train doc
    def grams(toks: Array[String]): Set[Long] =
      (0 to toks.length - 13).map(i => h64(toks.slice(i, i + 13).mkString(" "))).toSet
    val (evalDocs, trainDocs) = docs.partition(d => h64(d._1.toString) % 20 == 0)
    val evalGrams = evalDocs.flatMap(d => grams(d._3)).toSet
    assert(evalDocs.nonEmpty && evalGrams.nonEmpty) // census isn't vacuous
    val expected = trainDocs.groupBy(_._2).map { case (src, ds) =>
      val n = ds.length.toLong
      val c = ds.count(d => grams(d._3).exists(evalGrams)).toLong
      src -> (n, c, math.floor(c.toDouble / n * 10000) / 10000)
    }
    val got = SparkEntry.queries("dd14_contamination")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_train_docs"), r.getAs[Long]("n_contaminated"),
          r.getAs[Double]("contamination_rate"))).toMap
    assert(got === expected)
  }

  test("ev26 gauge equals a driver-side sweep-line recompute") {
    val dayUs = 86400000000L
    val ev = graft.core.Tables.events(spark, sf)
      .select(col("event_type"), expr("unix_micros(ts)").as("s"), col("value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    // split each span across the UTC days it covers, clipped per day —
    // the cross-midnight carry the query must reproduce
    val deltas = ev.flatMap { case (t, s, v) =>
      val e = s + math.floor(v * 1000000.0).toLong
      (Math.floorDiv(s, dayUs) to Math.floorDiv(e, dayUs)).flatMap { d =>
        val cs = math.max(s, d * dayUs); val ce = math.min(e, (d + 1) * dayUs)
        Seq(((t, d), cs, 1L), ((t, d), ce, -1L))
      }
    }
    val dayPeaks = deltas.groupBy(_._1).map { case (k, es) =>
      val byT = es.groupBy(_._2).view.mapValues(_.map(_._3).sum)
        .toSeq.sortBy(_._1)
      k -> byT.scanLeft(0L)(_ + _._2).tail.max
    }
    val expected = dayPeaks.groupBy(_._1._1).map { case (t, m) =>
      t -> (m.size.toLong, m.values.max,
        math.floor(m.values.sum.toDouble / m.size * 10000) / 10000)
    }
    val got = SparkEntry.queries("ev26_inflight_gauge")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_days"), r.getAs[Long]("peak_inflight"),
          r.getAs[Double]("avg_daily_peak"))).toMap
    assert(got === expected)
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
