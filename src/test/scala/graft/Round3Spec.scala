package graft

import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Value-level ground truth for the round-3 operators (the DuckDB
  * oracle checks cross-engine parity; these pin the SEMANTICS against
  * hand-computed expectations on controlled inputs).
  */
class Round3Spec extends SparkSpec {
  import spark.implicits._

  /** Write a tiny documents table to a temp dir and return the dir. */
  private def docsDir(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-r3").toString
    rows.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("dd09 flags shared 8-token spans and only those") {
    val shared = (1 to 8).map(i => s"w$i").mkString(" ")
    val dir = docsDir(Seq(
      0L -> s"$shared alpha beta gamma delta",
      1L -> s"prefix one two three $shared",
      2L -> "totally different words that never repeat anywhere else at all"))
    val got = SparkEntry.queries("dd09_substring_dedup")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc0: 12 tokens → 5 windows, exactly 1 (the shared span) duplicated
    assert(got(0L) === ((5L, 1L)))
    // doc1: 12 tokens → 5 windows, the shared span is its LAST window
    assert(got(1L) === ((5L, 1L)))
    // doc2: 10 tokens → 3 windows, none duplicated
    assert(got(2L) === ((3L, 0L)))
  }

  test("dd10 keeps the longest member per near-dup cluster") {
    val body = (1 to 30).map(i => s"tok$i").mkString(" ")
    val dir = docsDir(Seq(
      0L -> body, // near-dup pair: identical shingles...
      1L -> (body + " extra trailing words here"), // ...but doc1 is longer
      2L -> "an unrelated island document with its own vocabulary entirely"))
    val got = SparkEntry.queries("dd10_cluster_keeper")(spark, dir).collect()
    // one cluster {0,1}; doc2 has no near-dup pair so it forms no cluster
    assert(got.length === 1)
    val r = got.head
    assert(r.getAs[Long]("cluster_id") === 0L)
    assert(r.getAs[Long]("n_members") === 2L)
    assert(r.getAs[Long]("keeper") === 1L) // longest wins
  }

  test("tx12 scores docs by mean corpus token frequency") {
    val dir = docsDir(Seq(
      0L -> "a a b", // corpus freq: a=4, b=2, z=1
      1L -> "a a b z"))
    val got = SparkEntry.queries("tx12_unigram_lm")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got(0L) === ((3L, math.floor((4 + 4 + 2) / 3.0 * 10000) / 10000)))
    assert(got(1L) === ((4L, math.floor((4 + 4 + 2 + 1) / 4.0 * 10000) / 10000)))
  }

  test("pk02 chunk geometry: budget 32, stride 24, full coverage") {
    val n99 = (1 to 99).map(i => s"t$i").mkString(" ")
    val n32 = (1 to 32).map(i => s"t$i").mkString(" ")
    val n33 = (1 to 33).map(i => s"t$i").mkString(" ")
    val dir = docsDir(Seq(0L -> n99, 1L -> n32, 2L -> n33))
    val got = SparkEntry.queries("pk02_chunk_overlap")(spark, dir)
      .collect().groupBy(_.getLong(0))
      .map { case (k, rs) => k -> rs.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq }
    assert(got(0L) === Seq(32L, 32L, 32L, 27L)) // starts 0,24,48,72
    assert(got(1L) === Seq(32L)) // fits the budget → one chunk
    assert(got(2L) === Seq(32L, 9L)) // one over → budget chunk + tail
  }

  test("pk02 chunk invariants hold across random doc lengths") {
    val rnd = new scala.util.Random(41)
    val lens = Seq(1, 2, 31, 32, 33, 55, 56, 57) ++ Seq.fill(12)(1 + rnd.nextInt(199))
    val dir = docsDir(lens.zipWithIndex.map { case (n, i) =>
      i.toLong -> (1 to n).map(j => s"t$j").mkString(" ")
    })
    val byDoc = SparkEntry.queries("pk02_chunk_overlap")(spark, dir)
      .collect().groupBy(_.getLong(0))
      .map { case (k, rs) => k -> rs.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq }
    lens.zipWithIndex.foreach { case (n, i) =>
      val chunks = byDoc(i.toLong)
      // chunk ids are dense from 0; all chunks within budget
      assert(chunks.forall(c => c >= 1 && c <= 32), s"n=$n: $chunks")
      // non-tail chunks are exactly the budget
      assert(chunks.dropRight(1).forall(_ == 32), s"n=$n: $chunks")
      // coverage: strides of 24 + final chunk length reach exactly n
      // (equivalently: 8 tokens of overlap at every seam)
      assert((chunks.length - 1) * 24 + chunks.last === n, s"n=$n: $chunks")
    }
  }

  test("q30 cohort week-0 activity covers every cohort member") {
    val df = SparkEntry.queries("q30_cohort_retention")(spark, sf)
    val week0 = df.filter(col("weeks_since") === 0)
      .select(col("cohort_week"), col("n_users"))
      .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    val cohorts = graft.core.Tables.events(spark, sf)
      .groupBy(col("user_id")).agg(min(col("ts")).as("first_ts"))
      .groupBy(date_trunc("week", col("first_ts")).as("cohort_week"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    // a user is by definition active in their own first-event week
    assert(week0 === cohorts)
    assert(df.filter(col("weeks_since") < 0).count() === 0)
  }

  test("q31 histogram partitions all orders; shares sum to ~1") {
    val rows = SparkEntry.queries("q31_histogram")(spark, sf).collect()
    val total = graft.core.Tables.orders(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_orders")).sum === total)
    assert(rows.forall(r => r.getAs[Long]("bucket") >= 0 && r.getAs[Long]("bucket") <= 19))
    val pctSum = rows.map(_.getAs[Double]("pct")).sum
    assert(pctSum > 0.99 && pctSum <= 1.0001, s"pct sum $pctSum")
  }

  test("ev22 compaction equals driver-side latest-state with tombstones") {
    val ev = graft.core.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"), col("value"))
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getString(3), r.getDouble(4)))
    val winners = ev.groupBy(_._1).values
      .map(_.maxBy(e => (e._3.getTime, e._2)))
      .filter(_._4 != "error").toSeq
    val expected = winners.groupBy(_._4).map { case (k, v) =>
      k -> (v.size.toLong,
        // mirror the query's decimal(18,6) per-row quantization so the
        // sum is order-independent and exactly comparable
        v.map(e => BigDecimal(e._5).setScale(6, BigDecimal.RoundingMode.HALF_UP))
          .sum.toDouble)
    }
    val got = SparkEntry.queries("ev22_cdc_upsert")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_users"), r.getAs[Double]("sum_value"))).toMap
    assert(got === expected)
  }

  test("ev23 late-drop marks exactly the >10min-behind-hwm arrivals") {
    val dir = java.nio.file.Files.createTempDirectory("graft-r3ev").toString
    def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    // arrival order = event_id; user 1: hwm after e1 is 10:30 —
    // e2 (10:05) is 25 min behind → late; e3 (10:21) is 9 min → fine
    Seq((1L, ts(30), 1L, "click", 1.0, "{}"),
      (2L, ts(5), 1L, "click", 1.0, "{}"),
      (3L, ts(21), 1L, "view", 1.0, "{}"),
      (4L, ts(0), 2L, "view", 1.0, "{}")) // other user: first arrival, no hwm
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("ev23_late_drop")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === Map("click" -> ((2L, 1L)), "view" -> ((2L, 0L))))
  }

  test("q33 RFM quintiles partition every ordering customer") {
    val rows = SparkEntry.queries("q33_rfm_segments")(spark, sf).collect()
    val nCustomers = graft.core.Tables.orders(spark, sf)
      .select(col("o_custkey")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_customers")).sum === nCustomers)
    rows.foreach { r =>
      Seq("r_score", "f_score", "m_score").foreach { c =>
        val v = r.getAs[Int](c); assert(v >= 1 && v <= 5, s"$c=$v")
      }
    }
  }

  test("ev25 funnel requires strictly ordered steps") {
    val dir = java.nio.file.Files.createTempDirectory("graft-r3fn").toString
    def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    Seq(
      (1L, ts(1), 1L, "signup", 1.0, "{}"), // u1: full ordered funnel
      (2L, ts(2), 1L, "view", 1.0, "{}"),
      (3L, ts(3), 1L, "purchase", 1.0, "{}"),
      (4L, ts(1), 2L, "signup", 1.0, "{}"), // u2: purchase without view
      (5L, ts(2), 2L, "purchase", 1.0, "{}"),
      (6L, ts(1), 3L, "view", 1.0, "{}"), // u3: view BEFORE signup
      (7L, ts(2), 3L, "signup", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = SparkEntry.queries("ev25_funnel_steps")(spark, dir).head
    assert(r.getAs[Long]("n_signup") === 3L)
    assert(r.getAs[Long]("n_viewed") === 1L) // only u1's view counts
    assert(r.getAs[Long]("n_purchased") === 1L)
    assert(r.getAs[Double]("view_rate") === 0.3333)
  }

  test("mm05 reassembly round-trips every ascii doc") {
    val rows = SparkEntry.queries("mm05_reassemble")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Int]("ok") === 1),
      "chunk reassembly failed digest check")
  }

  test("ev24 gap fill densifies the full hour grid with zeros") {
    val rows = SparkEntry.queries("ev24_gap_fill")(spark, sf).collect()
    val types = rows.map(_.getString(0)).distinct
    val hours = rows.map(_.getTimestamp(1)).distinct
    // dense: every (type, hour) cell present exactly once
    assert(rows.length === types.length * hours.length)
    // zero-filled cells exist (sparse input), and totals are preserved
    assert(rows.exists(_.getAs[Long]("n_events") === 0L))
    val total = rows.map(_.getAs[Long]("n_events")).sum
    assert(total === graft.core.Tables.events(spark, sf).count())
  }

  test("q32 stratified sample equals the exact deterministic-hash recompute") {
    // membership is a pure md5 hash of the key (no RNG), so the spec
    // can demand EXACT per-stratum counts, not statistical bounds —
    // this replaces the former rate-sanity check that binomial wobble
    // forced to be loose at this SF
    val custs = graft.core.Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_mktsegment"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    def h(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val expected = custs.groupBy(_._2).map { case (seg, cs) =>
      val rate = if (seg == "BUILDING") 10 else 5
      val sampled = cs.count(c => h(c._1.toString) % 100 < rate).toLong
      seg -> (cs.size.toLong, sampled,
        math.floor(sampled.toDouble / cs.size * 10000) / 10000)
    }
    val got = SparkEntry.queries("q32_stratified_sample")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_total"),
        r.getAs[Long]("n_sampled"), r.getAs[Double]("sample_rate"))).toMap
    assert(got === expected)
  }

  test("streaming CDC compaction converges to the batch compacted state") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamJobs
    import graft.streaming.StreamJobs.ChangeIn
    // the events table as a changelog: key = user, offset = event_id,
    // 'error' plays the tombstone
    val changes = graft.core.Tables.events(spark, sf)
      .select(col("user_id").as("k"), expr("unix_micros(ts)").as("ts"),
        col("event_id").as("off"),
        when(col("event_type") === "error", "delete")
          .otherwise(col("event_type")).as("op"),
        when(col("event_type") =!= "error", col("value")).as("v"))
      .as[ChangeIn].collect().sortBy(_.off)
    val (b1, b2) = changes.splitAt(changes.length / 2)
    val in = MemoryStream[ChangeIn]
    val q = StreamJobs.streamCompact(in.toDS()).writeStream
      .format("memory").queryName("compact_out")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append).start()
    in.addData(b1.toSeq); q.processAllAvailable()
    in.addData(b2.toSeq); q.processAllAvailable()
    q.stop()
    // compacted snapshot = latest emission per key by (ts, off)
    val snap = spark.table("compact_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getBoolean(5)))
      .groupBy(_._1).map { case (k, v) => k -> v.maxBy(e => (e._2, e._3)) }
    val expected = changes.groupBy(_.k).map { case (k, v) =>
      val latest = v.maxBy(r => (r.ts, r.off))
      k -> ((k, latest.ts, latest.off, latest.op, latest.op != "delete"))
    }
    assert(snap === expected)
    // tombstoned keys are emitted dead, not silently dropped
    assert(snap.values.exists(!_._5))
  }

  test("dd11 semantic clusters equal driver-side union-find on the pair graph") {
    // rebuild the same candidate pairs (banded sign-LSH within label,
    // exact cos >= 0.2 verify — Dedup.embCandidates' construction)
    // driver-side and union-find them — the star-CC census must match
    val vecs = graft.core.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val t = dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      math.floor(t * 10000) / 10000
    }
    def bands(v: Array[Double]): Seq[Long] =
      (0 until operators.Dedup.EmbBands).map { j =>
        (0 until operators.Dedup.EmbBandBits).map { i =>
          if (v(j * operators.Dedup.EmbBandBits + i) > 0.0) 1L << i else 0L
        }.sum
      }
    val pairs = for {
      a <- vecs; b <- vecs
      if a._2 == b._2 && a._1 < b._1 &&
        bands(a._3).zip(bands(b._3)).exists { case (x, y) => x == y } &&
        cos(a._3, b._3) >= operators.Dedup.EmbThreshold
    } yield (a._1, b._1)
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val root = find(p); parent(x) = root; root }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.toSeq.map(find).groupBy(identity)
      .map { case (c, ms) => c -> ms.size.toLong }
    val got = SparkEntry.queries("dd11_semantic_clusters")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
  }

  test("dd12 minhash estimate is exact on identical docs and bounded in [0,1]") {
    val body = (1 to 20).map(i => s"w$i").mkString(" ")
    val dir = docsDir(Seq(0L -> body, 1L -> body, // identical → J=1, est=1
      2L -> ((1 to 10).map(i => s"w$i").mkString(" ") + " x y z"))) // partial overlap
    val rows = SparkEntry.queries("dd12_minhash_estimate")(spark, dir).collect()
    val ident = rows.find(r => r.getLong(0) == 0L && r.getLong(1) == 1L).get
    assert(ident.getAs[Double]("jaccard") === 1.0)
    assert(ident.getAs[Double]("mh_est") === 1.0)
    assert(ident.getAs[Double]("abs_err") === 0.0)
    rows.foreach { r =>
      val est = r.getAs[Double]("mh_est")
      assert(est >= 0.0 && est <= 1.0)
      val expectedErr = math.floor(
        math.abs(est - r.getAs[Double]("jaccard")) * 10000) / 10000
      assert(r.getAs[Double]("abs_err") === expectedErr)
    }
  }

  test("ss08 recall matches an independent driver-side evaluation") {
    val vecs = graft.core.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val q = vecs.find(_._1 == 0).get._2
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val t = dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      math.floor(t * 10000) / 10000
    }
    def bucket(a: Array[Double]): Long =
      (0 until 8).map(i => if (a(i) > 0.0) 1L << i else 0L).sum
    val scored = vecs.filter(_._1 != 0)
      .map { case (id, v) => (id, cos(v, q), bucket(v)) }
    val ord = Ordering.by[(Long, Double, Long), (Double, Long)](t => (-t._2, t._1))
    val truth = scored.sorted(ord).take(10).map(_._1).toSet
    val approx = scored.filter(_._3 == bucket(q)).sorted(ord).take(10).map(_._1).toSet
    val r = SparkEntry.queries("ss08_recall_eval")(spark, sf).head
    assert(r.getAs[Long]("n_truth") === 10L)
    assert(r.getAs[Long]("n_hit") === (truth & approx).size.toLong)
    assert(r.getAs[Double]("recall_at_10") ===
      math.floor((truth & approx).size / 10.0 * 10000) / 10000)
  }

  test("ss07 multi-probe shortlist equals the direct hamming filter") {
    // the 137-bucket probe enumeration must reproduce exactly the
    // hamming<=2 candidate set (then both re-rank identically)
    val e = graft.core.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .withColumn("sketch", graft.operators.Similarity.signBucket(col("emb"), 16))
    val qs = e.filter(col("vec_id") === 0).head.getAs[Long]("sketch")
    val direct = e.filter(col("vec_id") =!= 0)
      .filter(bit_count(col("sketch").bitwiseXOR(lit(qs))) <= 2)
      .withColumn("cos_sim", lit(0)) // rank not under test here
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val gotAll = SparkEntry.queries("ss07_rerank")(spark, sf).collect()
    assert(gotAll.forall(r => direct.contains(r.getLong(0))))
    assert(gotAll.length === math.min(5, direct.size))
    // ranked by cosine descending
    val sims = gotAll.map(_.getAs[Double]("cos_sim")).toSeq
    assert(sims === sims.sorted.reverse)
  }
}
