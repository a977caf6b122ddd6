package graft

import org.apache.spark.sql.Row

class Round8lSpec extends SparkSpec {

  test("q77 doulion: sample/wedge/triangle invariants") {
    val r = SparkEntry.queries("q77_triangle_doulion")(spark, sf).head()
    val e = r.getAs[Long]("n_edges"); val v = r.getAs[Long]("n_vertices")
    val w = r.getAs[Long]("n_wedges"); val t = r.getAs[Long]("n_tri_sampled")
    assert(e >= 0L && v >= 0L)
    if (e > 0) assert(v >= 2L)
    // every triangle closes a wedge; every closing is a distinct wedge
    assert(t <= w)
    assert(r.getAs[Long]("est_triangles") === t * 512L)
  }

  test("q77 orientation counts each triangle exactly once (toy graph)") {
    // K4 minus one edge = 2 triangles; build via the same oriented
    // wedge-join algebra in plain Scala to pin the algorithm
    val edges = Seq((1, 2), (1, 3), (1, 4), (2, 3), (2, 4)) // no (3,4)
    val deg = edges.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).map { case (k, v) => k -> v.size }
    def ord(x: Int) = (deg(x), x)
    val o = edges.map { case (a, b) =>
      if (Ordering[(Int, Int)].lt(ord(a), ord(b))) (a, b) else (b, a)
    }
    val tris = for {
      (u1, v1) <- o; (u2, v2) <- o
      if u1 == u2 && Ordering[(Int, Int)].lt(ord(v1), ord(v2))
      if o.contains((v1, v2))
    } yield (u1, v1, v2)
    assert(tris.size === 2)
  }

  test("ev77 conservation: sweep integral equals direct span sum") {
    import org.apache.spark.sql.functions._
    val df = SparkEntry.queries("ev77_little_law")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // direct recompute (the oracle's algorithm) in Spark — the two
    // must agree per type
    val ev = graft.core.Tables.events(spark, sf)
      .select(col("event_type"), expr("unix_micros(ts)").as("s_us"),
        (expr("unix_micros(ts)") +
          floor(col("value").cast("double") * 1000000.0).cast("long")).as("e_us"))
    val Row(t0: Long, t1: Long) = ev.agg(min("s_us"), max("s_us")).head
    val direct = ev
      .withColumn("dur", greatest(col("s_us"), least(col("e_us"), lit(t1))) - col("s_us"))
      .groupBy("event_type").agg(sum("dur").as("busy"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val ty = r.getAs[String]("event_type")
      assert(r.getAs[Long]("busy_us") === direct(ty), s"type $ty")
      assert(r.getAs[Long]("window_us") === t1 - t0)
      assert(r.getAs[Long]("mean_span_us") ===
        r.getAs[Long]("busy_us") / r.getAs[Long]("n_arrivals"))
    }
  }

  test("mm17: codec round-trip and framing arithmetic") {
    // codec first: 16-bit LE round trip incl. negatives and edges
    val s = Array[Short](0, 1, -1, 32767, -32768, 12345, -12345)
    assert(graft.sources.PcmCodec.decode(graft.sources.PcmCodec.encode(s))
      .get.toSeq === s.toSeq)
    assert(graft.sources.PcmCodec.decode(Array[Byte](1)) === None)
    assert(graft.sources.PcmCodec.decode(null) === None)
    val rows = SparkEntry.queries("mm17_audio_frames")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val frames = r.getAs[Long]("total_frames")
      val clips = r.getAs[Long]("n_clips")
      // every clip has n ∈ [400, 784] samples → 2..5 frames
      assert(frames >= 2 * clips && frames <= 5 * clips)
      assert(r.getAs[Long]("active_frames") <= frames)
      assert(r.getAs[Long]("peak_frame_mean") <= 2048L)
      assert(r.getAs[Long]("total_samples") >= 400 * clips)
    }
  }
}
