package graft

class Round8oSpec extends SparkSpec {

  test("q79 decay: octave census conserves users and bounds scores") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q79_halflife_decay")(spark, sf).collect()
    assert(rows.nonEmpty)
    val nUsers = rows.map(_.getAs[Long]("n_users")).sum
    val direct = graft.core.Tables.events(spark, sf)
      .select(col("event_type"), col("user_id")).distinct().count()
    assert(nUsers === direct) // every (type, user) lands in exactly one octave
    rows.foreach { r =>
      val oct = r.getAs[Long]("octave")
      val mx = r.getAs[Long]("max_score_fx")
      // octave envelope: 2^oct ≤ max < 2^(oct+1)
      assert(mx >= (1L << oct) && mx < (1L << (oct + 1)))
      // a single event is worth at least 1 (cap) and at most Fx
      assert(r.getAs[Long]("mass_fx") >= r.getAs[Long]("n_users"))
    }
  }

  test("ev79 reorder depth matches a sequential buffer replay") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("ev79_reorder_depth")(spark, sf)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    assert(out.nonEmpty)
    val ev = graft.core.Tables.events(spark, sf)
      .select(col("event_type"), col("ts"), col("event_id"))
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2)))
    out.keys.foreach { ty =>
      val evs = ev.filter(_._1 == ty)
      val arrOrder = evs.sortBy(_._3) // arrival = producer sequence
      val tsRank = evs.sortBy(t => (t._2, t._3)).zipWithIndex
        .map { case (t, i) => t._3 -> (i + 1L) }.toMap
      // replay: buffer holds arrived-but-not-released events
      var released = 0L; var maxDepth = 0L; var sumDepth = 0L; var drained = 0L
      val pending = scala.collection.mutable.SortedSet[Long]()
      arrOrder.foreach { t =>
        pending += tsRank(t._3)
        while (pending.nonEmpty && pending.head == released + 1) {
          pending -= pending.head; released += 1
          val depth = pending.size.toLong
          maxDepth = math.max(maxDepth, depth); sumDepth += depth
          if (depth == 0) drained += 1
        }
      }
      val r = out(ty)
      assert(r.getAs[Long]("n_events") === evs.length.toLong)
      assert(r.getAs[Long]("buffer_size") === maxDepth)
      assert(r.getAs[Long]("mean_depth_fx") === sumDepth * 10000L / evs.length)
      assert(r.getAs[Long]("n_drained") === drained)
    }
  }

  test("tx40 collocations: PMI octave is exact and ordering is total") {
    val rows = SparkEntry.queries("tx40_pmi_collocations")(spark, sf)
      .collect().sortBy(_.getAs[Long]("rank"))
    assert(rows.nonEmpty && rows.length <= 50)
    def bitlen(x: Long): Long = 63 - java.lang.Long.numberOfLeadingZeros(x)
    var prev: Option[(Long, Long, String, String)] = None
    rows.foreach { r =>
      val c12 = r.getAs[Long]("c12"); val c1 = r.getAs[Long]("c1")
      val c2 = r.getAs[Long]("c2"); val oct = r.getAs[Long]("pmi_oct")
      assert(c12 >= 3 && c1 >= c12 && c2 >= c12)
      // recompute the octave from the marginals and a direct N
      val key = (-oct, -c12, r.getAs[String]("w1"), r.getAs[String]("w2"))
      prev.foreach { p =>
        assert(Ordering[(Long, Long, String, String)].lteq(p, key))
      }
      prev = Some(key)
    }
    // the top-1 pair's octave re-derives from a direct recount
    import org.apache.spark.sql.functions._
    val docs = graft.core.Tables.documents(spark, sf)
      .select(col("text")).collect().map(_.getString(0))
    val bigrams = docs.flatMap { t =>
      val toks = t.trim.split("\\s+"); toks.dropRight(1).zip(toks.drop(1))
    }
    val n = bigrams.length.toLong
    val top = rows.head
    val w1 = top.getAs[String]("w1"); val w2 = top.getAs[String]("w2")
    val c12 = bigrams.count(p => p._1 == w1 && p._2 == w2).toLong
    val c1 = bigrams.count(_._1 == w1).toLong
    val c2 = bigrams.count(_._2 == w2).toLong
    assert(top.getAs[Long]("c12") === c12)
    assert(top.getAs[Long]("c1") === c1)
    assert(top.getAs[Long]("c2") === c2)
    assert(top.getAs[Long]("pmi_oct") === bitlen(c12 * n) - bitlen(c1 * c2))
  }
}
