package graft

class Round8nSpec extends SparkSpec {

  test("ev78 cascade: conservation and smoothing hold per type") {
    val rows = SparkEntry.queries("ev78_stage_cascade")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val a = r.getAs[Long]("total_arrivals")
      val dep = r.getAs[Long]("total_departures")
      val endB2 = r.getAs[Long]("end_b2")
      // conservation: departures = arrivals − whatever stage 1 still
      // holds at the end; the final-hour b1 is not in the output, but
      // dep ≤ a always and the gap is bounded by peak_b1
      assert(dep <= a)
      assert(a - dep <= r.getAs[Long]("peak_b1"))
      // caps: stage 2 is the tighter tier by construction
      assert(r.getAs[Long]("cap_stage2") <= r.getAs[Long]("cap_stage1"))
      assert(r.getAs[Long]("peak_b1") >= 0L)
      assert(r.getAs[Long]("peak_b2") >= endB2)
      assert(r.getAs[Long]("hours_b2") >= (if (endB2 > 0) 1L else 0L))
    }
  }

  test("ev78 closed form equals the sequential Lindley recursion") {
    // replay one type's cascade imperatively from the same hourly grid
    import org.apache.spark.sql.functions._
    val ev = graft.core.Tables.events(spark, sf)
      .select(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .groupBy(col("event_type"), col("h")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2)))
    val types = ev.map(_._1).distinct.sorted
    val hourMs = 3600L * 1000
    val lo = ev.map(_._2).min; val hi = ev.map(_._2).max
    val nHours = (hi - lo) / hourMs + 1
    val out = SparkEntry.queries("ev78_stage_cascade")(spark, sf)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    types.foreach { ty =>
      val byH = ev.filter(_._1 == ty).map(t => t._2 -> t._3).toMap
      val total = byH.values.sum
      val c1 = total * 11 / (10 * nHours); val c2 = total * 21 / (20 * nHours)
      var b1 = 0L; var b2 = 0L; var pb1 = 0L; var pb2 = 0L
      (0L until nHours).foreach { k =>
        val a = byH.getOrElse(lo + k * hourMs, 0L)
        val b1n = math.max(0L, b1 + a - c1)
        val dep = a + b1 - b1n
        b1 = b1n; pb1 = math.max(pb1, b1)
        b2 = math.max(0L, b2 + dep - c2); pb2 = math.max(pb2, b2)
      }
      val r = out(ty)
      assert(r.getAs[Long]("peak_b1") === pb1, s"peak_b1 $ty")
      assert(r.getAs[Long]("peak_b2") === pb2, s"peak_b2 $ty")
      assert(r.getAs[Long]("end_b2") === b2, s"end_b2 $ty")
    }
  }

  test("tx39 burstiness: tf/df ≥ 1 and octave census is conservative") {
    val rows = SparkEntry.queries("tx39_burstiness")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("mean_burst_fx") >= 10000L)
      assert(r.getAs[Long]("max_burst_fx") >= r.getAs[Long]("mean_burst_fx"))
      assert(r.getAs[Long]("n_bursty") <= r.getAs[Long]("n_tokens"))
    }
  }

  test("pk24 waterfill: exact budget exhaustion in rank order") {
    val rows = SparkEntry.queries("pk24_budget_waterfill")(spark, sf)
      .collect().sortBy(_.getAs[Long]("rank"))
    assert(rows.nonEmpty)
    val totalTokens = rows.map(_.getAs[Long]("src_tokens")).sum
    val budget = totalTokens * 30 / 100
    val allocated = rows.map(_.getAs[Long]("allocated"))
    assert(allocated.sum === math.min(budget, totalTokens))
    // allocation is a prefix: full sources, then one partial, then 0s
    val partialIdx = allocated.indexWhere(a => a > 0 &&
      a < rows(allocated.indexOf(a)).getAs[Long]("src_tokens"))
    allocated.zipWithIndex.foreach { case (a, i) =>
      val cap = rows(i).getAs[Long]("src_tokens")
      if (partialIdx >= 0 && i < partialIdx) assert(a === cap)
      if (partialIdx >= 0 && i > partialIdx) assert(a === 0L)
    }
    // quality ordering is descending
    val ttrs = rows.map(_.getAs[Long]("ttr_fx"))
    ttrs.sliding(2).foreach {
      case Array(x, y) => assert(x >= y)
      case _ =>
    }
  }
}
