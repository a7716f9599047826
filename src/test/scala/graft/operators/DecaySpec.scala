package graft.operators

import graft.SparkSpec

class DecaySpec extends SparkSpec {
  import spark.implicits._

  private val day = 24L * 3600L * 1000000L
  private def ts(us: Long) = new java.sql.Timestamp(us / 1000L)

  test("halfLifeCounts: hand fixture — counts halve per whole half-life") {
    // anchor = 100 days; key a: 4 events today (age 0), 2 events 10
    // days ago (age 1 at 7-day half-life), 1 event 50 days ago (age 7)
    // decayed = 4 + (2 >> 1) + (1 >> 7) = 4 + 1 + 0 = 5; raw = 7
    val asOf = 100L * day
    val rows = Seq.fill(4)(("a", ts(asOf))) ++
      Seq.fill(2)(("a", ts(asOf - 10L * day))) ++
      Seq(("a", ts(asOf - 50L * day))) ++
      Seq(("b", ts(asOf - 8L * day))) // age 1: 1 >> 1 = 0
    val out = Decay.halfLifeCounts(rows.toDF("k", "ts"), "k", "ts", 7, asOf)
      .collect().map(r => r.getAs[String]("k") ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("decayed_weight"),
          r.getAs[Long]("freshness_ppm")))).toMap
    assert(out("a") == ((7L, 5L, 714285L)))
    assert(out("b") == ((1L, 0L, 0L)))
  }

  test("halfLifeCounts: boundary bucket, future clamp, stale drop") {
    val asOf = 100L * day
    val rows = Seq(
      ("c", ts(asOf - 7L * day)),      // exactly one half-life -> age 1
      ("c", ts(asOf - 7L * day + 1L)), // one microsecond newer -> age 0
      ("c", ts(asOf + 3L * day)),      // future event clamps to age 0
      ("d", ts(asOf - 500L * day)))    // age 71 >= 63: dropped entirely
    val out = Decay.halfLifeCounts(rows.toDF("k", "ts"), "k", "ts", 7, asOf)
      .collect().map(r => r.getAs[String]("k") ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("decayed_weight"))))
      .toMap
    assert(out("c") == ((3L, 2L)))
    assert(!out.contains("d"))
  }

  test("halfLifeCounts: decayed weight is mergeable across arbitrary splits") {
    // bucket counts are plain partial aggregates: computing on the
    // union equals summing per-partition bucket counts first
    val asOf = 100L * day
    val rows = (0 until 40).map(i => ("k", ts(asOf - (i % 20).toLong * day)))
    val whole = Decay.halfLifeCounts(rows.toDF("k", "ts"), "k", "ts", 7, asOf)
      .collect()(0).getAs[Long]("decayed_weight")
    // manual: ages 0 (days 0-6), 1 (7-13), 2 (14-19) with 2 events/day
    val manual = (14L >> 0) + (14L >> 1) + (12L >> 2)
    assert(whole == manual)
  }
}
