package graft.operators

import graft.SparkSpec

class DecaySpec extends SparkSpec {
  import spark.implicits._

  private val day = 24L * 3600L * 1000000L
  private def ts(us: Long) = new java.sql.Timestamp(us / 1000L)

  test("halfLifeCounts: hand fixture — calendar buckets halve per half-life") {
    // halfLife 7d -> bucket = day div 7. anchor at day 99 -> bucket 14.
    // key a: 4 events in bucket 14 (day 99), 3 in bucket 13 (day 92),
    // 2 in bucket 12 (day 85): decayed = 4 + 3>>1 + 2>>2 = 5, raw 9
    val asOf = 99L * day
    val rows = Seq.fill(4)(("a", ts(99L * day))) ++
      Seq.fill(3)(("a", ts(92L * day))) ++
      Seq.fill(2)(("a", ts(85L * day))) ++
      Seq(("b", ts(92L * day))) // age 1: 1 >> 1 = 0
    val out = Decay.halfLifeCounts(rows.toDF("k", "ts"), "k", "ts", 7, asOf)
      .collect().map(r => r.getAs[String]("k") ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("decayed_weight"),
          r.getAs[Long]("freshness_ppm")))).toMap
    assert(out("a") == ((9L, 5L, 555555L)))
    assert(out("b") == ((1L, 0L, 0L)))
  }

  test("halfLifeCounts: bucket boundary, future clamp, stale drop") {
    val asOf = 99L * day // anchor bucket 14 (days 98-104)
    val rows = Seq(
      ("c", ts(98L * day)),      // first day of bucket 14 -> age 0
      ("c", ts(98L * day - 1L)), // one microsecond earlier -> bucket 13
      ("c", ts(120L * day)),     // future bucket 17 clamps to age 0
      ("d", ts(500L * day)))     // future-only key also clamps
      .toDF("k", "ts")
    val out = Decay.halfLifeCounts(rows, "k", "ts", 7, asOf)
      .collect().map(r => r.getAs[String]("k") ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("decayed_weight"))))
      .toMap
    assert(out("c") == ((3L, 2L))) // 1@age0 + 1@age1(=0) + 1@clamped0
    assert(out("d") == ((1L, 1L)))
    // stale: anchor far in the future drops everything (age >= 63)
    val stale = Decay.halfLifeCounts(
      Seq(("e", ts(7L * day))).toDF("k", "ts"), "k", "ts", 7,
      asOfMicros = 600L * day)
    assert(stale.isEmpty)
  }

  test("halfLifeCounts: decayed weight is mergeable across arbitrary splits") {
    // bucket counts are plain partial aggregates: computing on the
    // union equals summing per-partition bucket counts first
    val asOf = 100L * day // anchor bucket 14
    val rows = (0 until 40).map(i => ("k", ts((81L + i % 20) * day)))
    val whole = Decay.halfLifeCounts(rows.toDF("k", "ts"), "k", "ts", 7, asOf)
      .collect()(0).getAs[Long]("decayed_weight")
    // days 81-83 -> bucket 11 (x2 = 6 events), 84-90 -> 12 (14),
    // 91-97 -> 13 (14), 98-100 -> 14 (6)
    val manual = (6L >> 3) + (14L >> 2) + (14L >> 1) + (6L >> 0)
    assert(whole == manual)
  }
}
