package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ResampleSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("locfGrid: hand-computed grid, carry, and gap ages") {
    val obs = Seq(
      ("a", ts("2024-01-01 00:05:00"), 1L, 10.0),
      ("a", ts("2024-01-01 07:00:00"), 2L, 20.0),
      ("b", ts("2024-01-01 13:00:00"), 3L, 30.0))
      .toDF("k", "ts", "event_id", "value")
    val out = Resample.locfGrid(obs, "k", "ts", Seq("event_id", "value"), 21600L)
      .orderBy("k", "grid_ts").collect()
    // global end tick = floor(13:00 / 6h) = 12:00
    // a: ticks 00:00 (no obs yet -> nulls), 06:00 (carry id 1), 12:00 (id 2)
    // b: ticks 12:00 only (first obs tick; obs at 13:00 is later -> nulls)
    assert(out.length == 4)
    val a0 = out(0)
    assert(a0.getAs[String]("k") == "a" &&
      a0.getAs[java.sql.Timestamp]("grid_ts") == ts("2024-01-01 00:00:00") &&
      a0.isNullAt(a0.fieldIndex("event_id")) && a0.isNullAt(a0.fieldIndex("gap_micros")))
    val a1 = out(1)
    assert(a1.getAs[java.sql.Timestamp]("grid_ts") == ts("2024-01-01 06:00:00") &&
      a1.getAs[Long]("event_id") == 1L && a1.getAs[Double]("value") == 10.0 &&
      a1.getAs[Long]("gap_micros") == (6L * 3600 - 5L * 60) * 1000000L)
    val a2 = out(2)
    assert(a2.getAs[java.sql.Timestamp]("grid_ts") == ts("2024-01-01 12:00:00") &&
      a2.getAs[Long]("event_id") == 2L && a2.getAs[Double]("value") == 20.0 &&
      a2.getAs[Long]("gap_micros") == 5L * 3600 * 1000000L)
    val b0 = out(3)
    assert(b0.getAs[String]("k") == "b" &&
      b0.getAs[java.sql.Timestamp]("grid_ts") == ts("2024-01-01 12:00:00") &&
      b0.isNullAt(b0.fieldIndex("event_id")))
  }

  test("locfGrid: exact-timestamp collisions collapse to the max payload struct") {
    val obs = Seq(
      ("a", ts("2024-01-01 00:00:00"), 5L, 50.0),
      ("a", ts("2024-01-01 00:00:00"), 9L, 90.0), // same ts, larger id wins
      ("a", ts("2024-01-01 00:00:00"), 7L, 70.0))
      .toDF("k", "ts", "event_id", "value")
    val out = Resample.locfGrid(obs, "k", "ts", Seq("event_id", "value"), 3600L)
      .collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("event_id") == 9L && out(0).getAs[Double]("value") == 90.0)
  }

  test("locfGrid: null keys and timestamps are dropped, not gridded") {
    val obs = Seq(
      (Some("a"), Some(ts("2024-01-01 00:30:00")), 1L),
      (None, Some(ts("2024-01-01 05:00:00")), 2L),
      (Some("c"), None, 3L))
      .toDF("k", "ts", "event_id")
    val out = Resample.locfGrid(obs, "k", "ts", Seq("event_id"), 3600L)
      .collect()
    assert(out.map(_.getAs[String]("k")).distinct.toSeq == Seq("a"))
  }

  test("locfGrid: perKeyEnd grids each key only to its own last tick") {
    val obs = Seq(
      ("a", ts("2024-01-01 00:05:00"), 1L),
      ("a", ts("2024-01-01 07:00:00"), 2L),
      ("b", ts("2024-01-01 13:00:00"), 3L)) // global end would be 12:00+
      .toDF("k", "ts", "event_id")
    val out = Resample.locfGrid(obs, "k", "ts", Seq("event_id"), 21600L,
        perKeyEnd = true)
      .collect().groupBy(_.getString(0)).view.mapValues(_.length).toMap
    // a: ticks 00:00 and 06:00 (its own last tick; NOT 12:00); b: 12:00
    assert(out == Map("a" -> 2, "b" -> 1))
  }

  test("locfGrid: plan has no window over the observation stream") {
    val obs = Seq(("a", ts("2024-01-01 00:30:00"), 1L)).toDF("k", "ts", "event_id")
    val plan = Resample.locfGrid(obs, "k", "ts", Seq("event_id"), 3600L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected window:\n$plan")
    assert(plan.contains("AsofJoin"), s"expected the as-of merge exec:\n$plan")
  }

  test("timeWeightedAvg: hand fixture — held intervals weight the mean") {
    // key a: 10.00 held 3s, 20.00 held 1s, 30.00 closes (weight 0)
    // twa = (1000*3e6 + 2000*1e6) / 4e6 = 1250 cents
    val obs = Seq(
      ("a", ts("2026-01-01 00:00:00"), 1L, 10.0),
      ("a", ts("2026-01-01 00:00:03"), 2L, 20.0),
      ("a", ts("2026-01-01 00:00:04"), 3L, 30.0),
      ("b", ts("2026-01-01 00:00:00"), 4L, 99.0))
      .toDF("k", "ts", "id", "v")
    val out = Resample.timeWeightedAvg(obs, "k", "ts", "v", "id")
      .collect().map(r => r.getAs[String]("k") ->
        ((r.getAs[Long]("n_obs"), r.getAs[Long]("span_us"),
          Option(r.getAs[Any]("twa_cents")).map(_.asInstanceOf[Long]))))
      .toMap
    assert(out("a") == ((3L, 4000000L, Some(1250L))))
    // single-observation key: nothing ever held -> null twa
    assert(out("b") == ((1L, 0L, None)))
  }

  test("timeWeightedAvg: chatty sampling does not move the held-value answer") {
    // value 10.00 held 4s then 20.00 held 4s — twa 1500 cents; the
    // same signal re-sampled every second must give the same answer
    // (this is exactly what a plain mean gets wrong under bursts)
    val sparse = Seq(
      ("a", ts("2026-01-01 00:00:00"), 1L, 10.0),
      ("a", ts("2026-01-01 00:00:04"), 2L, 20.0),
      ("a", ts("2026-01-01 00:00:08"), 3L, 20.0))
    val chatty = (0 to 8).map(i =>
      ("a", ts(f"2026-01-01 00:00:0$i"), i.toLong, if (i < 4) 10.0 else 20.0))
    def twa(rows: Seq[(String, java.sql.Timestamp, Long, Double)]) =
      Resample.timeWeightedAvg(rows.toDF("k", "ts", "id", "v"),
        "k", "ts", "v", "id").collect()(0).getAs[Long]("twa_cents")
    assert(twa(sparse) == 1500L)
    assert(twa(chatty) == 1500L)
  }

  test("timeWeightedAvg: same-timestamp duplicates and nulls are harmless") {
    val obs = Seq(
      ("a", ts("2026-01-01 00:00:00"), 1L, 10.0), // zero-width (tied, lower id)
      ("a", ts("2026-01-01 00:00:00"), 2L, 77.0), // tie WINNER holds 2s
      ("a", ts("2026-01-01 00:00:02"), 3L, 10.0),
      (null, ts("2026-01-01 00:00:00"), 4L, 5.0),
      ("a", null, 5L, 5.0))
      .asInstanceOf[Seq[(String, java.sql.Timestamp, Long, Double)]]
      .toDF("k", "ts", "id", "v")
    val r = Resample.timeWeightedAvg(obs, "k", "ts", "v", "id")
      .collect().filter(_.getAs[String]("k") == "a")(0)
    assert(r.getAs[Long]("n_obs") == 3L)
    assert(r.getAs[Long]("span_us") == 2000000L)
    // the tie-break LAST value (77.00) holds the whole 2s interval —
    // the earlier tied 10.00 is a superseded same-instant write
    assert(r.getAs[Long]("twa_cents") == 7700L)
  }
}
