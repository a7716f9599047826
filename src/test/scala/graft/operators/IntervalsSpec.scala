package graft.operators

import graft.SparkSpec

class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  private val hour = 3600L * 1000000L
  private def ts(us: Long) = new java.sql.Timestamp(us / 1000L)

  test("hourlyCoverage: hand sweep — overlaps, boundary ceilings, open end") {
    // a: [0.5h, 2h)   -> +1 at tick 1, -1 at tick 2
    // b: [1h,  3.5h)  -> +1 at tick 1 (exact boundary), -1 at tick 4
    // c: [2h,  open)  -> +1 at tick 2 (net 0 with a's close: no row)
    val iv = Seq(
      (ts(hour / 2), Some(ts(2 * hour))),
      (ts(hour), Some(ts(3 * hour + hour / 2))),
      (ts(2 * hour), None))
      .map { case (f, t) => (f, t.orNull) }.toDF("f", "t")
    val out = Intervals.hourlyCoverage(iv, "f", "t")
      .collect().map(r => r.getAs[Long]("tick_hour") ->
        ((r.getAs[Long]("delta"), r.getAs[Long]("n_open")))).toMap
    // tick 1: a and b both start -> +2, open = 2
    // tick 2: a closes, c opens -> net 0 -> NO row (change ticks only)
    // tick 4: b closes -> -1, open = 1 (c stays open forever)
    assert(out == Map(1L -> ((2L, 2L)), 4L -> ((-1L, 1L))))
  }

  test("hourlyCoverage: curve equals brute-force per-tick count") {
    val rng = new scala.util.Random(7)
    val iv = (0 until 60).map { _ =>
      val f = rng.nextInt(100).toLong * hour / 4
      val len = (1 + rng.nextInt(40)).toLong * hour / 4
      (ts(f), ts(f + len))
    }
    val out = Intervals.hourlyCoverage(iv.toDF("f", "t"), "f", "t")
      .collect().map(r => r.getAs[Long]("tick_hour") ->
        r.getAs[Long]("n_open")).toMap
    // brute: at each emitted tick H (epoch hours), count f <= H*hour < t
    out.foreach { case (h, n) =>
      val at = h * hour
      val ref = iv.count { case (f, t) =>
        f.getTime * 1000 <= at && at < t.getTime * 1000 }
      assert(n == ref.toLong, s"tick $h: got $n want $ref")
    }
    // the curve must end at zero (all intervals close)
    val last = out.toSeq.maxBy(_._1)
    assert(last._2 == 0L)
  }

  test("hourlyCoverage: null-from rows drop ENTIRELY — their to emits no -1") {
    // one valid interval [1h, 3h) plus a malformed (null, 2h) row: the
    // malformed row's close boundary must NOT fire (the curve would dip
    // to 0 at tick 2 and go -1 after tick 3 if it did)
    val iv = Seq(
      (Option(ts(hour)), Option(ts(3 * hour))),
      (None, Option(ts(2 * hour))))
      .map { case (f, t) => (f.orNull, t.orNull) }.toDF("f", "t")
    val out = Intervals.hourlyCoverage(iv, "f", "t")
      .collect().map(r => r.getAs[Long]("tick_hour") ->
        ((r.getAs[Long]("delta"), r.getAs[Long]("n_open")))).toMap
    assert(out == Map(1L -> ((1L, 1L)), 3L -> ((-1L, 0L))))
  }
}
