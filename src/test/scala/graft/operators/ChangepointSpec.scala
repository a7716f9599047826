package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChangepointSpec extends SparkSpec {
  import spark.implicits._

  /** The textbook recurrence the closed form must reproduce, in the
    * operator's exact integer units. */
  private def refCusum(xs: Seq[Long], slackPpm: Long): Seq[BigInt] = {
    val n = BigInt(xs.length)
    val tot = BigInt(xs.sum)
    var s = BigInt(0)
    xs.map { x =>
      val d = BigInt(x) * n * 1000000 - tot * (1000000 + slackPpm)
      s = (s + d).max(BigInt(0))
      s
    }
  }

  test("cusumShift equals the classic recurrence (prefix-sum closed form)") {
    val xs = Seq(3L, 2L, 4L, 3L, 9L, 10L, 8L, 2L, 3L, 11L)
    val df = xs.zipWithIndex.map { case (x, i) => ("a", i.toLong, x) }
      .toDF("k", "tick", "n")
    val out = Changepoint.cusumShift(df, Seq("k"), "tick", "n",
        slackPpm = 100000L, hMeanTicksPpm = 1000000L)
      .orderBy("tick").collect()
    val tot = BigInt(xs.sum)
    val ref = refCusum(xs, 100000L)
    out.zip(ref).foreach { case (row, s) =>
      assert(BigInt(row.getAs[Long]("cusum_ppm")) == s / tot,
        s"tick ${row.getAs[Long]("tick")}")
      assert(row.getAs[Boolean]("alarm") == (s > BigInt(1000000) * tot))
    }
    // the planted level shift (9,10,8 then 11) must alarm somewhere
    assert(out.exists(_.getAs[Boolean]("alarm")))
    assert(!out(0).getAs[Boolean]("alarm"))
  }

  test("cusumShift: keys are independent; a flat series never alarms") {
    val df = ((0 until 8).map(i => ("flat", i.toLong, 5L)) ++
      (0 until 8).map(i => ("shift", i.toLong, if (i < 4) 1L else 9L)))
      .toDF("k", "tick", "n")
    val out = Changepoint.cusumShift(df, Seq("k"), "tick", "n", 100000L, 1000000L)
      .collect().groupBy(_.getString(0))
    assert(out("flat").forall(!_.getAs[Boolean]("alarm")))
    assert(out("shift").exists(_.getAs[Boolean]("alarm")))
    // flat series: deviations are all negative (slack), cusum pinned at 0
    assert(out("flat").forall(_.getAs[Long]("cusum_ppm") == 0L))
  }

  test("cusumShift fails loudly on a non-positive per-key total") {
    val df = Seq(("a", 0L, 3L), ("a", 1L, -3L)).toDF("k", "tick", "n")
    val e = intercept[Exception] {
      Changepoint.cusumShift(df, Seq("k"), "tick", "n", 100000L, 1000000L)
        .collect()
    }
    assert(e.getMessage.contains("positive per-key value total") ||
      Option(e.getCause).exists(_.getMessage.contains("positive per-key value total")))
  }

  test("tickCounts buckets on the step boundary") {
    val df = Seq(
      ("a", java.sql.Timestamp.valueOf("2024-01-01 00:59:59")),
      ("a", java.sql.Timestamp.valueOf("2024-01-01 01:00:00")),
      ("a", java.sql.Timestamp.valueOf("2024-01-01 01:30:00")))
      .toDF("k", "ts")
    val out = Changepoint.tickCounts(df, Seq("k"), "ts", 3600L)
      .orderBy("tick").collect().map(r => r.getAs[Long]("n"))
    assert(out.toSeq == Seq(1L, 2L))
  }
}
