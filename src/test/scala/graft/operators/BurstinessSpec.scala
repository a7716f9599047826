package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class BurstinessSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(1700000000000L + sec * 1000L)

  private def run(rows: Seq[(Long, String, Timestamp, Long)]) =
    Burstiness.interArrivalCv2(
        rows.toDF("u", "g", "ts", "eid"), "u", "g", "ts", "eid")
      .collect().map(r => r.getAs[String]("g") ->
        ((r.getAs[Long]("n_gaps"), r.getAs[Long]("mean_gap_micros"),
          Option(r.getAs[java.lang.Long]("cv2_milli"))
            .map(_.longValue())))).toMap

  test("periodic stream: cv2 exactly 0; bursty stream well above 1000") {
    val periodic = (0L to 5L).map(i => (1L, "per", ts(i * 10), i))
    // gaps 1, 1, 98 seconds: n=3, sg=100e6us, sg2=(1+1+9604)e12
    val bursty = Seq(0L, 1L, 2L, 100L).zipWithIndex
      .map { case (sec, i) => (1L, "bur", ts(sec), i.toLong) }
    val out = run(periodic ++ bursty)
    assert(out("per") == ((5L, 10000000L, Some(0L))))
    // cv2 = 1000*(3*9606e12 - 1e16) div 1e16 = 1881
    assert(out("bur") == ((3L, 33333333L, Some(1881L))))
  }

  test("gaps never cross entities; single-event entities contribute none") {
    val rows = Seq(
      (1L, "g", ts(0), 1L), (1L, "g", ts(10), 2L),
      (2L, "g", ts(5), 3L), // singleton user: no gap
      (3L, "g", ts(100), 4L), (3L, "g", ts(110), 5L))
    val out = run(rows)
    assert(out("g")._1 == 2L) // one gap per two-event user
    assert(out("g")._2 == 10000000L)
  }

  test("same-instant repeats count as zero gaps; one-gap group has null cv2") {
    val rows = Seq(
      (1L, "z", ts(3), 1L), (1L, "z", ts(3), 2L), // zero gap
      (2L, "one", ts(0), 3L), (2L, "one", ts(7), 4L))
    val out = run(rows)
    assert(out("z") == ((1L, 0L, None))) // sg = 0 -> cv2 null
    assert(out("one") == ((1L, 7000000L, None))) // n_gaps < 2 -> null
  }

  test("tickDispersion: silent ticks drive the Fisher index; regular is 0, Poisson ~1000") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_micros}
    val hr = 3600000000L
    // "steady": 1 event every hour for 8 hours -> var 0 -> D = 0
    val steady = (0L until 8L).map(t => ("steady", t * hr))
    // "bursty": 8 events in hour 0 plus one in hour 7 -> span 8,
    // active 2, total 9, c2 = 65: D = 1000*(8*65 - 81)/(8*9) = 6097
    val bursty = (0L until 8L).map(_ => ("bursty", 5L)) :+
      (("bursty", 7L * hr))
    val rows = (steady ++ bursty).toDF("g", "us")
      .withColumn("ts", timestamp_micros(col("us")))
    val out = Burstiness.tickDispersion(rows, "g", "ts", 3600L)
      .collect().map(r => r.getAs[String]("g") ->
        ((r.getAs[Long]("span_ticks"), r.getAs[Long]("active_ticks"),
          r.getAs[Long]("total"), r.getAs[Long]("mean_milli"),
          r.getAs[Long]("dispersion_milli")))).toMap
    assert(out("steady") == ((8L, 8L, 8L, 1000L, 0L)))
    assert(out("bursty") == ((8L, 2L, 9L, 1125L, 6097L)))
  }
}
