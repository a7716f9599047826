package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SeasonalSpec extends SparkSpec {
  import spark.implicits._

  private val hourUs = 3600L * 1000000L
  private def ts(us: Long) = new java.sql.Timestamp(us / 1000L)

  /** c events for `key` inside epoch-hour `tick`. */
  private def burst(key: String, tick: Long, c: Int) =
    (0 until c).map(i => (key, ts(tick * hourUs + i * 1000L)))

  private def run(rows: Seq[(String, java.sql.Timestamp)], k: Long = 3L) =
    Seasonal.hourOfDayAnomalies(rows.toDF("k", "ts"), "k", "ts", k)
      .collect().map(r => (r.getAs[String]("k"), r.getAs[Long]("tick_hour")) ->
        ((r.getAs[Long]("hod"), r.getAs[Long]("n"), r.getAs[Long]("med"),
          r.getAs[Long]("mad"), r.getAs[Boolean]("is_anomaly")))).toMap

  test("hand fixture: MAD band flags the spike in its own hour-of-day slot") {
    // hod 0 over 5 days: counts 8,10,12,10,30 -> med 10, devs
    // 2,0,2,0,20 -> MAD 2, fence 6: only the 30 flags
    val rows = Seq(0, 1, 2, 3, 4).zip(Seq(8, 10, 12, 10, 30)).flatMap {
      case (day, c) => burst("a", day * 24L, c)
    }
    val out = run(rows)
    assert(out(("a", 96L)) == ((0L, 30L, 10L, 2L, true)))
    assert(out(("a", 0L)) == ((0L, 8L, 10L, 2L, false)))
    assert(out(("a", 48L)) == ((0L, 12L, 10L, 2L, false)))
  }

  test("MAD 0: every off-median tick flags (strict >), constant slot flags nothing") {
    // hod 0: 10,10,10,10,100 -> med 10, MAD 0 -> the 100 flags;
    // hod 1: constant 7 -> nothing flags
    val rows = (0 to 4).flatMap(day => burst("a", day * 24L,
        if (day == 4) 100 else 10)) ++
      (0 to 4).flatMap(day => burst("a", day * 24L + 1L, 7))
    val out = run(rows)
    assert(out(("a", 96L))._5 == true)
    assert((0 to 3).forall(d => out(("a", d * 24L))._5 == false))
    assert((0 to 4).forall(d => out(("a", d * 24L + 1L))._5 == false))
  }

  test("slots and keys are independent: a bimodal day profile is not anomalous") {
    // hod 0 always 10, hod 1 always 100 — globally bimodal, per-slot
    // constant; key b's scale never leaks into key a's profile
    val rows = (0 to 3).flatMap { day =>
      burst("a", day * 24L, 10) ++ burst("a", day * 24L + 1L, 100) ++
        burst("b", day * 24L, 1000)
    }
    val out = run(rows)
    assert(out.values.forall(!_._5))
    assert(out(("a", 1L))._1 == 1L && out(("a", 1L))._3 == 100L)
    assert(out(("b", 0L))._3 == 1000L)
  }
}
