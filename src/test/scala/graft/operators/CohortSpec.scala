package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

class CohortSpec extends SparkSpec {
  import spark.implicits._

  private val week = 7L * 86400L * 1000000L
  private def ts(weeks: Long, extraMicros: Long = 0L) =
    new Timestamp((weeks * week + extraMicros) / 1000L)

  private def run(rows: Seq[(Long, Timestamp, String)]) =
    Cohort.retention(rows.toDF("u", "t", "ty"), "u", "t", "ty", "signup")
      .collect().map(r => (r.getAs[Long]("cohort_period"),
        r.getAs[Long]("period_offset")) ->
        ((r.getAs[Long]("n_active"), r.getAs[Long]("cohort_size"),
          r.getAs[Long]("retention_ppm")))).toMap

  test("hand triangle: two cohorts, decaying activity") {
    val rows = Seq(
      // cohort week 100: users 1,2 sign up; 1 active weeks +1,+2; 2 only +1
      (1L, ts(100), "signup"), (2L, ts(100, 5L), "signup"),
      (1L, ts(101), "click"), (2L, ts(101), "view"), (1L, ts(102), "click"),
      // cohort week 101: user 3
      (3L, ts(101, 9L), "signup"), (3L, ts(103), "click"))
    val out = run(rows)
    assert(out((100L, 0L)) == ((2L, 2L, 1000000L)))
    assert(out((100L, 1L)) == ((2L, 2L, 1000000L)))
    assert(out((100L, 2L)) == ((1L, 2L, 500000L)))
    assert(out((101L, 0L)) == ((1L, 1L, 1000000L)))
    assert(out((101L, 2L)) == ((1L, 1L, 1000000L)))
    assert(!out.contains((101L, 1L)))
  }

  test("pre-signup activity ignored; duplicate same-week events collapse") {
    val rows = Seq(
      (1L, ts(99), "click"), // before signup: ignored
      (1L, ts(100), "signup"),
      (1L, ts(101, 1L), "click"), (1L, ts(101, 2L), "view")) // one active week
    val out = run(rows)
    assert(out == Map((100L, 0L) -> ((1L, 1L, 1000000L)),
      (100L, 1L) -> ((1L, 1L, 1000000L))))
  }

  test("non-signup users contribute nothing; earliest signup wins") {
    val rows = Seq(
      (9L, ts(100), "click"), // never signs up
      (1L, ts(102), "signup"), (1L, ts(100), "signup"), // first = week 100
      (1L, ts(103), "click"))
    val out = run(rows)
    assert(out.keySet == Set((100L, 0L), (100L, 2L), (100L, 3L)))
  }
}
