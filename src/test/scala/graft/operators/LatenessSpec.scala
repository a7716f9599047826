package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, timestamp_micros}

class LatenessSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Long)], delays: Seq[Long]) =
    Lateness.watermarkAdvisor(
      rows.toDF("g", "arr", "us").withColumn("ts", timestamp_micros(col("us"))),
      "g", "arr", "ts", delays)
      .collect().map(r => r.getAs[String]("g") -> r).toMap

  test("hand stream: lateness vs the running high-water mark, grid drops exact") {
    val s = 1000000L
    // arrival order: t=0, t=100s, t=95s (5s late), t=40s (60s late),
    // t=200s, t=199s (1s late... lateness = 200-199 = 1s, NOT > 1s)
    val rows = Seq(
      ("a", 1L, 0L), ("a", 2L, 100 * s), ("a", 3L, 95 * s),
      ("a", 4L, 40 * s), ("a", 5L, 200 * s), ("a", 6L, 199 * s))
    val out = run(rows, Seq(1L, 10L, 60L))("a")
    assert(out.getAs[Long]("n_events") == 6L)
    // late rows: 95s (5s), 40s (60s), 199s (1s) -> 3 of 6
    assert(out.getAs[Long]("disorder_ppm") == 500000L)
    assert(out.getAs[Long]("max_late_micros") == 60 * s)
    // delay 1s: drops lateness > 1s -> 5s and 60s rows = 2/6
    assert(out.getAs[Long]("drop_ppm_1") == 333333L)
    // delay 10s: only the 60s row
    assert(out.getAs[Long]("drop_ppm_10") == 166666L)
    // delay 60s: lateness > 60s -> none (60s is NOT > 60s)
    assert(out.getAs[Long]("drop_ppm_60") == 0L)
  }

  test("groups are independent; an in-order stream has zero disorder") {
    val rows = Seq(("x", 1L, 10L), ("x", 2L, 20L), ("x", 3L, 30L),
      ("y", 1L, 100L), ("y", 2L, 50L))
    val out = run(rows, Seq(1L))
    assert(out("x").getAs[Long]("disorder_ppm") == 0L)
    assert(out("x").getAs[Long]("max_late_micros") == 0L)
    assert(out("y").getAs[Long]("disorder_ppm") == 500000L)
  }
}
