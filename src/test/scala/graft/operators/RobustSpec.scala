package graft.operators

import graft.SparkSpec

class RobustSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Long)], k: Long = 5L) =
    Robust.madOutliers(rows.toDF("g", "v"), "g", "v", k)
      .collect().map(r => r.getAs[String]("g") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("median"), r.getAs[Long]("mad"),
          r.getAs[Long]("n_outliers")))).toMap

  test("hand fixture: median 10, MAD 2, fence at 10±10 flags only 1000") {
    // values 8..12 plus one gross outlier
    val rows = Seq(8L, 9L, 10L, 11L, 12L, 1000L).map(("a", _))
    // sorted: 8 9 10 11 12 1000; n=6 -> rank ceil(3)=3 -> median 10
    // devs: 2 1 0 1 2 990 -> sorted 0 1 1 2 2 990 -> mad rank 3 = 1
    // fence: dev > 5 -> only 990
    assert(run(rows)("a") == ((6L, 10L, 1L, 1L)))
  }

  test("constant group flags nothing; MAD-0 group flags every off-median row") {
    val rows = Seq(("flat", 7L), ("flat", 7L), ("flat", 7L),
      ("spiky", 5L), ("spiky", 5L), ("spiky", 5L), ("spiky", 6L))
    val out = run(rows)
    assert(out("flat") == ((3L, 7L, 0L, 0L)))
    // spiky: median 5, devs 0 0 0 1 -> mad 0; dev 1 > 0 flagged
    assert(out("spiky") == ((4L, 5L, 0L, 1L)))
  }

  test("a 40% contamination cannot move the fence (breakdown property)") {
    val clean = (1L to 6L).map(i => ("a", 100L + i))
    val corrupt = (1L to 4L).map(i => ("a", 100000L * i))
    val out = run(clean ++ corrupt)("a")
    // median stays within the clean cluster, all 4 corrupt rows flagged
    assert(out._2 >= 101L && out._2 <= 106L)
    assert(out._4 == 4L)
  }

  test("even-count group picks the lower middle (PERCENTILE_DISC rank)") {
    val rows = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L))
    assert(run(rows)("a")._2 == 2L)
  }
}
