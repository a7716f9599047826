package graft.operators

import graft.SparkSpec

class ConstraintSpec extends SparkSpec {
  import spark.implicits._
  import Profile._

  private def run(df: org.apache.spark.sql.DataFrame, checks: Seq[Check]) =
    Profile.constraintReport(df, checks)
      .collect().map(r => (r.getAs[String]("check"),
        r.getAs[String]("column_name")) ->
        ((r.getAs[Long]("metric_ppm"), r.getAs[Boolean]("pass")))).toMap

  test("exact ppm metrics and verdicts on a hand table") {
    val df = Seq[(java.lang.Long, java.lang.Long, java.lang.Long)](
      (1L, 10L, 5L), (2L, 10L, 50L), (3L, null, 500L), (4L, 20L, 5000L))
      .toDF("id", "dupv", "amt")
    val out = run(df, Seq(
      Completeness("id"),                      // 4/4
      Completeness("dupv", 900000L),           // 3/4 = 750000 -> fail
      Uniqueness("id"),                        // 4/4 distinct
      Uniqueness("dupv", 500000L),             // 2 distinct / 3 nonnull
      BoundedBetween("amt", 1L, 1000L)))       // 3/4 in range -> fail
    assert(out(("completeness", "id")) == ((1000000L, true)))
    assert(out(("completeness", "dupv")) == ((750000L, false)))
    assert(out(("uniqueness", "id")) == ((1000000L, true)))
    assert(out(("uniqueness", "dupv")) == ((666666L, true)))
    assert(out(("bounded", "amt")) == ((750000L, false)))
  }

  test("vacuous passes: empty table; bounded over all-null column") {
    val empty = Seq.empty[(java.lang.Long, java.lang.Long)].toDF("a", "b")
    val out = run(empty, Seq(Completeness("a"), Uniqueness("a"),
      BoundedBetween("b", 0L, 1L)))
    assert(out.values.forall(_ == ((1000000L, true))))
    val allNull = Seq[(java.lang.Long, java.lang.Long)]((1L, null), (2L, null))
      .toDF("a", "b")
    val out2 = run(allNull, Seq(BoundedBetween("b", 0L, 1L),
      Uniqueness("b")))
    assert(out2(("bounded", "b")) == ((1000000L, true)))
    assert(out2(("uniqueness", "b")) == ((1000000L, true)))
  }

  test("report preserves check order and one row per check") {
    val df = Seq((1L, 2L)).toDF("a", "b")
    val rows = Profile.constraintReport(df,
        Seq(Uniqueness("b"), Completeness("a"), BoundedBetween("a", 0L, 9L)))
      .collect().map(_.getAs[String]("check")).toSeq
    assert(rows == Seq("uniqueness", "completeness", "bounded"))
  }

  // --- columnDrift ---

  private def drift(a: org.apache.spark.sql.DataFrame,
                    b: org.apache.spark.sql.DataFrame, cols: Seq[String]) =
    Profile.columnDrift(a, b, cols).collect()
      .map(r => r.getAs[String]("column_name") -> r).toMap

  test("columnDrift: exact per-side stats and deltas") {
    val a = Seq[java.lang.Long](1L, 2L, 3L, null).toDF("v")
    val b = Seq[java.lang.Long](10L, null, null).toDF("v")
    val r = drift(a, b, Seq("v"))("v")
    assert(r.getAs[Long]("n_a") == 4L && r.getAs[Long]("n_b") == 3L)
    assert(r.getAs[Long]("null_ppm_a") == 250000L)
    assert(r.getAs[Long]("null_ppm_b") == 666666L)
    assert(r.getAs[Long]("null_ppm_delta") == 416666L)
    assert(r.getAs[Long]("ndv_a") == 3L && r.getAs[Long]("ndv_b") == 1L)
    assert(r.getAs[Long]("ndv_ratio_ppm") == 333333L)
    assert(r.getAs[Long]("min_a") == 1L && r.getAs[Long]("max_a") == 3L)
    assert(r.getAs[Long]("mean_milli_a") == 2000L)
    assert(r.getAs[Long]("mean_milli_b") == 10000L)
    assert(r.getAs[Long]("mean_shift_milli") == 8000L)
  }

  test("columnDrift: negative means floor consistently; empty side reports nulls") {
    val a = Seq[java.lang.Long](-5L, -2L).toDF("v") // mean -3.5 -> -3500
    val b = Seq[java.lang.Long](-2L).toDF("v")
    val r = drift(a, b, Seq("v"))("v")
    assert(r.getAs[Long]("mean_milli_a") == -3500L)
    assert(r.getAs[Long]("mean_shift_milli") == 1500L)
    val empty = Seq.empty[java.lang.Long].toDF("v")
    val r2 = drift(a, empty, Seq("v"))("v")
    assert(r2.getAs[Long]("n_b") == 0L && r2.getAs[Long]("ndv_b") == 0L)
    assert(r2.isNullAt(r2.fieldIndex("mean_milli_b")))
    assert(r2.isNullAt(r2.fieldIndex("null_ppm_b")))
    assert(r2.getAs[Long]("ndv_ratio_ppm") == 0L)
  }
}
