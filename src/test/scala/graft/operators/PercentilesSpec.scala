package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Distributed exact percentile vs the built-in single-reducer aggregate:
  * results must be bit-identical (same interpolation arithmetic) on every
  * shape — few groups, many groups, duplicates, single-element groups,
  * values split across many partitions.
  */
class PercentilesSpec extends SparkSpec {
  import spark.implicits._

  private def builtIn(df: org.apache.spark.sql.DataFrame, p: Double) =
    df.groupBy("k").agg(expr(s"percentile(v, $p)").as("exp"))
      .collect().map(r => r.get(0) -> r.getDouble(1)).toMap

  private def dist(df: org.apache.spark.sql.DataFrame, p: Double) =
    Percentiles.percentileCont(df, "k", "v", Seq(p))
      .collect().map(r => r.get(0) -> r.getDouble(2)).toMap

  test("matches built-in percentile bitwise across group shapes") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 5000).map { i =>
      val k = s"g${i % 7}"
      val v = math.floor(rnd.nextDouble() * 1000) / 4.0 // many duplicates
      (k, v)
    } :+ (("singleton", 42.25))
    val df = rows.toDF("k", "v").repartition(13)
    for (p <- Seq(0.0, 0.25, 0.5, 0.9, 0.95, 1.0)) {
      val exp = builtIn(df, p)
      val got = dist(df, p)
      assert(got.keySet == exp.keySet)
      exp.foreach { case (k, e) =>
        assert(java.lang.Double.doubleToLongBits(got(k)) ==
          java.lang.Double.doubleToLongBits(e), s"p=$p key=$k: ${got(k)} != $e")
      }
    }
  }

  test("multiple percentiles in one pass; nulls ignored like the built-in") {
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0)),
      ("a", Some(2.0)), ("b", Some(10.0)))
      .toDF("k", "v")
    val wide = Percentiles.percentileContWide(df, "k", "v",
      Seq(0.5 -> "p50", 1.0 -> "p100"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(wide("a") == ((2.0, 3.0)))
    assert(wide("b") == ((10.0, 10.0)))
  }

  test("multi-column single-pass form matches per-column results bitwise") {
    val rnd = new scala.util.Random(3)
    val df = (1 to 3000).map { i =>
      (s"g${i % 4}", rnd.nextDouble() * 100, math.floor(rnd.nextDouble() * 40).toDouble)
    }.toDF("k", "a", "b").repartition(9)
    val multi = Percentiles.percentileContMultiWide(df, "k", Seq(
        "a" -> Seq(0.5 -> "a50", 0.9 -> "a90"),
        "b" -> Seq(0.25 -> "b25")))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val a = builtIn(df.select(col("k"), col("a").as("v")), 0.5)
    val a9 = builtIn(df.select(col("k"), col("a").as("v")), 0.9)
    val b = builtIn(df.select(col("k"), col("b").as("v")), 0.25)
    multi.foreach { case (k, (a50, a90, b25)) =>
      assert(a50 == a(k) && a90 == a9(k) && b25 == b(k), s"mismatch for $k")
    }
    assert(multi.size == 4)
  }

  test("percentileDisc matches Spark's built-in percentile_disc") {
    val rnd = new scala.util.Random(5)
    val df = ((1 to 2000).map(i => (s"g${i % 3}", math.floor(rnd.nextDouble() * 200) / 2.0))
      :+ (("one", 7.5))).toDF("k", "v").repartition(11)
    for (p <- Seq(0.0, 0.25, 0.5, 0.95, 1.0)) {
      val exp = df.groupBy("k")
        .agg(expr(s"percentile_disc($p) WITHIN GROUP (ORDER BY v)").as("e"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val got = Percentiles.percentileDisc(df, "k", "v", Seq(p))
        .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
      assert(got == exp, s"p=$p: $got != $exp")
    }
  }

  test("weighted percentile matches built-in percentile(v, p, frequency) bitwise") {
    val rnd = new scala.util.Random(11)
    val df = (1 to 4000).map { i =>
      (s"g${i % 5}", math.floor(rnd.nextDouble() * 500) / 4.0, 1L + rnd.nextInt(9))
    }.toDF("k", "v", "w").repartition(7)
    for (p <- Seq(0.0, 0.25, 0.5, 0.9, 1.0)) {
      val exp = df.groupBy("k").agg(expr(s"percentile(v, $p, w)").as("e"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val got = Percentiles.percentileContWeighted(df, "k", "v", "w", Seq(p))
        .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
      assert(got.keySet == exp.keySet)
      exp.foreach { case (k, e) =>
        assert(java.lang.Double.doubleToLongBits(got(k)) ==
          java.lang.Double.doubleToLongBits(e), s"p=$p key=$k: ${got(k)} != $e")
      }
    }
  }

  test("mixed cont+disc single pass equals the separate-mode runs bitwise") {
    val rnd = new scala.util.Random(17)
    val df = (1 to 2000).map { i =>
      (s"g${i % 4}", math.floor(rnd.nextDouble() * 300) / 2.0, 1L + rnd.nextInt(5))
    }.toDF("k", "v", "w").repartition(9)
    val mixed = Percentiles.percentileMixedLong(df, "k",
        Seq("v" -> Seq((0.25, false), (0.9, false), (0.25, true))),
        weightCol = Some("w"))
      .collect().map(r => (r.getString(1), r.getDouble(2), r.getBoolean(3)) -> r.getDouble(4))
      .toMap
    val cont = Percentiles.percentileContWeighted(df, "k", "v", "w", Seq(0.25, 0.9))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val disc = Percentiles.percentileDiscWeighted(df, "k", "v", "w", Seq(0.25))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    cont.foreach { case ((k, p), v) =>
      assert(java.lang.Double.doubleToLongBits(mixed((k, p, false))) ==
        java.lang.Double.doubleToLongBits(v), s"cont k=$k p=$p")
    }
    disc.foreach { case (k, v) =>
      assert(mixed((k, 0.25, true)) == v, s"disc k=$k")
    }
    assert(mixed.size == 12) // 4 keys x 3 targets
  }

  test("weighted percentile_disc picks the value whose cumulative weight covers the rank") {
    val df = Seq(("a", 1.0, 1L), ("a", 2.0, 3L), ("a", 3.0, 2L)).toDF("k", "v", "w")
    def disc(p: Double): Double =
      Percentiles.percentileDiscWeighted(df, "k", "v", "w", Seq(p))
        .collect().map(_.getDouble(2)).head
    assert(disc(0.0) == 1.0)  // rank max(1, ceil(0*6)) = 1 -> first value
    assert(disc(0.5) == 2.0)  // rank 3 falls in 2.0's [2, 4] interval
    assert(disc(1.0) == 3.0)  // rank 6 -> last value
  }

  test("groups with a NULL key survive (null-safe join) and match the built-in") {
    val df = Seq((Some("a"), 1.0), (Some("a"), 2.0), (Some("a"), 4.0),
      (None, 3.0), (None, 5.0), (None, 7.0), (None, 9.0))
      .toDF("k", "v")
    for (p <- Seq(0.0, 0.5, 0.75, 1.0)) {
      val exp = builtIn(df, p).map { case (k, v) => Option(k) -> v }
      val got = dist(df, p).map { case (k, v) => Option(k) -> v }
      assert(got.keySet == exp.keySet, s"p=$p: null-key group must not vanish")
      assert(got == exp, s"p=$p: $got != $exp")
    }
  }

  test("the sorted intermediate cache is released before returning") {
    val sc = spark.sparkContext
    val df = (1 to 500).map(i => (s"g${i % 3}", i.toDouble)).toDF("k", "v")
    val before = sc.getPersistentRDDs.keySet
    val out = Percentiles.percentileCont(df, "k", "v", Seq(0.5))
    out.count()
    // the only surviving storage is the (tiny, result-sized) localCheckpoint
    // of the boundary rows — the full sorted counts cache must be gone.
    val leaked = sc.getPersistentRDDs.keySet -- before
    assert(leaked.size <= 1, s"expected at most the boundaries checkpoint: $leaked")
  }

  test("group spanning many range partitions gets correct global ranks") {
    // One dominant key whose values are spread over every partition: the
    // per-partition offset bookkeeping must stitch ranks back together.
    val df = (1 to 100000).map(i => ("hot", i.toDouble))
      .toDF("k", "v").repartition(32)
    val got = dist(df, 0.5)
    // 1 + 0.5*(100000-1) = 50000.5 -> (50000 + 50001)/2
    assert(got("hot") == 50000.5)
  }
}
