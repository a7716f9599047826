package graft.operators

import graft.SparkSpec

class TrendSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Long)]) =
    Trend.theilSen(rows.toDF("k", "x", "y"), "k", "x", "y")
      .collect().map(r => r.getAs[String]("k") ->
        ((r.getAs[Long]("n_points"), r.getAs[Long]("n_pairs"),
          r.getAs[Long]("slope_ppm")))).toMap

  test("perfect line: slope exact; outlier cannot drag the median") {
    // y = 3x: every pairwise slope is exactly 3e6 ppm
    val line = (1L to 6L).map(x => ("a", x, 3 * x))
    assert(run(line)("a") == ((6L, 15L, 3000000L)))
    // one wild outlier: 5 of 15 pairs touch it; median still 3e6
    val dirty = line.dropRight(1) :+ (("a", 6L, 1000L))
    assert(run(dirty)("a")._3 == 3000000L)
    // least squares would NOT survive this: mean pairwise slope moves
    val slopes = for {
      Seq((_, x1, y1), (_, x2, y2)) <- dirty.combinations(2).map(_.sortBy(_._2)).toSeq
    } yield (y2 - y1) * 1000000L / (x2 - x1)
    assert(math.abs(slopes.sum / slopes.size) > 10000000L)
  }

  test("falling slope: truncation toward zero (the DuckDB // semantics)") {
    // points (0, 7), (2, 0): slope = -7e6/2 = -3.5e6 -> -3500000 exact;
    // (0, 7), (3, 0): -7e6/3 = -2333333.33 -> truncates to -2333333
    // (NOT the floor -2333334)
    val out = run(Seq(("a", 0L, 7L), ("a", 3L, 0L)))
    assert(out("a") == ((2L, 1L, -2333333L)))
  }

  test("keys independent; single-point keys emit nothing; even count takes lower middle") {
    val rows = Seq(("up", 0L, 0L), ("up", 1L, 10L),
      ("down", 0L, 10L), ("down", 1L, 0L),
      ("lonely", 5L, 5L),
      // 3 points -> 3 pairs, slopes 1e6, 2e6, 3e6... construct:
      // (0,0),(1,3),(2,4): slopes 3e6, 2e6, 1e6 -> median 2e6
      ("tri", 0L, 0L), ("tri", 1L, 3L), ("tri", 2L, 4L))
    val out = run(rows)
    assert(out("up")._3 == 10000000L && out("down")._3 == -10000000L)
    assert(!out.contains("lonely"))
    assert(out("tri") == ((3L, 3L, 2000000L)))
    // even pair count: 2 points per key... 4 slopes case:
    // (0,0),(1,1),(2,10): slopes 1e6, 5e6, 9e6 -> odd; use 4 points
    val even = run(Seq(("e", 0L, 0L), ("e", 1L, 1L), ("e", 2L, 2L),
      ("e", 3L, 30L)))
    // slopes: (0,1)1e6 (0,2)1e6 (0,3)10e6 (1,2)1e6 (1,3)14.5->14500000
    // (2,3)28e6 -> sorted 1e6,1e6,1e6,10e6,14.5e6,28e6; lower middle = 1e6
    assert(even("e") == ((4L, 6L, 1000000L)))
  }

  test("crossCorrelation: a shifted copy peaks at exactly its shift") {
    import org.apache.spark.sql.functions.col
    // B is A delayed by 2 ticks; spike pattern makes the peak sharp
    val a = Seq((0L, 10L), (1L, 1L), (2L, 1L), (3L, 12L), (4L, 1L),
      (5L, 1L), (6L, 9L), (7L, 1L))
    val b = a.map { case (t, v) => (t + 2L, v) }
    val out = Trend.crossCorrelation(
        a.toDF("tick", "v"), b.toDF("tick", "v"), "tick", "v", maxLag = 4)
      .collect().map(r => r.getAs[Long]("lag_ticks") ->
        ((r.getAs[Long]("n_overlap"), r.getAs[Long]("cc_ppm"),
          r.getAs[Boolean]("is_best")))).toMap
    assert(out.size == 9)
    assert(out(2L)._3, s"peak must sit at lag +2: $out")
    assert(out(2L)._2 == 1000000L, "peak normalizes to 1e6 ppm")
    assert(out.filter(_._2._3).keySet == Set(2L))
    // grid is [0, 9] (10 ticks); at lag +2 the overlap is 8
    assert(out(2L)._1 == 8L)
  }

  test("crossCorrelation: JVM contract replay on a random fixture") {
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(5)
    val a = (0L until 30L).map(t => (t, rnd.nextInt(20).toLong))
    val b = (0L until 30L).map(t => (t, rnd.nextInt(20).toLong))
    val L = 3
    val out = Trend.crossCorrelation(
        a.toDF("tick", "v"), b.toDF("tick", "v"), "tick", "v", L)
      .collect().map(r => r.getAs[Long]("lag_ticks") ->
        r.getAs[Long]("cc_ppm")).toMap
    // reference
    val n = 30L
    val sa = a.map(_._2).sum; val sb = b.map(_._2).sum
    val ca = a.map { case (_, v) => n * v - sa }
    val cb = b.map { case (_, v) => n * v - sb }
    val ccs = (-L to L).map { k =>
      k.toLong -> (0 until 30).collect {
        case t if t + k >= 0 && t + k < 30 =>
          BigInt(ca(t)) * BigInt(cb(t + k))
      }.sum
    }.toMap
    val mx = ccs.values.map(_.abs).max
    ccs.foreach { case (k, v) =>
      val want = (v * 1000000 / mx).toLong
      assert(out(k) == want, s"lag $k: ${out(k)} vs $want")
    }
  }
}
