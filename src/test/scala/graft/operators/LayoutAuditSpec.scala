package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutAuditSpec extends SparkSpec {
  import spark.implicits._

  test("matches a brute-force single-node reference (incl. duplicate rows)") {
    val pts = for (x <- 0L until 40L; y <- 0L until 40L) yield (x, y)
    val withDups = pts ++ pts.take(100) // duplicates must be interchangeable
    val out = LayoutAudit.zOrderReport(withDups.toDF("x", "y"), "x", "y",
        bits = 4, nChunks = 8)
      .collect().map(r => (r.getAs[String]("layout"), r.getAs[Long]("chunk")) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("min_x"), r.getAs[Long]("max_x"),
          r.getAs[Long]("min_y"), r.getAs[Long]("max_y")))).toMap

    // reference: rank by (key, pid), equal chunks, bbox per chunk
    val mxx = withDups.map(_._1).max; val mxy = withDups.map(_._2).max
    val n = withDups.size.toLong
    val csize = (n + 7) / 8
    def zOf(xb: Long, yb: Long): Long =
      (0 until 4).map(i => (((xb >> i) & 1L) << (2 * i)) |
        (((yb >> i) & 1L) << (2 * i + 1))).reduce(_ | _)
    def ref(key: (Long, Long) => Long) = withDups
      .map { case (x, y) =>
        (key(x * 16 / (mxx + 1), y * 16 / (mxy + 1)), x * (mxy + 1) + y, x, y)
      }
      .sortBy(t => (t._1, t._2)).zipWithIndex
      .groupBy { case (_, i) => i / csize }
      .map { case (c, g) =>
        val xs = g.map(_._1._3); val ys = g.map(_._1._4)
        c.toLong -> ((g.size.toLong, xs.min, xs.max, ys.min, ys.max))
      }
    ref(zOf).foreach { case (c, v) => assert(out(("zorder", c)) == v, s"z chunk $c") }
    val lin = withDups.map { case (x, y) => (x * (mxy + 1) + y, x, y) }
      .sortBy(_._1).zipWithIndex
      .groupBy { case (_, i) => i / csize }
      .map { case (c, g) =>
        val xs = g.map(_._1._2); val ys = g.map(_._1._3)
        c.toLong -> ((g.size.toLong, xs.min, xs.max, ys.min, ys.max))
      }
    lin.foreach { case (c, v) => assert(out(("linear", c)) == v, s"lin chunk $c") }
  }

  test("Z-order beats the lexicographic layout on a square grid") {
    val pts = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    val areas = LayoutAudit.zOrderReport(pts.toDF("x", "y"), "x", "y",
        bits = 6, nChunks = 16)
      .groupBy("layout").agg(sum("bbox_area").as("a"))
      .collect().map(r => r.getAs[String]("layout") -> r.getAs[Long]("a")).toMap
    // linear: each chunk spans 4 full-x columns -> area 4*64=256 each;
    // z-order: each chunk is a 16x16 quadrant -> area 256... use finer
    // chunking where z wins: 16 chunks of 256 rows = 16x16 tiles (area
    // 256) vs linear 4x64 strips (area 256) — equal here, so compare
    // the MAX side length instead: z chunks are square.
    val widths = LayoutAudit.zOrderReport(pts.toDF("x", "y"), "x", "y",
        bits = 6, nChunks = 16)
      .withColumn("w", greatest(col("max_x") - col("min_x"),
        col("max_y") - col("min_y")))
      .groupBy("layout").agg(max("w").as("mw"))
      .collect().map(r => r.getAs[String]("layout") -> r.getAs[Long]("mw")).toMap
    assert(widths("zorder") == 15L, s"z chunks must be square tiles: $widths")
    assert(widths("linear") == 63L, s"linear strips span full y: $widths")
    assert(areas("zorder") <= areas("linear"))
  }

  test("nulls and negative keys are filtered; plan has no global-order window") {
    val df = Seq[(java.lang.Long, java.lang.Long)]((1L, 2L), (null, 3L),
      (-1L, 4L), (5L, 6L)).toDF("x", "y")
    val out = LayoutAudit.zOrderReport(df, "x", "y", bits = 2, nChunks = 1)
    assert(out.agg(sum("n")).collect()(0).getLong(0) == 4L) // 2 rows x 2 layouts
    val plan = out.queryExecution.executedPlan.toString
    // every Window must be partitioned (the PlanSpec global rule)
    assert(!plan.contains("Window [") ||
      !plan.matches("(?s).*Window \\[[^\\]]*\\], \\[\\].*"), plan)
  }

  // --- sortednessReport ---

  private def sortMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map { r =>
      r.getAs[String]("col_name") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("n_desc_pairs"),
          r.getAs[Long]("n_runs"),
          Option(r.getAs[java.lang.Long]("sorted_ppm")).map(_.longValue())))
    }.toMap

  test("sortednessReport: hand fixture — sorted, cyclic, reversed") {
    // order o = 1..6; a ascends (0 descents), b cycles 1,2,1,2,1,2
    // (2 descents: 2->1 twice), c strictly descends (5 descents)
    val df = Seq(
      (1L, 10L, 1L, 60L), (2L, 20L, 2L, 50L), (3L, 30L, 1L, 40L),
      (4L, 40L, 2L, 30L), (5L, 50L, 1L, 20L), (6L, 60L, 2L, 10L))
      .toDF("o", "a", "b", "c")
    val out = sortMap(LayoutAudit.sortednessReport(
      df, "o", Seq("a", "b", "c"), bucketWidth = 4096L))
    assert(out("a") == ((6L, 0L, 1L, Some(1000000L))))
    assert(out("b") == ((6L, 2L, 3L, Some(600000L)))) // 3 of 5 pairs sorted
    assert(out("c") == ((6L, 5L, 6L, Some(0L))))
  }

  test("sortednessReport: bucket seams cannot hide or invent descents") {
    // 40 rows of a zig-zag; results must be IDENTICAL at bucketWidth 1
    // (every seam crosses buckets) and 4096 (single bucket)
    val rng = new scala.util.Random(11)
    val rows = (1L to 40L).map(o => (o, rng.nextInt(100).toLong)).toSeq
    val df = rows.toDF("o", "v")
    val wide = sortMap(LayoutAudit.sortednessReport(df, "o", Seq("v"), 4096L))
    val narrow = sortMap(LayoutAudit.sortednessReport(df, "o", Seq("v"), 1L))
    assert(wide == narrow, s"$wide vs $narrow")
    // brute force
    val vs = rows.sortBy(r => (r._1, r._2)).map(_._2)
    val desc = vs.sliding(2).count(p => p(1) < p(0)).toLong
    assert(wide("v")._2 == desc)
  }

  test("sortednessReport: order ties break by value (a tie group reads sorted)") {
    val df = Seq((1L, 5L), (1L, 3L), (1L, 4L), (2L, 1L)).toDF("o", "v")
    val out = sortMap(LayoutAudit.sortednessReport(df, "o", Seq("v"), 4096L))
    // within o=1 the values order 3,4,5 (no descent); 5 -> 1 at o=2: one
    assert(out("v") == ((4L, 1L, 2L, Some(666666L))))
  }

  test("sortednessReport: nulls drop per candidate; single row has null ppm") {
    val df = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 7L), (2L, null), (null, 9L)).toDF("o", "v")
    val out = sortMap(LayoutAudit.sortednessReport(df, "o", Seq("v"), 4096L))
    assert(out("v") == ((1L, 0L, 1L, None)))
  }

  test("skipRateReport: sorted-by-probe-key skips all but one chunk; scattered key skips none") {
    def run(rows: Seq[(Long, Long)], probes: Seq[(Long, Long)]) =
      LayoutAudit.skipRateReport(rows.toDF("o", "v"), "o", "v", probes,
          nChunks = 8, bucketWidth = 16L)
        .collect().map(r => (r.getAs[Long]("probe_lo"),
          r.getAs[Long]("probe_hi")) ->
          ((r.getAs[Long]("n_chunks"), r.getAs[Long]("skipped_chunks"),
            r.getAs[Long]("rows_scanned"), r.getAs[Long]("rows_selected"))))
        .toMap
    // v tracks the write order: 64 rows in 8 chunks of 8; probe [17,24]
    // lands wholly inside one chunk, probe [100,200] misses everything
    val sorted = (1L to 64L).map(i => (i, i))
    val s = run(sorted, Seq((17L, 24L), (100L, 200L)))
    assert(s((17L, 24L)) == ((8L, 7L, 8L, 8L)))
    assert(s((100L, 200L)) == ((8L, 8L, 0L, 0L)))
    // v cycles mod 8: every chunk spans [0,7], nothing skips
    val scattered = (1L to 64L).map(i => (i, i % 8))
    val c = run(scattered, Seq((3L, 3L)))
    assert(c((3L, 3L)) == ((8L, 0L, 64L, 8L)))
  }

  test("sortKeyAdvisor: value-ordered layout wins the workload; interleaved layout scans everything") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 16 rows, v = 0..15; candidate A orders by v (zone maps align),
    // candidate B orders by v % 4 (every chunk spans the value range)
    val rows = (0L until 16L).map(v => (v, v % 4)).toDF("v", "scr")
    val out = LayoutAudit.sortKeyAdvisor(rows,
        candidates = Seq(("by_v", "v", 4L), ("by_scr", "scr", 1L)),
        probes = Seq(("v", 0L, 3L)), nChunks = 4)
      .collect().map(r => r.getAs[String]("layout") ->
        ((r.getAs[Long]("n_probes"), r.getAs[Long]("rows_scanned_total"),
          r.getAs[Long]("rows_selected_total"),
          r.getAs[Long]("workload_skip_ppm"),
          r.getAs[Long]("scan_amplification_ppm")))).toMap
    // by_v: chunks [0-3][4-7][8-11][12-15] -> probe [0,3] skips 3 of 4,
    // scans exactly the 4 selected rows
    assert(out("by_v") == ((1L, 4L, 4L, 750000L, 1000000L)))
    // by_scr rank order (scr, v): chunks [0,4,8,12][1,5,9,13][2,6,10,14]
    // [3,7,11,15] -> every chunk overlaps [0,3]: full scan, 4x amp
    assert(out("by_scr") == ((1L, 16L, 4L, 0L, 4000000L)))
  }

  test("sortKeyAdvisor 2-pass: two probed columns share one chunk table, hand-checked rollup") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 64 rows ordered by o; probed columns a == o (aligned) and
    // b = o % 8 (every chunk spans b's full range)
    val rows = (0L until 64L).map(o => (o, o, o % 8)).toDF("o", "a", "b")
    val out = LayoutAudit.sortKeyAdvisor(rows,
        candidates = Seq(("by_o", "o", 8L)),
        probes = Seq(("a", 16L, 23L), ("b", 3L, 3L)), nChunks = 8)
      .collect()
    assert(out.length == 1)
    val r = out.head
    // probe a [16,23]: exactly chunk 2 -> skips 7 of 8, scans 8 of its
    // 8 selected; probe b [3,3]: all 8 chunks overlap -> scans 64 for
    // 8 selected. Rollup: 7 of 16 chunk-probes skipped.
    assert(r.getAs[Long]("n_probes") == 2L)
    assert(r.getAs[Long]("rows_scanned_total") == 8L + 64L)
    assert(r.getAs[Long]("rows_selected_total") == 16L)
    assert(r.getAs[Long]("workload_skip_ppm") == 7L * 1000000L / 16L)
    assert(r.getAs[Long]("scan_amplification_ppm") == 72000000L / 16L)
  }
}
