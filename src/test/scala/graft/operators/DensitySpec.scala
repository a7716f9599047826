package graft.operators

import graft.SparkSpec

class DensitySpec extends SparkSpec {
  import spark.implicits._

  // 2-d grid, cellWidth 100 milli: cells (0,0)x6, (1,0)x2, (2,0)x1,
  // (9,9)x1 — with a 60% block gate (n = 10, threshold 6):
  //   (0,0) block = 8 core; (1,0) block = 9 core;
  //   (2,0) block = 3, adjacent to core (1,0) -> border;
  //   (9,9) block = 1, no core neighbour -> noise
  private def fixture = Seq(
    (1L, Array(0.05f, 0.05f)), (2L, Array(0.04f, 0.06f)),
    (3L, Array(0.01f, 0.01f)), (4L, Array(0.09f, 0.09f)),
    (5L, Array(0.05f, 0.01f)), (6L, Array(0.02f, 0.08f)),
    (7L, Array(0.15f, 0.05f)), (8L, Array(0.16f, 0.04f)),
    (9L, Array(0.25f, 0.05f)),
    (10L, Array(0.95f, 0.95f)))
    .toDF("id", "vec")

  private def run(d: org.apache.spark.sql.DataFrame) =
    Density.gridDbscanCensus(d, "id", "vec", gridDims = Seq(1, 2),
        scale = 1000L, cellWidth = 100L, densityPpm = 600000L)
      .collect().map(r => r.getAs[String]("dbscan_label") ->
        ((r.getAs[Long]("n_cells"), r.getAs[Long]("n_points"),
          r.getAs[Long]("share_ppm"), r.getAs[Long]("id_sum")))).toMap

  test("hand-checked core/border/noise labels with id-sum pins") {
    val out = run(fixture)
    assert(out("core") == ((2L, 8L, 800000L, 36L)))
    assert(out("border") == ((1L, 1L, 100000L, 9L)))
    assert(out("noise") == ((1L, 1L, 100000L, 10L)))
  }

  test("negative coordinates floor to the correct cell (sign-safe div)") {
    // (-0.05, -0.05) -> scaled -50 -> cell (-1, -1), NOT 0 (a
    // truncating div would collapse it onto (0,0)). Its 3x3 block
    // sees the 6-dense (0,0) cell (7 >= 6.6), so the cell itself is
    // core-dense — the point reads core and the census gains a cell.
    val withNeg = fixture.union(Seq((11L, Array(-0.05f, -0.05f)))
      .toDF("id", "vec"))
    val out = run(withNeg)
    assert(out("core") == ((3L, 9L, 9L * 1000000L / 11L, 36L + 11L)))
    assert(out("border")._4 == 9L)
    assert(out("noise")._4 == 10L)
  }

  test("repartition-invariant") {
    assert(run(fixture.coalesce(1)) == run(fixture.repartition(7)))
  }

  test("empty input yields empty census, not a crash") {
    val empty = Seq.empty[(Long, Array[Float])].toDF("id", "vec")
    assert(run(empty).isEmpty)
  }

  test("a null element at a grid dim drops the row (no null cell key)") {
    val withNull = fixture.union(
      Seq((99L, Array[java.lang.Float](null, 0.5f))).toDF("id", "vec"))
    assert(run(withNull) == run(fixture))
  }

  private def runClusters(d: org.apache.spark.sql.DataFrame,
                          ppm: Long = 600000L) =
    Density.clusterCensus(d, "id", "vec", gridDims = Seq(1, 2),
        scale = 1000L, cellWidth = 100L, densityPpm = ppm)
      .collect().map(r => r.getAs[Long]("cluster_id") ->
        ((r.getAs[Long]("n_cells"), r.getAs[Long]("n_points"),
          r.getAs[Long]("share_ppm"), r.getAs[Long]("id_sum")))).toMap

  test("hand-checked cluster census: adjacent core cells merge, id = min encoded cell") {
    // fixture core cells (0,0) and (1,0) are block-adjacent -> ONE
    // cluster, id = encode(0,0) = (0+1e6)*2000001 + (0+1e6)
    val out = runClusters(fixture)
    assert(out == Map(2000002000000L -> ((2L, 8L, 800000L, 36L))))
  }

  test("two separated dense blobs form two clusters") {
    val blobs = Seq(
      (1L, Array(0.05f, 0.05f)), (2L, Array(0.04f, 0.06f)),
      (3L, Array(0.01f, 0.01f)), (4L, Array(0.09f, 0.09f)),
      (5L, Array(0.95f, 0.95f)), (6L, Array(0.94f, 0.96f)),
      (7L, Array(0.91f, 0.91f)), (8L, Array(0.99f, 0.99f)),
      (9L, Array(0.55f, 0.05f)), (10L, Array(0.05f, 0.55f)))
      .toDF("id", "vec")
    // 30% gate (threshold 3): the two 4-point cells are core, the two
    // singles are noise; encode(0,0) and encode(9,9) head the clusters
    val out = runClusters(blobs, ppm = 300000L)
    assert(out == Map(
      2000002000000L -> ((1L, 4L, 400000L, 10L)),
      2000020000018L -> ((1L, 4L, 400000L, 26L))))
  }

  test("negative-coordinate core cell joins the cluster and can head it") {
    // (-0.05,-0.05) -> core cell (-1,-1), block-adjacent to (0,0);
    // its encoded id is the smallest, so it becomes the cluster id
    val withNeg = fixture.union(Seq((11L, Array(-0.05f, -0.05f)))
      .toDF("id", "vec"))
    val out = runClusters(withNeg)
    assert(out == Map(1999999999998L -> ((3L, 9L, 818181L, 47L))))
  }

  test("cluster census reconciles with the q301 core row (label<->cluster consistency)") {
    for (d <- Seq(fixture, fixture.repartition(7))) {
      val core = run(d)("core")
      val clusters = runClusters(d).values.toSeq
      assert(clusters.map(_._1).sum == core._1, "core cells")
      assert(clusters.map(_._2).sum == core._2, "core points")
      assert(clusters.map(_._4).sum == core._4, "core id_sum")
    }
  }

  test("no core cells yields an empty cluster census, not a crash") {
    // 10 spread-out singleton cells under a 60% gate: nothing is core
    val sparse = (1 to 10).map(i =>
      (i.toLong, Array(i * 0.09f, i * 0.07f + 0.3f))).toDF("id", "vec")
    assert(run(sparse).get("core").isEmpty)
    assert(runClusters(sparse).isEmpty)
  }

  test("id_sum that exceeds BIGINT raises instead of wrapping") {
    // two far-apart single-point cells whose ids sum past 2^63: the
    // DECIMAL(38,0) accumulation carries the true value and the final
    // BIGINT cast must raise (DuckDB's HUGEINT->BIGINT cast raises on
    // the oracle side; a silent Spark wrap would diverge), never emit
    // a wrapped or null id_sum.
    import org.apache.spark.sql.functions.col
    val cells = Seq((0L, 0L, 1L, 9000000000000000000L),
        (10L, 10L, 1L, 9000000000000000000L))
      .toDF("c0", "c1", "n", "ids")
    val ex = intercept[Exception] {
      Density.censusFromCells(cells, Seq("c0", "c1"), "n", "ids",
        densityPpm = 1000000L).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("overflows BIGINT")), ex)
    // sanity: the same shape under the threshold passes through exact
    val ok = Density.censusFromCells(
        Seq((0L, 0L, 1L, 4000000000000000000L),
          (10L, 10L, 1L, 4000000000000000000L))
          .toDF("c0", "c1", "n", "ids"),
        Seq("c0", "c1"), "n", "ids", densityPpm = 1000000L)
      .select(col("id_sum")).collect().map(_.getLong(0))
    assert(ok.toSeq == Seq(8000000000000000000L))
  }
}
