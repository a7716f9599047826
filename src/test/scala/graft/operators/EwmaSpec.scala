package graft.operators

import graft.SparkSpec

class EwmaSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Long)], memory: Int = 8,
                  l: Int = 3) =
    Ewma.controlChart(rows.toDF("k", "tick", "x"), Seq("k"), "tick", "x",
        memory, l)
      .collect().map(r => (r.getAs[String]("k"), r.getAs[Long]("tick")) ->
        ((r.getAs[Long]("ewma_milli"), r.getAs[Boolean]("alarm")))).toMap

  test("warmup: truncated-renormalized dyadic weights, hand-computed") {
    val out = run(Seq(("a", 1L, 4L), ("a", 2L, 8L), ("a", 3L, 8L),
      ("a", 4L, 8L)))
    assert(out(("a", 1L))._1 == 4000L) // m=0: s = x
    assert(out(("a", 2L))._1 == 20000L / 3) // (8*2 + 4)/3
    assert(out(("a", 3L))._1 == 52000L / 7) // (8*4 + 8*2 + 4)/7
    assert(out(("a", 4L))._1 == 116000L / 15)
  }

  test("memory cap: a point 8+ lags back carries zero weight") {
    val rows = ("a", 1L, 1000000L) +: (2L to 10L).map(t => ("a", t, 0L))
    val out = run(rows)
    // tick 8: the spike is lag 7, weight 2^0 of D=255
    assert(out(("a", 8L))._1 == 1000000000L / 255)
    // tick 9 on: the spike fell out of the window entirely
    assert(out(("a", 9L))._1 == 0L)
    assert(out(("a", 10L))._1 == 0L)
  }

  test("constant series: ewma == x, zero variance never alarms") {
    val out = run((1L to 12L).map(t => ("c", t, 7L)))
    assert(out.values.forall(_ == ((7000L, false))))
  }

  test("DECIMAL(38,0) overflow in the alarm raises loudly instead of nulling") {
    // x ~ 1e18 with real variance: n * sum(x^2) ~ 1.4e38 — past
    // DECIMAL(38,0); the in-plan guard must raise (the r10 fix for
    // the silent Spark-null vs DuckDB-HUGEINT divergence)
    val rows = (1L to 12L).map(t =>
      ("o", t, 900000000000000000L + t * 13700000000000000L))
    val e = intercept[Exception] { run(rows) }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("overflow")), msgs(e).mkString("|"))
  }

  test("exact replay: ewma and the 3-sigma alarm match a BigInt oracle") {
    // deterministic mixed series: a base sawtooth with a late level run
    val xs = (0 until 40).map(i =>
      if (i >= 32) 40L + (i % 3) else (i * 37 % 23).toLong)
    val rows = xs.zipWithIndex.map { case (x, i) => ("m", i.toLong, x) }
    val out = run(rows)
    val n = BigInt(xs.size)
    val tot = xs.map(BigInt(_)).sum
    val sx2 = xs.map(x => BigInt(x) * x).sum
    xs.indices.foreach { i =>
      val m = math.min(i, 7)
      val num = (0 to m).map(j => BigInt(xs(i - j)) << (m - j)).sum
      val dd = (BigInt(1) << (m + 1)) - 1
      val delta = num * n - tot * dd
      val expectAlarm = 3 * delta * delta > 9 * dd * dd * (n * sx2 - tot * tot)
      assert(out(("m", i.toLong)) ==
        (((1000 * num / dd).toLong, expectAlarm)), s"tick $i")
    }
    // the fixture exercises both alarm states
    assert(out.values.exists(_._2) && out.values.exists(!_._2))
  }

  test("keys smooth independently") {
    val out = run(Seq(("a", 1L, 0L), ("a", 2L, 6L),
      ("b", 1L, 90L), ("b", 2L, 90L)))
    assert(out(("a", 2L))._1 == 4000L) // (6*2 + 0)/3
    assert(out(("b", 2L))._1 == 90000L) // constant key unaffected by a
  }
}
