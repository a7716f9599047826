package graft.operators

import graft.SparkSpec

class ExperimentSpec extends SparkSpec {
  import spark.implicits._

  private def units(variant: String, n: Int, conv: Int) =
    (0 until n).map(i => (variant, i < conv))

  private def run(rows: Seq[(String, Boolean)], control: String = "A") =
    Experiment.conversionLift(rows.toDF("variant", "converted"),
        "variant", "converted", control)
      .collect().map(r => r.getAs[String]("variant") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("conversions"),
          r.getAs[Long]("rate_ppm"), r.getAs[Long]("wilson_lo_ppm"),
          r.getAs[Long]("wilson_hi_ppm"),
          Option(r.getAs[java.lang.Long]("lift_vs_control_ppm"))
            .map(_.longValue()),
          Option(r.getAs[java.lang.Boolean]("significant"))
            .map(_.booleanValue())))).toMap

  /** JVM reference of the pinned Wilson op order. */
  private def wilsonRef(conv: Long, n: Long): (Long, Long) = {
    val nd = n.toDouble; val ph = conv.toDouble / nd
    val z = 1.96; val z2 = z * z
    val denom = 1.0 + z2 / nd
    val center = (ph + z2 / (2.0 * nd)) / denom
    val half = z * math.sqrt(ph * (1.0 - ph) / nd +
      z2 / (4.0 * nd * nd)) / denom
    (math.floor((center - half) * 1000000.0).toLong,
      math.floor((center + half) * 1000000.0).toLong)
  }

  test("rates, lift and Wilson bounds: exact ppm + the pinned IEEE order") {
    val out = run(units("A", 1000, 100) ++ units("B", 1000, 150))
    val a = out("A"); val b = out("B")
    assert(a._1 == 1000L && a._2 == 100L && a._3 == 100000L)
    assert(b._3 == 150000L)
    // lift = 150 * 1000 * 1e6 / (1000 * 100)
    assert(b._6 == Some(1500000L) && a._6 == None && a._7 == None)
    assert((a._4, a._5) == wilsonRef(100L, 1000L))
    assert((b._4, b._5) == wilsonRef(150L, 1000L))
    // sanity: lo <= rate <= hi, all inside [0, 1e6]
    Seq(a, b).foreach { v =>
      assert(v._4 <= v._3 && v._3 <= v._5 && v._4 >= 0L && v._5 <= 1000000L)
    }
    // 10% vs 15% at n=1000: Wilson 95% bands are disjoint -> significant
    assert(b._7 == Some(true))
  }

  test("overlapping bands are not significant; tiny n widens the interval") {
    val out = run(units("A", 50, 5) ++ units("B", 50, 7))
    assert(out("B")._7 == Some(false))
    // small n: interval much wider than the large-n case at the same rate
    val big = run(units("A", 5000, 500))("A")
    val small = out("A")
    assert(small._5 - small._4 > 2L * (big._5 - big._4))
  }

  test("zero-conversion control: lift is null, significance still computed") {
    val out = run(units("A", 100, 0) ++ units("B", 100, 30))
    assert(out("B")._6 == None)
    // control band [0, hi]; B's lower bound ~218k > control hi -> disjoint
    assert(out("B")._7 == Some(true))
    assert(out("A")._3 == 0L && out("A")._4 == 0L)
  }

  test("null variants and null flags drop") {
    val rows = Seq(("A", java.lang.Boolean.TRUE), ("A", null),
      (null, java.lang.Boolean.TRUE), ("B", java.lang.Boolean.FALSE))
    val df = rows.toDF("variant", "converted")
    val out = Experiment.conversionLift(df, "variant", "converted", "A")
      .collect().map(r => r.getAs[String]("variant") -> r.getAs[Long]("n"))
      .toMap
    assert(out == Map("A" -> 1L, "B" -> 1L))
  }

  test("a typo'd control variant fails loudly, not silently empty") {
    val df = (units("A", 10, 3) ++ units("B", 10, 5))
      .toDF("variant", "converted")
    val e = intercept[Exception] {
      Experiment.conversionLift(df, "variant", "converted", "CONTROLL")
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("CONTROLL")),
      s"failure must name the bad control label: $e")
  }
}
