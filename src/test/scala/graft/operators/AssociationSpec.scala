package graft.operators

import graft.SparkSpec

class AssociationSpec extends SparkSpec {
  import spark.implicits._

  test("chi2: exact independence sums to ~0 (only per-cell floor loss)") {
    // 2x2 perfectly independent: O = R*C/N exactly
    val rows = Seq.fill(20)(("a", "x")) ++ Seq.fill(20)(("a", "y")) ++
      Seq.fill(10)(("b", "x")) ++ Seq.fill(10)(("b", "y"))
    val out = Association.chiSquare(rows.toDF("u", "v"), "u", "v")
      .collect().map(r => r.getAs[String]("u") ->
        (r.getAs[Long]("n"), r.getAs[Long]("dof"), r.getAs[Long]("chi2_ppm")))
      .toMap
    assert(out("a")._1 == 40L && out("b")._1 == 20L)
    assert(out("a")._2 == 1L)
    // exact independence: every term is an integer, sum is exactly 0
    assert(out("a")._3 == 0L && out("b")._3 == 0L)
  }

  test("chi2: hand-computed 2x2 with association") {
    // | 30 10 | r=40      chi2 = N*(sum O^2/(RC)) - N over
    // | 10 30 | r=40      N=80, C=40,40
    // terms*1e6: a: 900*80e6/1600=45e6, 100*80e6/1600=5e6 -> 50e6-40e6=10e6
    val rows = Seq.fill(30)(("a", "x")) ++ Seq.fill(10)(("a", "y")) ++
      Seq.fill(10)(("b", "x")) ++ Seq.fill(30)(("b", "y"))
    val out = Association.chiSquare(rows.toDF("u", "v"), "u", "v")
      .collect().map(r => r.getAs[String]("u") -> r.getAs[Long]("chi2_ppm"))
      .toMap
    assert(out("a") == 10000000L && out("b") == 10000000L)
    // full-table chi2 = 20 (the textbook value for this table)
    assert(out.values.sum == 20000000L)
  }

  test("chi2: empty cells need no grid (O^2 form) — 3 categories, one hole") {
    // b never co-occurs with z; the statistic still matches the
    // full-grid (O-E)^2/E reference computed here in BigDecimal.
    val rows = Seq.fill(8)(("a", "x")) ++ Seq.fill(4)(("a", "z")) ++
      Seq.fill(6)(("b", "x")) ++ Seq.fill(2)(("a", "y")) ++
      Seq.fill(5)(("b", "y"))
    val out = Association.chiSquare(rows.toDF("u", "v"), "u", "v").collect()
    val byCat = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rTot = rows.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val cTot = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val n = rows.size.toLong
    val ref = rTot.keys.map { a =>
      val terms = cTot.keys.map { b =>
        val o = BigInt(byCat.getOrElse((a, b), 0L))
        val rc = BigInt(rTot(a)) * BigInt(cTot(b))
        // floored per-cell O^2 term minus the R contribution, as the op does
        (o * o * n * 1000000) / rc
      }.sum
      a -> (terms - BigInt(rTot(a)) * 1000000)
    }.toMap
    out.foreach { r =>
      assert(BigInt(r.getAs[Long]("chi2_ppm")) == ref(r.getAs[String]("u")))
    }
  }

  test("pmi: perfectly-bound pair ranks above a frequent-but-independent one") {
    // "rare gem" always together; "of the" frequent but independent-ish
    val docs = Seq.fill(6)("rare gem") ++
      Seq.fill(30)("of the") ++ Seq.fill(30)("the of") ++
      Seq.fill(30)("of of") ++ Seq.fill(30)("the the")
    val out = Association.pmiTopBigrams(docs.toDF("text"), "text",
      minCount = 5L, k = 3).collect()
    assert(out.head.getAs[String]("bigram") == "rare gem")
    assert(out.head.getAs[Long]("n_pair") == 6L)
    // lift for "rare gem": cxy=6, cx=cy=6, N=252, M=126
    // (6*252*252*1e6)/(126*6*6) = 84e6
    assert(out.head.getAs[Long]("lift_ppm") == 84000000L)
    // the independent fillers sit near lift 1e6 (well below)
    assert(out(1).getAs[Long]("lift_ppm") < 3000000L)
  }

  test("pmi: min-support drops hapax pairs; ties break on bigram asc") {
    val docs = Seq("one two", "one two", "three four")
    val out = Association.pmiTopBigrams(docs.toDF("text"), "text",
      minCount = 2L, k = 10).collect()
    assert(out.map(_.getAs[String]("bigram")).toSeq == Seq("one two"))
    val tied = Association.pmiTopBigrams(
      Seq("b b", "b b", "a a", "a a").toDF("text"), "text", 2L, 10)
      .collect().map(_.getAs[String]("bigram")).toSeq
    assert(tied == Seq("a a", "b b")) // equal lift -> lexicographic
  }
}
