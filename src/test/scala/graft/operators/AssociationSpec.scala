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

  // --- rules2: two-itemset association rules ---

  private def rulesMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map { r =>
      (r.getAs[String]("antecedent"), r.getAs[String]("consequent")) ->
        ((r.getAs[Long]("n_pair"), r.getAs[Long]("n_ante"),
          r.getAs[Long]("n_cons"), r.getAs[Long]("support_ppm"),
          r.getAs[Long]("confidence_ppm"), r.getAs[Long]("lift_ppm")))
    }.toMap

  test("rules2: textbook baskets — exact ppm support/confidence/lift, both directions") {
    val baskets = Seq(
      (1L, "milk"), (1L, "bread"),
      (2L, "milk"), (2L, "bread"), (2L, "butter"),
      (3L, "milk"), (3L, "butter"),
      (4L, "bread"),
      (5L, "milk"), (5L, "bread")).toDF("bk", "it")
    val out = rulesMap(Association.rules2(baskets, "bk", "it", 2L))
    // pair {milk, bread} = 3 baskets; {milk, butter} = 2; {bread, butter}
    // = 1 (below minSupport, no rule)
    assert(out.size == 4)
    assert(out(("milk", "bread")) == ((3L, 4L, 4L, 600000L, 750000L, 937500L)))
    assert(out(("bread", "milk")) == ((3L, 4L, 4L, 600000L, 750000L, 937500L)))
    // butter -> milk is CERTAIN (conf 1e6) while milk -> butter is 50%,
    // same lift both ways (lift is symmetric)
    assert(out(("milk", "butter")) == ((2L, 4L, 2L, 400000L, 500000L, 1250000L)))
    assert(out(("butter", "milk")) == ((2L, 2L, 4L, 400000L, 1000000L, 1250000L)))
  }

  test("rules2: minSupport gates pairs; duplicate lines and nulls collapse/drop") {
    val baskets = Seq(
      (1L, "milk"), (1L, "milk"), (1L, "bread"), // dup line: ONE membership
      (2L, "milk"), (2L, "bread"),
      (3L, "milk"), (3L, "butter"),
      (3L, null.asInstanceOf[String])).toDF("bk", "it")
    val out3 = rulesMap(Association.rules2(baskets, "bk", "it", 2L))
    // {milk, bread} support 2 (the dup line cannot inflate it to 3)
    assert(out3(("milk", "bread"))._1 == 2L)
    assert(!out3.contains(("milk", "butter"))) // pair support 1
    // raising minSupport above the top pair empties the output
    assert(Association.rules2(baskets, "bk", "it", 3L).count() == 0L)
  }

  test("rules2: lift direction — complementary items score below 1e6") {
    // x and y never co-occur except once; z co-occurs with both always
    val baskets = (1L to 8L).flatMap { b =>
      if (b <= 4) Seq((b, "x"), (b, "z")) else Seq((b, "y"), (b, "z"))
    }.toDF("bk", "it")
    val out = rulesMap(Association.rules2(baskets, "bk", "it", 2L))
    // x,z: pair 4, sx 4, sz 8, n 8 -> lift = 4*8e6/(4*8) = 1e6 (independent of z)
    assert(out(("x", "z"))._6 == 1000000L)
    assert(out(("z", "x"))._5 == 500000L) // conf z->x = 4/8
    assert(!out.contains(("x", "y"))) // never co-occur
  }

  test("alsoBought: top-k by lift with id tie-break; metrics ride along") {
    // baskets engineered so item 1 pairs strongest with 3, then 2:
    // {1,3} x3, {1,2} x2, {2,3} x2, plus filler baskets to spread supports
    val rows = Seq(
      (1L, 1L), (1L, 3L), (2L, 1L), (2L, 3L), (3L, 1L), (3L, 3L),
      (4L, 1L), (4L, 2L), (5L, 1L), (5L, 2L),
      (6L, 2L), (6L, 3L), (7L, 2L), (7L, 3L),
      (8L, 2L), (9L, 3L)).toDF("bk", "it")
    val out = Association.alsoBought(rows, "bk", "it", 2L, 2)
      .collect().map(r => (r.getAs[Long]("antecedent"), r.getAs[Long]("rn")) ->
        ((r.getAs[Long]("consequent"), r.getAs[Long]("n_pair"),
          r.getAs[Long]("lift_ppm")))).toMap
    // n=9 baskets; s1=5, s2=5, s3=6; pairs: (1,3)=3, (1,2)=2, (2,3)=2
    // lift(1,3) = 3*9e6/(5*6) = 900000; lift(1,2) = 2*9e6/25 = 720000
    assert(out((1L, 1L)) == ((3L, 3L, 900000L)))
    assert(out((1L, 2L)) == ((2L, 2L, 720000L)))
    // k caps the list: antecedent 1 has exactly 2 rows
    assert(!out.contains((1L, 3L)))
    // symmetric lift: 3's list leads with 1 (900000 > lift(2,3)=600000)
    assert(out((3L, 1L))._1 == 1L)
  }

  test("alsoBought: equal lift resolves to the smaller consequent id") {
    // two perfectly-lifted pairs for item 1: {1,2} and {1,4}, same counts
    val rows = Seq(
      (1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 4L), (4L, 1L), (4L, 4L)).toDF("bk", "it")
    val out = Association.alsoBought(rows, "bk", "it", 2L, 1)
      .collect().map(r => r.getAs[Long]("antecedent") ->
        r.getAs[Long]("consequent")).toMap
    assert(out(1L) == 2L)
  }

  test("recExposure: hand coverage and popularity lift; off-catalog recs drop") {
    import spark.implicits._
    // baskets: {1,2}, {1,2}, {1,3}, {3} -> supports 1:3, 2:2, 3:2
    // (n_cat = 3, tot_sup = 7)
    val baskets = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 3L), (4L, 3L), (4L, 3L)) // dup membership collapses
      .toDF("bk", "it")
    val recs = Seq((10L, 1L), (10L, 2L), (20L, 1L), (20L, 99L))
      .toDF("ante", "cons") // 99 is off-catalog -> drops
    val out = Association.recExposure(baskets, "bk", "it", recs,
      "ante", "cons").collect()(0)
    assert(out.getAs[Long]("catalog_size") == 3L)
    assert(out.getAs[Long]("n_lists") == 2L)
    assert(out.getAs[Long]("n_recs") == 3L)
    assert(out.getAs[Long]("distinct_recommended") == 2L)
    assert(out.getAs[Long]("coverage_ppm") == 666666L) // 2 of 3
    // rec_sup = 3 + 2 + 3 = 8; lift = 8*3e6 / (3*7) = 1142857
    assert(out.getAs[Long]("pop_lift_ppm") == 1142857L)
    // empty rec table: counts zero, ratios null, no crash
    val empty = Association.recExposure(baskets, "bk", "it",
      Seq.empty[(Long, Long)].toDF("ante", "cons"), "ante", "cons")
      .collect()(0)
    assert(empty.getAs[Long]("n_recs") == 0L)
    assert(empty.isNullAt(empty.fieldIndex("pop_lift_ppm")))
  }

  test("rankAgreement3: dyadic RBO hand values; one-sided antecedents drop") {
    import spark.implicits._
    def recs(rows: (Long, Long, Long)*) =
      rows.toSeq.toDF("ante", "rn", "cons")
    val a = recs(
      (1L, 1L, 10L), (1L, 2L, 11L), (1L, 3L, 12L), // identical lists
      (2L, 1L, 20L), (2L, 2L, 21L), (2L, 3L, 22L), // disjoint lists
      (3L, 1L, 30L), (3L, 2L, 31L), (3L, 3L, 32L), // rank-1 swap
      (9L, 1L, 90L)) // only in A -> drops
    val b = recs(
      (1L, 1L, 10L), (1L, 2L, 11L), (1L, 3L, 12L),
      (2L, 1L, 25L), (2L, 2L, 26L), (2L, 3L, 27L),
      (3L, 1L, 31L), (3L, 2L, 30L), (3L, 3L, 32L))
    val out = Association.rankAgreement3(a, b, "ante", "rn", "cons")
      .collect().map(r => r.getAs[Long]("rbo_ppm") ->
        ((r.getAs[Long]("n_antecedents"), r.getAs[Long]("share_ppm"))))
      .toMap
    // identical: 21/21 = 1e6; disjoint: 0; rank-1 swap (30<->31):
    // I1 = 0 (different heads), I2 = 2, I3 = 3 -> (0 + 6 + 3)/21
    assert(out(1000000L) == ((1L, 333333L)))
    assert(out(0L) == ((1L, 333333L)))
    assert(out(1000000L * 9 / 21) == ((1L, 333333L)))
    assert(out.values.map(_._1).sum == 3L) // antecedent 9 dropped
  }
}
