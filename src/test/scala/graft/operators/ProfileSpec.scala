package graft.operators

import graft.SparkSpec

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private def audit(rows: Seq[(String, String)],
                    fd: (Seq[String], String)) = {
    val r = Profile.fdStrength(rows.toDF("x", "y"), Seq(fd)).collect()(0)
    (r.getAs[Long]("n_rows"), r.getAs[Long]("n_groups"),
      r.getAs[Long]("n_violating_groups"), r.getAs[Long]("rows_to_remove"),
      Option(r.getAs[Any]("g3_ppm")).map(_.asInstanceOf[Long]),
      r.getAs[Boolean]("holds"))
  }

  test("fdStrength: exact FD holds with zero removals") {
    val rows = Seq("a" -> "1", "a" -> "1", "b" -> "2", "c" -> "1")
    assert(audit(rows, Seq("x") -> "y") ==
      ((4L, 3L, 0L, 0L, Some(0L), true)))
  }

  test("fdStrength: g3 keeps the plurality value per group") {
    // group a: y values 1,1,2 -> keep 2 rows, remove 1
    // group b: y values 3    -> keep all
    val rows = Seq("a" -> "1", "a" -> "1", "a" -> "2", "b" -> "3")
    assert(audit(rows, Seq("x") -> "y") ==
      ((4L, 2L, 1L, 1L, Some(250000L), false)))
  }

  test("fdStrength: null on either side excluded; empty input holds vacuously") {
    val rows = Seq(("a", "1"), ("a", null), (null, "2"), ("a", "9"))
      .asInstanceOf[Seq[(String, String)]]
    // only ("a","1") and ("a","9") survive the null filter
    assert(audit(rows, Seq("x") -> "y") ==
      ((2L, 1L, 1L, 1L, Some(500000L), false)))
    val empty = Seq(("a", null)).asInstanceOf[Seq[(String, String)]]
    assert(audit(empty, Seq("x") -> "y") ==
      ((0L, 0L, 0L, 0L, None, true)))
  }

  test("fdStrength: composite determinant and multiple candidates") {
    val df = Seq(("a", "p", "1"), ("a", "q", "2"), ("a", "p", "1"),
      ("b", "p", "3")).toDF("x1", "x2", "y")
    val out = Profile.fdStrength(df,
        Seq(Seq("x1", "x2") -> "y", Seq("x1") -> "y"))
      .collect().map(r => r.getAs[String]("fd") ->
        (r.getAs[Long]("rows_to_remove"), r.getAs[Boolean]("holds"))).toMap
    assert(out("x1,x2->y") == ((0L, true)))  // (a,p)->1, (a,q)->2, (b,p)->3
    assert(out("x1->y") == ((1L, false)))    // a has values {1,1,2}
  }

  test("fdStrengthBy: per-condition g3 isolates the dirty partition") {
    // partition p: FD holds; partition q: group a has values {1,1,2}
    val df = Seq(
      ("p", "a", "1"), ("p", "a", "1"), ("p", "b", "2"),
      ("q", "a", "1"), ("q", "a", "1"), ("q", "a", "2"), ("q", "b", "3"))
      .toDF("part", "x", "y")
    val out = Profile.fdStrengthBy(df, "part", Seq("x"), "y")
      .collect().map(r => r.getAs[String]("part") ->
        ((r.getAs[Long]("rows_to_remove"), r.getAs[Long]("g3_ppm"),
          r.getAs[Boolean]("holds")))).toMap
    assert(out("p") == ((0L, 0L, true)))
    assert(out("q") == ((1L, 250000L, false)))
    // per-condition rows must sum to the unconditioned audit's
    val global = Profile.fdStrength(df, Seq(Seq("part", "x") -> "y"))
      .collect()(0)
    assert(global.getAs[Long]("rows_to_remove") == 1L)
  }

  test("benford: hand histogram — observed ppm vs pinned expectation") {
    // group g: digits 1,1,1,2 (obs 750000 / 250000); nulls + zeros +
    // negatives excluded but ledgered
    val rows = Seq(("g", 100L), ("g", 1500L), ("g", 19L), ("g", 2L),
      ("g", 0L), ("g", -7L)) ++ Seq(("g", null.asInstanceOf[Any]))
    val df = rows.map { case (g, v) => (g, v.asInstanceOf[java.lang.Long]) }
      .toDF("g", "v")
    val r = Profile.benford(df, "g", "v").collect()(0)
    assert(r.getAs[Long]("n_values") == 4L)
    assert(r.getAs[Long]("n_excluded") == 3L)
    assert(r.getAs[Long]("d1_ppm") == 750000L)
    // deviations: digit 1: |750000-301029| = 448971; digit 2:
    // |250000-176091| = 73909 -> worst is digit 1
    assert(r.getAs[Long]("max_dev_ppm") == 448971L)
    assert(r.getAs[Long]("worst_digit") == 1L)
  }

  test("benford: a perfectly Benford sample has near-zero deviation") {
    // counts proportional to the pinned masses out of 1e6 draws
    val masses = Seq(301029L, 176091L, 124938L, 96910L, 79181L, 66946L,
      57991L, 51152L, 45757L)
    val rows = masses.zipWithIndex.flatMap { case (m, i) =>
      Seq.fill((m / 1000L).toInt)(("g", (i + 1).toLong * 10L)) }
    val r = Profile.benford(rows.toDF("g", "v"), "g", "v").collect()(0)
    // flooring the /1000 counts costs at most ~1000 ppm per digit
    assert(r.getAs[Long]("max_dev_ppm") < 2000L,
      s"deviation too large: ${r.getAs[Long]("max_dev_ppm")}")
  }

  test("fdStrength: degenerate candidates rejected") {
    val df = Seq(("a", "1")).toDF("x", "y")
    intercept[IllegalArgumentException] {
      Profile.fdStrength(df, Seq(Seq("y") -> "y"))
    }
    intercept[IllegalArgumentException] {
      Profile.fdStrength(df, Seq.empty)
    }
  }

  test("histogramDrift: hand fixture — floor bins, ppm masses, exact TV") {
    import org.apache.spark.sql.functions.col
    // A: 2 rows bin 0, 1 row bin -1 (negative value -> FLOOR bin);
    // B: 3 rows bin 0, 1 row bin 2 (bin -1 empty on B, bin 2 empty on A)
    val a = Seq(5L, 9L, -3L).toDF("v")
    val b = Seq(1L, 2L, 3L, 25L).toDF("v")
    val out = Profile.histogramDrift(a, b, "v", binWidth = 10L)
      .collect().map(r => r.getAs[Long]("bin") ->
        ((r.getAs[Long]("bin_lo"), r.getAs[Long]("n_a"),
          r.getAs[Long]("n_b"), r.getAs[Long]("ppm_a"),
          r.getAs[Long]("ppm_b"), r.getAs[Long]("shift_ppm"),
          r.getAs[Long]("tv_ppm")))).toMap
    // TV = (333333 + 83334 + 250000) div 2 = 333333 (truncating)
    assert(out(-1L) == ((-10L, 1L, 0L, 333333L, 0L, -333333L, 333333L)))
    assert(out(0L) == ((0L, 2L, 3L, 666666L, 750000L, 83334L, 333333L)))
    assert(out(2L) == ((20L, 0L, 1L, 0L, 250000L, 250000L, 333333L)))
  }

  test("fkOrphans: orphans in rows and keys; nulls opt out") {
    import org.apache.spark.sql.functions.col
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    // children: 1,1 hit; 9,9,9 orphan (one key, three rows); 8 orphan;
    // two null keys opt out of the constraint
    val child = Seq[java.lang.Long](1L, 1L, 9L, 9L, 9L, 8L, null, null)
      .toDF("ck")
    val out = Profile.fkOrphans(
        Seq(("t", child, "ck", parent, "pk")))
      .collect().head
    assert(out.getAs[Long]("n_rows") == 8L)
    assert(out.getAs[Long]("null_rows") == 2L)
    assert(out.getAs[Long]("orphan_rows") == 4L)
    assert(out.getAs[Long]("orphan_ppm") == 666666L) // 4 of 6 non-null
    assert(out.getAs[Long]("orphan_keys") == 2L)
  }

  test("fkOrphans: clean FK reports zeros; all-null child gives null ppm") {
    import org.apache.spark.sql.functions.col
    val parent = Seq(1L, 2L).toDF("pk")
    val clean = Seq(1L, 2L, 2L).toDF("ck")
    val allNull = Seq[java.lang.Long](null, null).toDF("ck")
    val out = Profile.fkOrphans(Seq(
        ("clean", clean, "ck", parent, "pk"),
        ("nulls", allNull, "ck", parent, "pk")))
      .collect().map(r => r.getAs[String]("fk_name") ->
        ((r.getAs[Long]("orphan_rows"),
          Option(r.getAs[java.lang.Long]("orphan_ppm")),
          r.getAs[Long]("orphan_keys")))).toMap
    assert(out("clean") == ((0L, Some(0L), 0L)))
    assert(out("nulls")._1 == 0L && out("nulls")._2 == None)
  }

  test("histogramDrift: identical slices give zero TV and zero shifts") {
    val x = Seq(1L, 5L, 15L, 15L, 25L).toDF("v")
    val rows = Profile.histogramDrift(x, x, "v", binWidth = 10L).collect()
    assert(rows.forall(_.getAs[Long]("shift_ppm") == 0L))
    assert(rows.forall(_.getAs[Long]("tv_ppm") == 0L))
    assert(rows.forall(r => r.getAs[Long]("n_a") == r.getAs[Long]("n_b")))
  }
}
