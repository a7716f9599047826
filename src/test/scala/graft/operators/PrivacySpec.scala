package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** k-anonymity release gating: the anonymity-set guarantee on RELEASED
  * keys, the leftover semantics that makes it real, and the full
  * 3-column generalization ladder.
  */
class PrivacySpec extends SparkSpec {
  import spark.implicits._

  test("every released key is shared by >= k released rows (the k-anonymity guarantee)") {
    val d = (1 to 12).map(i => (i.toLong, "a", "x")) ++  // (a,x): 12
      (13 to 15).map(i => (i.toLong, "a", "y")) ++       // (a,y): 3
      (16 to 27).map(i => (i.toLong, "b", if (i % 2 == 0) "x" else "y")) // b: 6+6
    val out = Privacy.kAnonymize(d.toDF("id", "q1", "q2"), Seq("q1", "q2"), k = 5L)
    val byKey = out.filter(col("anon_level") < 2)
      .groupBy(col("released_key")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byKey.values.forall(_ >= 5L), s"undersized anonymity set: $byKey")
    // and the reported group size IS the released-set size
    val sizes = out.filter(col("anon_level") < 2)
      .select(col("released_key"), col("anon_group_size")).distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes == byKey, s"reported $sizes vs actual $byKey")
  }

  test("leftover semantics: a coarse group that only reaches k with RELEASED rows stays suppressed") {
    // (a,x) has 10 >= k=10 -> released at level 0. (a,y) has 3; the 'a'
    // LEFTOVER mass is 3 < 10, so (a,y) suppresses — even though ALL 'a'
    // rows total 13 >= 10. Counting released level-0 rows into the
    // coarser key would publish an 'a/*' key covering only 3 rows.
    val d = (1 to 10).map(i => (i.toLong, "a", "x")) ++
      (11 to 13).map(i => (i.toLong, "a", "y"))
    val out = Privacy.kAnonymize(d.toDF("id", "q1", "q2"), Seq("q1", "q2"), k = 10L)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("anon_level"), r.getAs[String]("released_key")))).toMap
    (1L to 10L).foreach(i => assert(out(i) == ((0L, "a/x"))))
    (11L to 13L).foreach(i => assert(out(i) == ((2L, "*/*")), s"doc $i: ${out(i)}"))
    // suppressed rows carry a null group size
    val sup = Privacy.kAnonymize(d.toDF("id", "q1", "q2"), Seq("q1", "q2"), k = 10L)
      .filter(col("anon_level") === 2)
    assert(sup.filter(col("anon_group_size").isNotNull).count() == 0)
  }

  test("NULL quasi-identifiers are their own category, never dropped") {
    // a missing value still identifies: 5 null-lang rows form a group
    // that reaches k and releases with "null" in the key; the lone
    // (b, de) row suppresses — and EVERY input row appears in the output
    // (the naive column-list join-back would silently drop null-QI rows)
    val d = (1 to 5).map(i => (i.toLong, "a", null: String)) ++
      Seq((6L, "b", "de"))
    val out = Privacy.kAnonymize(d.toDF("id", "q1", "q2"), Seq("q1", "q2"), k = 5L)
    assert(out.count() == 6, "one output row per input row, nulls included")
    val got = out.collect().map(r => r.getAs[Long]("id") ->
      ((r.getAs[Long]("anon_level"), r.getAs[String]("released_key")))).toMap
    (1L to 5L).foreach(i => assert(got(i) == ((0L, "a/null")), s"doc $i: ${got(i)}"))
    assert(got(6L) == ((2L, "*/*")))
  }

  test("3-column ladder: levels climb one generalization at a time") {
    // QI = (region, site, lang), k = 4:
    //  - (r1, s1, en): 4 rows -> level 0, key r1/s1/en
    //  - (r1, s1, de) 2 + (r1, s2, fr) 2 -> site-level leftovers: s1 has
    //    2 (<4), s2 has 2 (<4) -> roll to region: r1 leftover 4 -> level
    //    2, key r1/*/*
    //  - (r2, s9, zh): 3 alone -> all ladder levels fail -> suppressed
    val d =
      (1 to 4).map(i => (i.toLong, "r1", "s1", "en")) ++
      Seq((5L, "r1", "s1", "de"), (6L, "r1", "s1", "de"),
        (7L, "r1", "s2", "fr"), (8L, "r1", "s2", "fr"),
        (9L, "r2", "s9", "zh"), (10L, "r2", "s9", "zh"), (11L, "r2", "s9", "zh"))
    val out = Privacy.kAnonymize(
        d.toDF("id", "region", "site", "lang"),
        Seq("region", "site", "lang"), k = 4L)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("anon_level"), r.getAs[String]("released_key")))).toMap
    (1L to 4L).foreach(i => assert(out(i) == ((0L, "r1/s1/en"))))
    (5L to 8L).foreach(i => assert(out(i) == ((2L, "r1/*/*")), s"doc $i: ${out(i)}"))
    (9L to 11L).foreach(i => assert(out(i) == ((3L, "*/*/*")), s"doc $i: ${out(i)}"))
  }

  // ---- t-closeness -------------------------------------------------------

  /** A pre-anonymized frame: released_key + anon_group_size + sensitive,
    * exactly what [[Privacy.kAnonymize]] emits downstream.
    */
  private def release(rows: Seq[(String, String)]) =
    rows.zipWithIndex
      .map { case ((k, s), i) => (i.toLong, k, 10L, s) }
      .toDF("id", "released_key", "anon_group_size", "sv")

  test("t-closeness: hand-computed total variation, floored ppm, exact flag") {
    // a: [x,x,y] (n=3), b: [x,y,y,z] (n=4); N=7, g = (x:3, y:3, z:1)
    //  a: sum|c*N - g*n| = |14-9| + |7-9| = 7; missing mass n*(N-6) = 3
    //     -> tvd = 10/42 = 0.238095... -> 238095 ppm
    //  b: |7-12| + |14-12| + |7-4| = 10; missing 0 -> 10/56 -> 178571 ppm
    val rows = Seq("x", "x", "y").map("a" -> _) ++
      Seq("x", "y", "y", "z").map("b" -> _)
    val out = Privacy.tClosenessReport(release(rows), "sv", tPpm = 200000L)
      .collect().map(r => r.getAs[String]("released_key") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("tvd_ppm"),
          r.getAs[Boolean]("close")))).toMap
    assert(out("a") == ((3L, 238095L, false)), s"a: ${out("a")}")
    assert(out("b") == ((4L, 178571L, true)), s"b: ${out("b")}")
  }

  test("t-closeness: the skew l-diversity misses (2-diverse but far)") {
    // both groups are 2-diverse, but b is heavily skewed toward the
    // globally-rare value z: distinct-value counting can't see it, the
    // distance can
    val rows = Seq.fill(9)("a" -> "x") ++ Seq("a" -> "z") ++
      Seq.fill(9)("b" -> "z") ++ Seq("b" -> "x")
    val anon = release(rows)
    val lDiv = Privacy.lDiversityReport(anon, "sv", l = 2L)
      .collect().map(r => r.getAs[String]("released_key") ->
        r.getAs[Boolean]("diverse")).toMap
    assert(lDiv == Map("a" -> true, "b" -> true))
    val tC = Privacy.tClosenessReport(anon, "sv", tPpm = 300000L)
      .collect().map(r => r.getAs[String]("released_key") ->
        r.getAs[Boolean]("close")).toMap
    // global: x 10/20, z 10/20; each group is 0.4 away — both fail 0.3
    assert(tC == Map("a" -> false, "b" -> false), s"got $tC")
  }

  test("t-closeness: flag compares exactly, never through the floored ppm") {
    // a: [x,x,y] (n=3), b: [x] -> N=4, g=(x:3, y:1)
    //  a: |8-9| + |4-3| = 2 -> tvd = 2/24 = 1/12 = 83333.33 ppm
    // at t = 83333 ppm the FLOORED ppm equals t, but the exact distance
    // exceeds it: 2*1e6 = 2000000 > 2*83333*12 = 1999992 -> NOT close
    val rows = Seq("x", "x", "y").map("a" -> _) :+ ("b" -> "x")
    val out = Privacy.tClosenessReport(release(rows), "sv", tPpm = 83333L)
      .collect().map(r => r.getAs[String]("released_key") ->
        ((r.getAs[Long]("tvd_ppm"), r.getAs[Boolean]("close")))).toMap
    assert(out("a") == ((83333L, false)), s"a: ${out("a")}")
    // and one notch up it flips
    val out2 = Privacy.tClosenessReport(release(rows), "sv", tPpm = 83334L)
      .collect().map(r => r.getAs[String]("released_key") ->
        r.getAs[Boolean]("close")).toMap
    assert(out2("a"))
  }

  test("t-closeness: suppressed rows shape neither P nor Q; null sensitive is a category") {
    val df = Seq(
      (1L, "a", Some(5L), Some("x")),
      (2L, "a", Some(5L), None),        // null sensitive, counted
      (3L, "*", None, Some("z")),       // suppressed: excluded everywhere
      (4L, "b", Some(5L), Some("x"))
    ).toDF("id", "released_key", "anon_group_size", "sv")
    val out = Privacy.tClosenessReport(df, "sv", tPpm = 500000L)
      .collect().map(r => r.getAs[String]("released_key") ->
        r.getAs[Long]("n_rows")).toMap
    // the suppressed row contributes no group and no global mass
    assert(out == Map("a" -> 2L, "b" -> 1L), s"got $out")
    // N=3, g=(x:2, null:1).
    //  a=[x,null] (n=2): |1*3-2*2| + |1*3-1*2| = 2, missing 0
    //    -> 2/12 = 1/6 -> 166666 ppm
    //  b=[x] (n=1): |1*3-2*1| = 1, missing 1*(3-2) = 1
    //    -> 2/6 = 1/3 -> 333333 ppm
    val ppm = Privacy.tClosenessReport(df, "sv", tPpm = 500000L)
      .collect().map(r => r.getAs[String]("released_key") ->
        r.getAs[Long]("tvd_ppm")).toMap
    assert(ppm == Map("a" -> 166666L, "b" -> 333333L), s"got $ppm")
  }

  // --- geometricNoisedCounts: geometric mechanism ---

  private def refPolyHash(s: String): Long =
    s.foldLeft(0L)((acc, c) => (acc * 31L + c.toLong) % Dedup.M)

  private def refNoise(key: String, epsPpm: Long, bound: Int): Long = {
    val h1 = (refPolyHash(key) * Privacy.MixA + Privacy.MixB) % Privacy.MixP
    val u = ((h1 * h1 % Privacy.MixP) * Privacy.MixA + h1) % Privacy.MixP
    val ts = Privacy.geometricThresholds(epsPpm, bound)
    ts.zip(-bound until bound).collectFirst {
      case (t, k) if u < t => k.toLong
    }.getOrElse(bound.toLong)
  }

  test("geometricNoisedCounts: released = max(0, n + invCDF(hash)) exactly") {
    val d = (1 to 50).map(i => (i.toLong, s"g${i % 7}")).toDF("id", "g")
    val out = Privacy.geometricNoisedCounts(d, Seq("g"), epsPpm = 500000L, seed = 42L)
      .collect().map(r => r.getAs[String]("g") -> r.getAs[Long]("released_n")).toMap
    val trueN = (1 to 50).groupBy(i => s"g${i % 7}").view.mapValues(_.size.toLong)
    for ((g, n) <- trueN) {
      val expected = math.max(0L, n + refNoise(s"42/$g", 500000L, 16))
      assert(out(g) == expected, s"group $g: got ${out(g)}, expected $expected")
    }
    // the mechanism is live: at eps=0.5 some group must be perturbed
    assert(trueN.exists { case (g, n) => out(g) != n }, "no noise applied anywhere")
  }

  test("geometricNoisedCounts: clamps at zero and rotates with the seed") {
    // 40 singleton groups: at eps=0.5 roughly half draw negative noise,
    // so some released counts clamp to 0
    val d = (1 to 40).map(i => (i.toLong, s"solo$i")).toDF("id", "g")
    val r42 = Privacy.geometricNoisedCounts(d, Seq("g"), 500000L, seed = 42L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(r42.values.forall(_ >= 0L))
    assert(r42.values.exists(_ == 0L), s"expected a clamped release in $r42")
    val r43 = Privacy.geometricNoisedCounts(d, Seq("g"), 500000L, seed = 43L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(r42 != r43, "seed rotation must change the draw")
    // re-run with the same seed is bit-identical (reproducible release)
    val r42b = Privacy.geometricNoisedCounts(d, Seq("g"), 500000L, seed = 42L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(r42 == r42b)
    // the square-recombine mix decorrelates sibling keys: the bare
    // polyhash maps solo1..solo40 to consecutive integers (observed:
    // only TWO distinct draws across 40 groups); mixed draws must spread
    val distinctDraws = r42.values.toSet.size
    assert(distinctDraws >= 5, s"correlated draws: only $distinctDraws distinct releases")
  }

  test("geometricThresholds: monotone ladder matching the symmetric CDF") {
    val ts = Privacy.geometricThresholds(500000L, 16)
    assert(ts.length == 32)
    assert(ts == ts.sorted && ts.last < Privacy.MixP && ts.head > 0L)
    // symmetry: CDF(-1) + CDF'(0) complement — P(X <= -1) == P(X >= 1),
    // i.e. t at index (bound-1) and the gap above index bound mirror
    val pNeg = ts(15)                  // cumulative mass of X <= -1
    val pPos = Privacy.MixP - ts(16)   // mass of X >= 1
    assert(math.abs(pNeg - pPos) <= 1L, s"asymmetric tails: $pNeg vs $pPos")
    // null group values hash as 'null', not as an empty segment
    val d = Seq((1L, Option.empty[String]), (2L, Some("x"))).toDF("id", "g")
    val out = Privacy.geometricNoisedCounts(d, Seq("g"), 500000L, seed = 7L)
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(out(None) == math.max(0L, 1L + refNoise("7/null", 500000L, 16)))
  }
}
