package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, timestamp_micros}

class SeqPatternsSpec extends SparkSpec {
  import spark.implicits._

  private val min = 60000000L
  // A: a@0, b@10m, a@70m, c@200m  — a→b in 10m; b→a at EXACTLY 60m
  //    (inclusive boundary); a→c best gap 130m (out)
  // B: b@0, a@5m, c@50m           — b→a, b→c, a→c (45m)
  // C: a@0                        — antecedent support only
  // D: a@0, b@0 (simultaneous)    — must chain NEITHER direction
  private def fixture = Seq(
    ("A", 0L, "a"), ("A", 10 * min, "b"), ("A", 70 * min, "a"),
    ("A", 200 * min, "c"),
    ("B", 0L, "b"), ("B", 5 * min, "a"), ("B", 50 * min, "c"),
    ("C", 0L, "a"),
    ("D", 0L, "a"), ("D", 0L, "b"),
    ("D", 30 * min, "zzz")) // outside the alphabet: ignored entirely
    .toDF("u", "us", "t")
    .withColumn("ts", timestamp_micros(col("us")))

  private def run(minSupport: Long = 1L) =
    SeqPatterns.level2(fixture, "u", "ts", "t", Seq("a", "b", "c"),
        maxGapMinutes = 60L, minSupport = minSupport)
      .collect().map(r => (r.getAs[String]("antecedent"),
        r.getAs[String]("consequent")) ->
        ((r.getAs[Long]("n_entities"), r.getAs[Long]("n_ante"),
          r.getAs[Long]("n_cons"), r.getAs[Long]("support_ppm"),
          r.getAs[Long]("confidence_ppm"), r.getAs[Long]("lift_ppm"))))
      .toMap

  test("hand-checked supports, gap boundary inclusive, simultaneous events never chain") {
    val out = run()
    // N = 4 entities; ante supports: a=4 (A,B,C,D), b=3 (A,B,D), c=2
    assert(out.keySet == Set(("a", "b"), ("a", "c"), ("b", "a"), ("b", "c")))
    // b→a: A (exactly 60m, inclusive) + B; D's same-ts pair must NOT count
    assert(out(("b", "a")) == ((2L, 3L, 4L, 500000L, 666666L, 666666L)))
    // a→b: only A (D simultaneous, B's b precedes its a)
    assert(out(("a", "b")) == ((1L, 4L, 3L, 250000L, 250000L, 333333L)))
    // a→c: only B (A's best a→c gap is 130m > 60m)
    assert(out(("a", "c")) == ((1L, 4L, 2L, 250000L, 250000L, 500000L)))
    assert(out(("b", "c")) == ((1L, 3L, 2L, 250000L, 333333L, 666666L)))
  }

  test("minSupport gates the output rows") {
    assert(run(minSupport = 2L).keySet == Set(("b", "a")))
  }

  test("repartition-invariant") {
    def m(d: org.apache.spark.sql.DataFrame) =
      SeqPatterns.level2(d, "u", "ts", "t", Seq("a", "b", "c"), 60L)
        .collect().map(r => (r.getString(0), r.getString(1),
          r.getAs[Long]("n_entities"))).sorted.toSeq
    assert(m(fixture.coalesce(1)) == m(fixture.repartition(7)))
  }

  test("empty corpus yields no rows, not a crash") {
    val empty = Seq.empty[(String, Long, String)].toDF("u", "us", "t")
      .withColumn("ts", timestamp_micros(col("us")))
    assert(SeqPatterns.level2(empty, "u", "ts", "t", Seq("a", "b"), 60L)
      .collect().isEmpty)
  }

  test("level3: the greedy trap — a later in-gap b with a c behind it beats the first b without one") {
    // E: a@0, b@1m (next c is 11m away — too far from THIS b),
    //    b@9m, c@12m. Per-step gap 10m: the chain a→b@9→c@12 is valid
    //    (gaps 9m, 3m) even though the FIRST b after a fails its
    //    c-step (11m > 10m). A greedy first-b chain would miss it.
    // F: a@0, b@5m, c@30m — b in gap but no c within 10m of any b.
    val rows = Seq(
      ("E", 0L, "a"), ("E", 1 * min, "b"), ("E", 9 * min, "b"),
      ("E", 12 * min, "c"),
      ("F", 0L, "a"), ("F", 5 * min, "b"), ("F", 30 * min, "c"))
      .toDF("u", "us", "t")
      .withColumn("ts", timestamp_micros(col("us")))
    val out = SeqPatterns.level3(rows, "u", "ts", "t", Seq("a", "b", "c"),
        maxGapMinutes = 10L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        ((r.getAs[Long]("n_entities"), r.getAs[Long]("n_step1"),
          r.getAs[Long]("support_ppm"), r.getAs[Long]("completion_ppm"))))
      .toMap
    assert(out(("a", "b", "c")) == ((1L, 2L, 500000L, 500000L)))
    // b→b→c on E: b@1 → b@9 (8m) → c@12 (3m): present
    assert(out(("b", "b", "c"))._1 == 1L)
    assert(!out.contains(("a", "c", "b")))
  }

  test("level3: simultaneous steps never chain and each step's gap binds separately") {
    // G: a@0, b@0 (same ts: step 1 fails), c@5m
    // H: a@0, b@9m, c@20m (second gap 11m > 10m: fails)
    // I: a@0, b@9m, c@19m (gaps 9m, 10m inclusive: present)
    val rows = Seq(
      ("G", 0L, "a"), ("G", 0L, "b"), ("G", 5 * min, "c"),
      ("H", 0L, "a"), ("H", 9 * min, "b"), ("H", 20 * min, "c"),
      ("I", 0L, "a"), ("I", 9 * min, "b"), ("I", 19 * min, "c"))
      .toDF("u", "us", "t")
      .withColumn("ts", timestamp_micros(col("us")))
    val out = SeqPatterns.level3(rows, "u", "ts", "t", Seq("a", "b", "c"),
        maxGapMinutes = 10L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        r.getAs[Long]("n_entities")).toMap
    assert(out(("a", "b", "c")) == 1L) // only I
    // G's b@0 never follows a@0; but b@0 -> c@5m IS a valid level-2
    // tail: the triple needs all three, so G contributes nothing here
    assert(!out.contains(("a", "b", "a")))
  }

  // view→click→purchase, gaps (10m, 10m); one entity per drop-off bucket:
  // u1 completes; u2 gap-expires at 2 (click 20m late); u3 absent at 2
  //   (its only click PRECEDES the view); u4 never views (absent at 1);
  // u5 gap-expires at 3 (purchase 25m after the valid click); u6 absent
  //   at 3 (purchase precedes the click); u7 completes via the
  //   non-greedy trap (first click has no in-gap purchase, a later
  //   in-gap click does); u8 view+click simultaneous (never chains).
  private def funnelFixture = Seq(
    ("u1", 0L, "view"), ("u1", 5 * min, "click"), ("u1", 12 * min, "purchase"),
    ("u2", 0L, "view"), ("u2", 20 * min, "click"),
    ("u3", 0L, "click"), ("u3", 5 * min, "view"),
    ("u4", 0L, "click"), ("u4", 1 * min, "purchase"),
    ("u5", 0L, "view"), ("u5", 5 * min, "click"), ("u5", 30 * min, "purchase"),
    ("u6", 0L, "view"), ("u6", 2 * min, "purchase"), ("u6", 5 * min, "click"),
    ("u7", 0L, "view"), ("u7", 2 * min, "click"), ("u7", 8 * min, "click"),
    ("u7", 15 * min, "purchase"),
    ("u8", 0L, "view"), ("u8", 0L, "click"))
    .toDF("u", "us", "t")
    .withColumn("ts", timestamp_micros(col("us")))

  private def runFunnel(d: org.apache.spark.sql.DataFrame) =
    SeqPatterns.funnelDropoff3(d, "u", "ts", "t",
        steps = Seq("view", "click", "purchase"), gapsMinutes = Seq(10L, 10L))
      .collect().map(r => r.getAs[Long]("step") ->
        ((r.getAs[String]("event_type"), r.getAs[Long]("n_entered"),
          r.getAs[Long]("n_reached"), r.getAs[Long]("n_gap_expired"),
          r.getAs[Long]("n_absent"),
          r.getAs[java.lang.Long]("conversion_ppm"))))
      .toMap

  test("funnel drop-off: gap-expired vs absent distinguished at every step") {
    val out = runFunnel(funnelFixture)
    assert(out(1L) == (("view", 8L, 7L, 0L, 1L, 875000L)))
    // reached2 = u1,u5,u6,u7; gap-expired = u2 (click came, 20m > 10m);
    // absent = u3 (click only BEFORE the view), u8 (same-ts never chains)
    assert(out(2L) == (("click", 7L, 4L, 1L, 2L, 571428L)))
    // reached3 = u1, u7 (non-greedy: via click@8m); gap-expired = u5
    // (purchase 25m after the valid click); absent = u6 (purchase
    // precedes the click — never follows a valid completion)
    assert(out(3L) == (("purchase", 4L, 2L, 1L, 1L, 500000L)))
  }

  test("funnel drop-off: repartition-invariant and empty-corpus safe") {
    assert(runFunnel(funnelFixture.coalesce(1)) ==
      runFunnel(funnelFixture.repartition(7)))
    val empty = Seq.empty[(String, Long, String)].toDF("u", "us", "t")
      .withColumn("ts", timestamp_micros(col("us")))
    val z = runFunnel(empty)
    assert(z(1L) == (("view", 0L, 0L, 0L, 0L, null)))
    assert(z(2L)._2 == 0L && z(3L)._2 == 0L)
  }
}
