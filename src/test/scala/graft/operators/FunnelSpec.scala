package graft.operators

import graft.SparkSpec

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000L)

  private def run(rows: Seq[(Long, java.sql.Timestamp, Long, String)],
                  steps: Seq[String]) =
    Funnel.orderedFunnel(rows.toDF("u", "ts", "eid", "ty"),
        "u", "ts", "eid", "ty", steps)
      .collect().map(r => r.getAs[Long]("step_idx") ->
        ((r.getAs[String]("step"), r.getAs[Long]("n_reached"),
          Option(r.getAs[java.lang.Long]("conv_from_prev_ppm"))
            .map(_.longValue()),
          Option(r.getAs[java.lang.Long]("median_gap_micros"))
            .map(_.longValue())))).toMap

  test("hand funnel: order is mandatory, gaps are exact medians") {
    val rows = Seq(
      // u1 completes A(10) -> B(40) -> C(100): gaps 30s, 60s
      (1L, ts(10), 1L, "A"), (1L, ts(40), 2L, "B"), (1L, ts(100), 3L, "C"),
      // u2: B BEFORE A, then B never again -> stops after A
      (2L, ts(5), 4L, "B"), (2L, ts(20), 5L, "A"),
      // u3: A(0) -> B(10): gap 10s, no C
      (3L, ts(0), 6L, "A"), (3L, ts(10), 7L, "B"),
      // u4: only C — reaches nothing (A missing)
      (4L, ts(1), 8L, "C"))
    val out = run(rows, Seq("A", "B", "C"))
    assert(out(1L) == (("A", 3L, None, None)))
    // u1 and u3 reach B; conv 2/3; gaps {30s, 10s} -> lower middle 10s
    assert(out(2L) == (("B", 2L, Some(666666L), Some(10000000L))))
    assert(out(3L) == (("C", 1L, Some(500000L), Some(60000000L))))
  }

  test("earliest completion: the FIRST qualifying event stamps the step") {
    // u1 has two Bs after A; the gap must use the EARLIER one
    val rows = Seq(
      (1L, ts(0), 1L, "A"), (1L, ts(5), 2L, "B"), (1L, ts(50), 3L, "B"))
    val out = run(rows, Seq("A", "B"))
    assert(out(2L)._4 == Some(5000000L))
  }

  test("same-instant events order by seq; one event cannot satisfy two steps") {
    // A and B at the SAME ts: B's seq is higher -> counts (strictly
    // after in (ts, seq)); reversed seqs -> does not
    val ok = run(Seq((1L, ts(7), 1L, "A"), (1L, ts(7), 2L, "B")),
      Seq("A", "B"))
    assert(ok(2L)._2 == 1L && ok(2L)._4 == Some(0L))
    val not = run(Seq((1L, ts(7), 2L, "A"), (1L, ts(7), 1L, "B")),
      Seq("A", "B"))
    assert(not(2L)._2 == 0L)
    // a single step type repeated: the same event can't be A and then A
    val rep = run(Seq((1L, ts(1), 1L, "A")), Seq("A"))
    assert(rep(1L)._2 == 1L)
  }

  test("duplicate step names rejected loudly") {
    intercept[IllegalArgumentException] {
      Funnel.orderedFunnel(Seq((1L, ts(0), 1L, "A")).toDF("u", "ts", "eid", "ty"),
        "u", "ts", "eid", "ty", Seq("A", "A"))
    }
  }

  test("precedenceCensus: strict precedence, same-instant excluded") {
    // u1: A@1 then B@2 (A precedes B; B does not precede A)
    // u2: A@5 and B@5 exactly (both present, NEITHER precedes)
    // u3: B@1 then A@2 (B precedes A)
    val rows = Seq(
      (1L, ts(1), "A"), (1L, ts(2), "B"),
      (2L, ts(5), "A"), (2L, ts(5), "B"),
      (3L, ts(1), "B"), (3L, ts(2), "A"))
    val out = Funnel.precedenceCensus(
        rows.toDF("u", "ts", "ty"), "u", "ts", "ty")
      .collect().map(r => (r.getAs[String]("type_a"),
        r.getAs[String]("type_b")) ->
        ((r.getAs[Long]("n_both"), r.getAs[Long]("n_precede"),
          r.getAs[Long]("precede_ppm")))).toMap
    assert(out(("A", "B")) == ((3L, 1L, 333333L)))
    assert(out(("B", "A")) == ((3L, 1L, 333333L)))
  }

  test("precedenceCensus: min/max span semantics — ANY a before SOME b") {
    // u1: B@1, A@2, B@3 -> A precedes (the later B); B precedes A too
    val rows = Seq((1L, ts(1), "B"), (1L, ts(2), "A"), (1L, ts(3), "B"))
    val out = Funnel.precedenceCensus(
        rows.toDF("u", "ts", "ty"), "u", "ts", "ty")
      .collect().map(r => (r.getAs[String]("type_a"),
        r.getAs[String]("type_b")) -> r.getAs[Long]("n_precede")).toMap
    assert(out(("A", "B")) == 1L && out(("B", "A")) == 1L)
  }
}
