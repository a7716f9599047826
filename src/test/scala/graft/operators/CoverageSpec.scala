package graft.operators

import graft.SparkSpec

class CoverageSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)], k: Int) =
    Coverage.greedySelect(rows.toDF("id", "text"), "id", "text", k)
      .collect().map(r => (r.getAs[Long]("round"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("gain"), r.getAs[Long]("cum_coverage"))).toSeq

  test("greedy picks by marginal gain, not raw size") {
    // doc 1 covers {a b c d}; doc 2 covers {a b c}; doc 3 covers {x y};
    // round 1 -> doc 1 (4); round 2 -> doc 3 (2 NEW beats doc 2's 0)
    val rows = Seq((1L, "a b c d"), (2L, "a b c"), (3L, "x y"))
    val out = run(rows, 3)
    assert(out == Seq((1L, 1L, 4L, 4L), (2L, 3L, 2L, 6L),
      (3L, 2L, 0L, 6L)))
  }

  test("ties break to the smallest doc id; duplicate tokens count once") {
    val rows = Seq((7L, "t t t u"), (3L, "u v"), (5L, "v u"))
    // all cover 2 distinct tokens -> round 1 picks id 3
    val out = run(rows, 1)
    assert(out == Seq((1L, 3L, 2L, 2L)))
  }

  test("coverage never decreases and equals the running union") {
    val rnd = new scala.util.Random(29)
    val vocab = ('a' to 'z').map(_.toString)
    val rows = (1L to 20L).map(i =>
      (i, Seq.fill(6)(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
    val out = run(rows, 6)
    assert(out.map(_._1) == (1L to 6L))
    out.sliding(2).foreach {
      case Seq((_, _, _, c1), (_, _, g2, c2)) =>
        assert(c2 == c1 + g2 && g2 >= 0)
      case _ =>
    }
    // replay greedily in the JVM
    var seen = Set.empty[String]
    var left = rows.toMap
    out.foreach { case (_, id, gain, cum) =>
      val best = left.map { case (i, t) =>
        (t.split(" ").filter(_.nonEmpty).toSet.diff(seen).size.toLong, -i)
      }.max
      assert(gain == best._1, s"round pick gain $gain vs ref ${best._1}")
      seen = seen ++ left(id).split(" ").filter(_.nonEmpty).toSet
      left -= id
      assert(cum == seen.size.toLong)
    }
  }

  test("stochastic greedy: picks pass the round-keyed hash gate") {
    val rnd = new scala.util.Random(31)
    val vocab = ('a' to 'z').flatMap(a => ('a' to 'z').map(b => s"$a$b"))
    val rows = (1L to 120L).map(i =>
      (i, Seq.fill(10)(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
    val out = Coverage.stochasticGreedySelect(
      rows.toDF("id", "text"), "id", "text", k = 5, samplePct = 40)
      .collect().map(r => (r.getAs[Long]("round"), r.getAs[Long]("doc_id")))
    assert(out.nonEmpty)
    out.foreach { case (r, id) =>
      val g = ((id * 1000003L + r * 999983L + 17L) % 1000000007L) % 100L
      assert(g < 40, s"round $r picked id $id outside its gate (bucket $g)")
    }
  }

  test("stochastic greedy: coverage within a stated factor of exact greedy") {
    // Mirzasoleiman 2015: expected coverage >= (1 - 1/e - eps) of optimal
    // with eps = exp(-k*pct/100); exact greedy itself is a (1 - 1/e)
    // approximation, so stochastic/exact >= (1 - 1/e - eps) as a loose
    // bound. With k=5, pct=40 -> eps ~ 0.135 -> bound ~ 0.497 of exact.
    // Assert the conservative 0.5 factor on a fixture where random picks
    // genuinely lose (skewed doc sizes + heavy token overlap).
    val rnd = new scala.util.Random(47)
    val vocab = (1 to 800).map(i => s"t$i")
    val rows = (1L to 150L).map { i =>
      val n = if (i % 10 == 0) 60 else 8 // a few broad docs, many narrow
      (i, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val df = rows.toDF("id", "text")
    val exact = Coverage.greedySelect(df, "id", "text", 5)
      .collect().map(_.getAs[Long]("cum_coverage")).max
    val stoch = Coverage.stochasticGreedySelect(df, "id", "text", 5, 40)
      .collect().map(_.getAs[Long]("cum_coverage")).max
    assert(stoch >= (exact * 0.5).toLong,
      s"stochastic coverage $stoch below 0.5x of exact $exact")
  }

  test("stochastic greedy: deterministic under repartitioning") {
    val rnd = new scala.util.Random(53)
    val vocab = (1 to 100).map(i => s"w$i")
    val rows = (1L to 60L).map(i =>
      (i, Seq.fill(7)(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
    val a = Coverage.stochasticGreedySelect(
      rows.toDF("id", "text"), "id", "text", 4, 50).collect().toSeq
    val b = Coverage.stochasticGreedySelect(
      rows.toDF("id", "text").repartition(7), "id", "text", 4, 50)
      .collect().toSeq
    assert(a.map(_.toSeq) == b.map(_.toSeq))
  }
}
