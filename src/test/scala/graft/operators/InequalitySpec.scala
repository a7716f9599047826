package graft.operators

import graft.SparkSpec

class InequalitySpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Long)], bucketWidth: Long = 1000L) =
    Inequality.giniByGroup(rows.toDF("g", "v"), "g", "v", bucketWidth)
      .collect().map(r => r.getAs[String]("g") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("total"),
          Option(r.getAs[Any]("gini_ppm")).map(_.asInstanceOf[Long]))))
      .toMap

  test("equal values give 0; extreme concentration approaches (n-1)/n") {
    val rows = Seq.fill(10)(("flat", 7L)) ++
      (Seq.fill(9)(("spike", 0L)) :+ ("spike", 100L))
    val out = run(rows)
    assert(out("flat") == ((10L, 70L, Some(0L))))
    // one row holds everything: G = (n-1)/n = 0.9
    assert(out("spike") == ((10L, 100L, Some(900000L))))
  }

  test("textbook fixture: values 1..5 -> G = 4/15") {
    // S2 = 2*(1+4+9+16+25)=110; (n+1)T=90; nT=75 -> 20/75 = 4/15
    val out = run((1L to 5L).map(("a", _)))
    assert(out("a") == ((5L, 15L, Some(266666L))))
  }

  test("ties are interchangeable: grouped-count path equals expanded path") {
    val expanded = Seq.fill(6)(("a", 2L)) ++ Seq.fill(3)(("a", 10L))
    // reference via direct rank formula on the sorted expansion
    val xs = expanded.map(_._2).sorted
    val n = xs.size.toLong
    val t = xs.sum
    val s2 = 2L * xs.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
    val ref = (s2 - (n + 1) * t) * 1000000L / (n * t)
    assert(run(expanded)("a")._3 == Some(ref))
  }

  test("zero-total and negative handling") {
    val out = run(Seq(("z", 0L), ("z", 0L), ("m", -5L), ("m", 3L)))
    assert(out("z") == ((2L, 0L, None)))
    assert(out("m") == ((1L, 3L, Some(0L)))) // negative row filtered
  }

  test("bucketWidth never changes the result (two-phase seam)") {
    val rows = (1L to 300L).map(i => ("a", i * 7919L % 513L))
    assert(run(rows, 1L) == run(rows, 1000000L))
  }
}
