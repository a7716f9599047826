package graft.operators

import graft.SparkSpec

class AgreementSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, String, String)]) =
    Agreement.cohenKappa(rows.toDF("g", "a", "b"), "a", "b", Seq("g"))
      .collect().map(r => r.getAs[String]("g") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("po_ppm"),
          r.getAs[Long]("pe_ppm"),
          Option(r.getAs[Any]("kappa_milli")).map(_.asInstanceOf[Long]))))
      .toMap

  test("textbook 2x2: po 0.8 on 50/50 marginals is kappa 0.6 exactly") {
    val rows =
      Seq.fill(40)(("g", "y", "y")) ++ Seq.fill(40)(("g", "n", "n")) ++
        Seq.fill(10)(("g", "y", "n")) ++ Seq.fill(10)(("g", "n", "y"))
    // O = 80, P = 50*50 + 50*50 = 5000: kappa = (8000-5000)/(10000-5000)
    assert(run(rows)("g") == ((100L, 800000L, 500000L, Some(600L))))
  }

  test("perfect, inverted, and chance-only agreement") {
    // perfect: kappa = 1
    assert(run(Seq.fill(7)(("p", "x", "x")) ++ Seq.fill(3)(("p", "z", "z")))("p")
      == ((10L, 1000000L, 580000L, Some(1000L))))
    // systematic swap on balanced marginals: kappa = -600 (the mirror
    // of the textbook case; sign-split truncation exercised)
    val inv =
      Seq.fill(10)(("i", "y", "y")) ++ Seq.fill(10)(("i", "n", "n")) ++
        Seq.fill(40)(("i", "y", "n")) ++ Seq.fill(40)(("i", "n", "y"))
    assert(run(inv)("i")._4 == Some(-600L))
    // constant rater vs mixed rater: chance explains ALL agreement
    val const = Seq.fill(6)(("c", "x", "x")) ++ Seq.fill(4)(("c", "x", "w"))
    assert(run(const)("c")._4 == Some(0L))
    // both raters constant and equal: denominator 0 -> undefined
    assert(run(Seq.fill(5)(("u", "x", "x")))("u")._4 == None)
  }

  test("mismatched alphabets and group isolation") {
    val rows = Seq(("g1", "x", "x"), ("g1", "y", "z"), ("g1", "x", "z"),
      ("g2", "x", "x"), ("g2", "y", "y"))
    val out = run(rows)
    // g1: n=3, O=1, P = rowA(x)=2 * colB(x)=1 = 2 (y/z one-sided)
    // kappa = (3-2)/(9-2) = 1/7 -> 142 milli
    assert(out("g1") == ((3L, 333333L, 222222L, Some(142L))))
    assert(out("g2")._4 == Some(1000L))
  }

  test("null labels drop; repartition-invariant") {
    val rows = Seq(("g", "x", "x"), ("g", null, "x"), ("g", "x", null),
      ("g", "y", "y"))
    assert(run(rows)("g")._1 == 2L)
    val big = (0 until 300).map(i =>
      ("g", s"l${i % 4}", s"l${(i * 7) % 4}"))
    val df = big.toDF("g", "a", "b")
    def once(d: org.apache.spark.sql.DataFrame) =
      Agreement.cohenKappa(d, "a", "b", Seq("g")).collect().toSeq.map(_.toSeq)
    assert(once(df.coalesce(1)) == once(df.repartition(11)))
  }
}
