package graft.operators

import graft.SparkSpec

class FeaturesSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Boolean, Long)], bucketWidth: Long = 1000L) =
    Features.bestSplit(rows.toDF("y", "f"), "y", Seq("f"), bucketWidth)
      .collect().map(r => (Option(r.getAs[java.lang.Long]("threshold"))
        .map(_.longValue()),
        r.getAs[Long]("split_ppm"), r.getAs[Long]("base_ppm"),
        r.getAs[Long]("gain_ppm"), r.getAs[Long]("n"))).head

  test("perfectly separable feature: split impurity 0, full gain") {
    // y = (f > 10): threshold 10 separates exactly
    val rows = (1L to 10L).map((false, _)) ++ (11L to 20L).map((true, _))
    val (th, split, base, gain, n) = run(rows)
    assert(th == Some(10L))
    assert(split == 0L)
    assert(base == 500000L) // 2 * 10 * 10 * 1e6 / 400
    assert(gain == 500000L && n == 20L)
  }

  test("uninformative feature: best split gains nothing; ties to smallest v") {
    // y flips per group of 4, f cycles within the group -> every f
    // value is exactly half positive, so every split leaves 50/50
    val rows = (0L until 40L).map(i => ((i / 4) % 2 == 0, i % 4))
    val (th, split, base, gain, _) = run(rows)
    assert(base == 500000L)
    assert(split == 500000L && gain == 0L)
    assert(th == Some(0L))
  }

  test("exact weighted-impurity arithmetic on a hand split") {
    val rows = Seq((true, 0L), (true, 1L), (true, 1L), (false, 0L),
      (true, 5L), (false, 5L), (false, 6L), (false, 7L))
    val (th, split, base, gain, _) = run(rows)
    // best is v=5: L(n=6, pos=4) -> 2*4*2*1e6/(6*8) = 333333;
    // R(n=2, pos=0) -> 0; total 333333 (v=1 gives 375000, v=0 500000)
    assert(th == Some(5L) && split == 333333L)
    assert(base == 500000L) // 2*4*4*1e6/64
    assert(gain == 166667L)
  }

  test("single-valued feature: no split exists, threshold null") {
    val rows = Seq((true, 5L), (false, 5L), (true, 5L))
    val (th, split, base, gain, n) = run(rows)
    assert(th == None && split == base && gain == 0L && n == 3L)
  }

  test("bucket-width invariance across the two-phase seam") {
    val rnd = new scala.util.Random(9)
    val rows = (0 until 300).map(_ =>
      (rnd.nextBoolean(), rnd.nextInt(50).toLong))
    assert(run(rows, bucketWidth = 1L) == run(rows, bucketWidth = 4096L))
  }
}
