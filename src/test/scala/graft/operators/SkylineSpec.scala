package graft.operators

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, Long)], bucketWidth: Long = 1000L) =
    Skyline.frontier2D(rows.toDF("x", "y"), "x", "y", bucketWidth)
      .collect().map(r => (r.getAs[Long]("x"), r.getAs[Long]("y"),
        r.getAs[Long]("n_points"))).toSet

  /** Quadratic reference: distinct points no other point dominates. */
  private def brute(rows: Seq[(Long, Long)]): Set[(Long, Long, Long)] = {
    val pts = rows.groupBy(identity).map { case (p, g) => (p._1, p._2, g.size.toLong) }
    pts.filter { case (x, y, _) =>
      !pts.exists { case (x2, y2, _) =>
        x2 >= x && y2 >= y && (x2 > x || y2 > y) }
    }.toSet
  }

  test("hand fixture: staircase frontier, dominated points dropped") {
    val rows = Seq((1L, 9L), (5L, 5L), (9L, 1L), // frontier staircase
      (1L, 8L), (4L, 4L), (0L, 0L), // dominated
      (5L, 5L)) // duplicate frontier point
    assert(run(rows) == Set((1L, 9L, 1L), (5L, 5L, 2L), (9L, 1L, 1L)))
  }

  test("equal-y steps survive at distinct x; same-x loses to larger y") {
    val rows = Seq((1L, 7L), (2L, 7L), (2L, 3L))
    // (1,7) is dominated by (2,7): x strict, y equal
    assert(run(rows) == Set((2L, 7L, 1L)))
  }

  test("property: matches the quadratic reference on random point sets") {
    val gen = Gen.listOfN(60,
      Gen.zip(Gen.choose(-50L, 50L), Gen.choose(-50L, 50L)))
    val cases = (0 until 8).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(42L + i)))
    cases.foreach { pts =>
      assert(run(pts, bucketWidth = 7L) == brute(pts))
    }
  }

  test("bucketWidth never changes the frontier (two-phase seam)") {
    val rows = (1L to 100L).map(i => (i * 13L % 97L, i * 29L % 89L))
    assert(run(rows, 1L) == run(rows, 1000000L))
  }
}
