package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CalibrateSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Long)], bucketWidth: Long = 1000L) =
    Calibrate.quantileNormalize(
        rows.toDF("g", "v"), "g", "v", bucketWidth)
      .collect().map(r => (r.getAs[String]("g"), r.getAs[Long]("v")) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("p_ppm"),
          r.getAs[Long]("normalized")))).toMap

  /** JVM replay of the pinned contract. */
  private def ref(rows: Seq[(String, Long)]) = {
    val n = rows.size.toLong
    val global = rows.map(_._2).sorted
    rows.groupBy(_._1).flatMap { case (g, rs) =>
      val vals = rs.map(_._2).sorted
      val ng = vals.size.toLong
      vals.distinct.map { v =>
        val cp = vals.count(_ < v).toLong
        val c = vals.count(_ == v).toLong
        val p = ((2 * cp + c + 1) * 1000000L) / (2 * ng)
        val r = math.max(1L, (p * n + 999999L) / 1000000L)
        (g, v) -> ((c, p, global((r - 1).toInt)))
      }
    }.toMap
  }

  test("mapping matches the JVM contract replay on a mixed fixture") {
    val rows = Seq(
      ("a", 1L), ("a", 1L), ("a", 5L), ("a", 9L),
      ("b", 100L), ("b", 200L), ("b", 200L), ("b", 300L), ("b", 400L))
    assert(run(rows) == ref(rows))
  }

  test("a group identical to the global distribution maps to itself") {
    val rows = (1L to 50L).map(("only", _))
    val out = run(rows)
    rows.map(_._2).distinct.foreach { v =>
      assert(out(("only", v))._3 == v, s"v=$v -> ${out(("only", v))}")
    }
  }

  test("after normalization both groups share the global value set") {
    // group a in [0, 100), group b in [1000, 1100) — same shape,
    // disjoint units; normalized values must come from the union and
    // equal quantiles must land on the same normalized value
    val a = (0L until 100L).map(("a", _))
    val b = (0L until 100L).map(i => ("b", 1000L + i))
    val out = run(a ++ b)
    (0L until 100L).foreach { i =>
      assert(out(("a", i))._3 == out(("b", 1000L + i))._3,
        s"quantile-equal values must normalize identically at i=$i")
    }
  }

  test("bucket-width invariance (two-phase seam check)") {
    val rnd = new scala.util.Random(3)
    val rows = (0 until 500).map(_ =>
      (s"g${rnd.nextInt(3)}", rnd.nextInt(200).toLong))
    assert(run(rows, bucketWidth = 1L) == run(rows, bucketWidth = 4096L))
  }

  test("nulls drop; ties take the midrank") {
    val rows = Seq(("a", 7L), ("a", 7L), ("a", 7L))
    val out = run(rows)
    // single distinct value: midrank 2 of 3 -> p = (0*2+3+1)*1e6/(2*3)
    assert(out(("a", 7L))._2 == 666666L)
    assert(out(("a", 7L))._3 == 7L)
  }
}
