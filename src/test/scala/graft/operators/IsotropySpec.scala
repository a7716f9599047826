package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Isotropy.topComponentProjections — All-but-the-Top fixed-point
  * pipeline. The q167 oracle proves the full replay against DuckDB;
  * this spec pins a hand-computed case, null handling, and the loud
  * failure modes.
  */
class IsotropySpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed 2-d case: projections match the worked example") {
    // X = (1000,0),(3000,0); m = (2000,0); C = (-1000,0),(1000,0)
    // Q = [[2e6,0],[0,0]]; v after 2 iterations = (1e6, 0)
    // proj = C·v = (-1e9, +1e9)
    val df = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(3.0f, 0.0f)))
      .toDF("id", "vec")
    val got = Isotropy.topComponentProjections(df, "id", "vec")
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> -1000000000L, 2L -> 1000000000L))
  }

  test("null vectors are excluded from the fit and project to null") {
    val df = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(3.0f, 0.0f)),
      (3L, null.asInstanceOf[Seq[Float]])).toDF("id", "vec")
    val got = Isotropy.topComponentProjections(df, "id", "vec")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None
        else Some(r.getLong(1)))).toMap
    // same fit as the 2-row case: the null row must not shift the mean
    assert(got === Map(1L -> Some(-1000000000L), 2L -> Some(1000000000L),
      3L -> None))
  }

  test("empty input yields an empty frame, not an error") {
    val df = Seq.empty[(Long, Seq[Float])].toDF("id", "vec")
    assert(Isotropy.topComponentProjections(df, "id", "vec").count() === 0L)
  }

  test("identical vectors (zero scatter) give all-zero projections") {
    val df = Seq((1L, Seq(0.5f, 0.5f)), (2L, Seq(0.5f, 0.5f))).toDF("id", "vec")
    val got = Isotropy.topComponentProjections(df, "id", "vec")
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 0L, 2L -> 0L))
  }

  test("dimensionality mismatch fails loudly in the scatter pass") {
    val df = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.0f, 3.0f)))
      .toDF("id", "vec")
    val e = intercept[Exception] {
      Isotropy.topComponentProjections(df, "id", "vec").collect()
    }
    assert(e.getMessage != null)
  }

  test("partition layout does not change the result (order independence)") {
    val rows = (0L until 40L).map(i =>
      (i, Seq.tabulate(4)(j => ((i * 7 + j * 3) % 11).toFloat / 11f)))
    val df1 = rows.toDF("id", "vec").repartition(1)
    val df8 = rows.toDF("id", "vec").repartition(8)
    val a = Isotropy.topComponentProjections(df1, "id", "vec")
      .as[(Long, Long)].collect().toMap
    val b = Isotropy.topComponentProjections(df8, "id", "vec")
      .as[(Long, Long)].collect().toMap
    assert(a === b)
    assert(a.values.exists(_ != 0L))
  }
}
