package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Deterministic weighted sampling: the rational-priority formula is
  * hand-checkable, the cut is exactly k per group, and the result is
  * repartition/re-run stable (the whole point of the portable scheme).
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def pri(id: Long, w: Long): Long =
    ((id * 1000003L + 17L) % 1000000007L) / math.max(w, 1L)

  private val rows = (0L until 40L).map(i =>
    (i, if (i % 2 == 0) "a" else "b", (i % 7) * 10L + 1L))
  private val df = rows.toDF("id", "grp", "w")

  test("weightedSample returns the k smallest priorities per group") {
    val got = Sampling.weightedSample(df, Seq("grp"), "id", "w", k = 3)
      .orderBy($"grp", $"rn").collect()
    assert(got.length == 6)
    val expected = rows.groupBy(_._2).view.mapValues { g =>
      g.map { case (id, _, w) => (pri(id, w), id, w) }.sorted.take(3)
    }.toMap
    for (grp <- Seq("a", "b"); (r, i) <-
           got.filter(_.getAs[String]("grp") == grp).zipWithIndex) {
      val (p, id, w) = expected(grp)(i)
      assert(r.getAs[Long]("rn") == i + 1)
      assert(r.getAs[Long]("id") == id, s"grp=$grp rn=${i + 1}")
      assert(r.getAs[Long]("priority") == p)
      assert(r.getAs[Long]("weight") == w)
    }
  }

  test("heavier rows are favored (monotone in weight)") {
    // identical hash stream, one row reweighted 1 -> huge: it must enter
    // the sample (priority collapses toward 0)
    val base = (0L until 100L).map((_, "g", 1L)).toDF("id", "grp", "w")
    val boosted = (0L until 100L)
      .map(i => (i, "g", if (i == 57L) 1000000L else 1L))
      .toDF("id", "grp", "w")
    val without = Sampling.weightedSample(base, Seq("grp"), "id", "w", 5)
      .collect().map(_.getAs[Long]("id")).toSet
    val withBoost = Sampling.weightedSample(boosted, Seq("grp"), "id", "w", 5)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(!without.contains(57L) && withBoost.contains(57L))
  }

  test("repartition does not change the sample") {
    val a = Sampling.weightedSample(df, Seq("grp"), "id", "w", 3)
      .orderBy($"grp", $"rn").collect().toSeq
    val b = Sampling.weightedSample(df.repartition(7, $"id"), Seq("grp"),
        "id", "w", 3)
      .orderBy($"grp", $"rn").collect().toSeq
    assert(a == b)
  }

  test("null ids and weights are excluded; weights clamp to >= 1") {
    val messy = Seq(
      (Some(1L), "g", Some(5L)), (Some(2L), "g", None),
      (None, "g", Some(3L)), (Some(4L), "g", Some(0L)))
      .toDF("id", "grp", "w")
    val got = Sampling.weightedSample(messy, Seq("grp"), "id", "w", 10)
      .orderBy($"rn").collect()
    assert(got.map(_.getAs[Long]("id")).toSet == Set(1L, 4L))
    val r4 = got.find(_.getAs[Long]("id") == 4L).get
    assert(r4.getAs[Long]("priority") == pri(4L, 1L)) // clamped divisor
  }
}
