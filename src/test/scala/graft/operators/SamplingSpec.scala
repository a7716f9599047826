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

  test("apportion: Hamilton hand fixture — sum exact, largest remainders win") {
    // k=10 over weights 5,3,2,1 (W=11): quotas 4.54, 2.72, 1.81, 0.90
    // bases 4,2,1,0 (sum 7) -> 3 leftover slots to remainders 6,8,9,10
    // -> b (8), c (9), d (10) each +1
    val out = Sampling.apportion(
        Seq(("a", 5L), ("b", 3L), ("c", 2L), ("d", 1L)).toDF("k", "w"),
        "k", "w", k = 10L)
      .collect().map(r => r.getAs[String]("k") -> r.getAs[Long]("alloc")).toMap
    assert(out == Map("a" -> 4L, "b" -> 3L, "c" -> 2L, "d" -> 1L))
    assert(out.values.sum == 10L)
  }

  test("apportion: remainder ties break to the smaller key; zero total allocates nothing") {
    // equal weights, k=3 over 4 strata: bases 0 (3//4=0 each... quotas
    // 0.75) -> remainders equal -> first three keys by name get +1
    val out = Sampling.apportion(
        Seq(("w", 1L), ("x", 1L), ("y", 1L), ("z", 1L)).toDF("k", "w"),
        "k", "w", k = 3L)
      .collect().map(r => r.getAs[String]("k") -> r.getAs[Long]("alloc")).toMap
    assert(out == Map("w" -> 1L, "x" -> 1L, "y" -> 1L, "z" -> 0L))
    val zero = Sampling.apportion(
        Seq(("a", 0L), ("b", 0L)).toDF("k", "w"), "k", "w", k = 5L)
      .collect().map(_.getAs[Long]("alloc"))
    assert(zero.forall(_ == 0L))
  }

  test("stratifiedSample: exact total, per-stratum proportional, stable ranks") {
    val rows = (1L to 80L).map(i => ("big", i)) ++
      (101L to 120L).map(i => ("small", i))
    val out = Sampling.stratifiedSample(rows.toDF("g", "id"), "g", "id", k = 10)
      .collect()
    val byG = out.groupBy(_.getAs[String]("g"))
    assert(out.length == 10)
    assert(byG("big").length == 8 && byG("small").length == 2)
    // selected = the 8 smallest priorities of the big stratum
    val want = (1L to 80L).sortBy(id => (pri(id, 1L), id)).take(8).toSet
    assert(byG("big").map(_.getAs[Long]("id")).toSet == want)
    // rn is 1..alloc within each stratum
    assert(byG("big").map(_.getAs[Long]("rn")).sorted.toSeq == (1L to 8L))
  }

  // JVM replica of Sampling.mixedBucket
  private def bucket(k: Long): Long = {
    val p = 1000000007L
    val km = ((k % p) + p) % p
    ((((km * km % p) * 1000003L + km * 12345L + 17L) % p) + p) % p % 1000
  }

  test("mixedBucket matches the JVM replica and de-stripes dense ids") {
    import spark.implicits._
    val ids = (-5L to 400L).toSeq
    val got = ids.toDF("k")
      .select(col("k"), Sampling.mixedBucket(col("k")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ids.foreach(k => assert(got(k) == bucket(k), s"id $k"))
    // the linear house hash leaves ids 0..260 entirely below 800; the
    // mix must not (that is its whole purpose)
    assert((0L to 260L).exists(k => bucket(k) >= 800))
  }

  test("coordinatedJoinAudit: join of samples == sample of the join; naive keeps ~p²") {
    import spark.implicits._
    // orders 0..999, each with 1 + (k % 3) line rows
    val orders = (0L until 1000L).map(k => (k, s"o$k"))
    val lines = orders.flatMap { case (k, _) =>
      (0 to (k % 3).toInt).map(i => (k, i.toLong)) }
    val out = Sampling.coordinatedJoinAudit(
      lines.toDF("lk", "li"), "lk", orders.toDF("ok", "pay"), "ok",
      permille = 100).collect()(0)
    val nJoin = out.getAs[Long]("n_pairs")
    val nCoord = out.getAs[Long]("n_coord")
    assert(nJoin == lines.size.toLong)
    // exact replay: the coordinated join is the true join restricted
    // to the sampled key universe
    val expectCoord = lines.count { case (k, _) => bucket(k) < 100 }
    assert(nCoord == expectCoord.toLong)
    assert(out.getAs[Long]("coord_est") == nCoord * 10)
    // naive: both gates must land -> replay with the second mix
    val expectNaive = lines.count { case (k, _) =>
      bucket(k) < 100 && bucket(bucket(k) + 7919L) < 100 }
    assert(out.getAs[Long]("n_naive") == expectNaive.toLong)
    // the structural point: naive keeps an order of magnitude less
    assert(expectNaive * 5 < expectCoord)
    intercept[IllegalArgumentException] {
      Sampling.coordinatedJoinAudit(
        lines.toDF("lk", "li"), "lk", orders.toDF("ok", "pay"), "ok", 0)
    }
  }
}
