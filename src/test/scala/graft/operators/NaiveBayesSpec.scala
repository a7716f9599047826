package graft.operators

import graft.SparkSpec

class NaiveBayesSpec extends SparkSpec {
  import spark.implicits._

  // (id, label, f1, f2) — ids dense so the 800-permille hash split
  // leaves a real holdout
  private def fixture: Seq[(Long, Boolean, Long, Long)] =
    (0L until 400L).map { id =>
      val f1 = id % 5
      val f2 = (id / 3) % 4
      // label correlates with f1 (strong) and f2 (weak), plus a
      // deterministic minority flip so no class is pure
      val label = (f1 >= 3) ^ (id % 17 == 0)
      (id, label, f1, f2)
    }

  // Sampling.mixedBucket replica (the de-striped gate; q291 lesson)
  private def isTrain(id: Long): Boolean = {
    val p = 1000000007L
    val km = ((id % p) + p) % p
    ((((km * km % p) * 1000003L + km * 12345L + 17L) % p) + p) % p % 1000 < 800
  }

  test("confusion matrix matches an exact BigInt reference") {
    val rows = fixture
    val (train, eval) = rows.partition(r => isTrain(r._1))
    val n1 = BigInt(train.count(_._2))
    val n0 = BigInt(train.size) - n1
    def tab(f: ((Long, Boolean, Long, Long)) => Long) = {
      val m = train.groupBy(f).map { case (v, rs) =>
        v -> ((BigInt(rs.count(_._2)), BigInt(rs.count(!_._2)))) }
      (m, BigInt(m.size))
    }
    val (t1, v1) = tab(_._3)
    val (t2, v2) = tab(_._4)
    val expected = eval.map { case (_, y, f1, f2) =>
      val (c11, c01) = t1.getOrElse(f1, (BigInt(0), BigInt(0)))
      val (c12, c02) = t2.getOrElse(f2, (BigInt(0), BigInt(0)))
      val lhs = n1 * (c11 + 1) * (n0 + v1) * (c12 + 1) * (n0 + v2)
      val rhs = n0 * (c01 + 1) * (n1 + v1) * (c02 + 1) * (n1 + v2)
      (y, lhs > rhs)
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val total = expected.values.sum
    val out = NaiveBayes.confusionGate(
      rows.toDF("id", "y", "f1", "f2"), "id", "y", Seq("f1", "f2"))
      .collect().map(r => (r.getAs[Boolean]("actual"),
        r.getAs[Boolean]("predicted")) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("share_ppm")))).toMap
    assert(out.keySet == expected.keySet)
    expected.foreach { case (k, n) =>
      assert(out(k) == ((n, n * 1000000L / total)), s"cell $k")
    }
    // the fixture must actually exercise both predicted classes
    assert(out.keySet.map(_._2) == Set(true, false))
  }

  test("an eval-only feature value scores through Laplace, not a crash") {
    // pick an eval-side id under the mixedBucket gate and give it an
    // f1 never seen in train
    val evalId = (0L until 400L).find(id => !isTrain(id)).get
    val rows = fixture.map(r => if (r._1 == evalId) r.copy(_3 = 99L) else r)
    val out = NaiveBayes.confusionGate(
      rows.toDF("id", "y", "f1", "f2"), "id", "y", Seq("f1", "f2"))
      .collect()
    assert(out.map(_.getAs[Long]("n")).sum ==
      fixture.count(r => !isTrain(r._1)))
  }

  test("single-class train split fails loudly") {
    // 400 dense ids so the mixedBucket eval side is non-empty — with
    // an empty eval side AQE's empty-relation propagation would skip
    // the priors broadcast and the check could never evaluate
    val rows = (0L until 400L).map(id => (id, true, id % 3, id % 2))
    val e = intercept[Exception] {
      NaiveBayes.confusionGate(
        rows.toDF("id", "y", "f1", "f2"), "id", "y", Seq("f1", "f2"))
        .collect()
    }
    assert(e.getMessage != null)
  }

  test("repartition-invariant") {
    val df = fixture.toDF("id", "y", "f1", "f2")
    def run(d: org.apache.spark.sql.DataFrame) =
      NaiveBayes.confusionGate(d, "id", "y", Seq("f1", "f2"))
        .collect().map(r => (r.getAs[Boolean]("actual"),
          r.getAs[Boolean]("predicted"), r.getAs[Long]("n"))).sorted.toSeq
    assert(run(df.coalesce(1)) == run(df.repartition(13)))
  }
}
