package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SnapshotSpec extends SparkSpec {

  test("diff classifies added/removed/changed/unchanged") {
    import spark.implicits._
    val old = Seq((1L, "h1"), (2L, "h2"), (3L, "h3")).toDF("id", "fp")
    val cur = Seq((2L, "h2"), (3L, "hX"), (4L, "h4")).toDF("id", "fp")
    val got = Snapshot.diff(old, cur, "id", "fp")
      .select(col("id"), col("status")).as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("diff output carries both fingerprints for changed rows") {
    import spark.implicits._
    val old = Seq((5L, "a")).toDF("id", "fp")
    val cur = Seq((5L, "b")).toDF("id", "fp")
    val r = Snapshot.diff(old, cur, "id", "fp").collect()(0)
    assert(r.getAs[String]("old_fp") == "a" && r.getAs[String]("new_fp") == "b")
  }

  test("empty old snapshot marks everything added") {
    import spark.implicits._
    val old = Seq.empty[(Long, String)].toDF("id", "fp")
    val cur = Seq((1L, "x"), (2L, "y")).toDF("id", "fp")
    val statuses = Snapshot.diff(old, cur, "id", "fp")
      .select(col("status")).as[String].collect().toSet
    assert(statuses == Set("added"))
  }

  test("tokenDrift reports exact ppm movers and the total L1 drift") {
    import spark.implicits._
    // old: a a b b (4 toks) -> a,b at 500000 ppm each.
    // new: a b b c (4 toks) -> a 250000, b 500000, c 250000.
    val old = Seq("a a b b").toDF("text")
    val cur = Seq("a b b c").toDF("text")
    val rows = Snapshot.tokenDrift(old, cur, "text", topK = 10).collect()
    val byTok = rows.map(r => r.getAs[String]("tok") ->
      (r.getAs[Long]("ppm_old"), r.getAs[Long]("ppm_new"),
        r.getAs[Long]("ppm_diff"))).toMap
    assert(byTok("a") == ((500000L, 250000L, -250000L)))
    assert(byTok("b") == ((500000L, 500000L, 0L)))
    assert(byTok("c") == ((0L, 250000L, 250000L)))
    // L1 over all tokens = 250000 + 0 + 250000, carried on every row.
    assert(rows.forall(_.getAs[Long]("l1_drift_ppm") == 500000L))
  }

  test("tokenDrift topK cut keeps the largest movers with deterministic ties") {
    import spark.implicits._
    val old = Seq("x x x x y z").toDF("text")
    val cur = Seq("y y y y x z").toDF("text")
    val toks = Snapshot.tokenDrift(old, cur, "text", topK = 2)
      .collect().map(_.getAs[String]("tok")).toSet
    assert(toks == Set("x", "y"), s"got $toks") // z is the zero-mover
  }

  private def refKs(as: Seq[Long], bs: Seq[Long]): (BigInt, Long) = {
    val vs = (as ++ bs).distinct.sorted
    val (na, nb) = (BigInt(as.length), BigInt(bs.length))
    vs.map { v =>
      val ca = BigInt(as.count(_ <= v))
      val cb = BigInt(bs.count(_ <= v))
      ((ca * nb - cb * na).abs, v)
    }.maxBy { case (d, v) => (d, -v) } // max diff, tie to the SMALLEST v
  }

  test("ksDrift: hand-computed statistic, argmax value, exact ppm") {
    import spark.implicits._
    // A = {1,2,3,4}, B = {3,4,5,6}: max gap at v=2 (cumA=2, cumB=0)
    val df = (Seq(1L, 2L, 3L, 4L).map(("a", _)) ++
      Seq(3L, 4L, 5L, 6L).map(("b", _)) ++
      Seq(("c", 99L))) // third group must be ignored
      .toDF("g", "v")
    val r = Snapshot.ksDrift(df, "v", "g", "a", "b", bucketWidth = 2L)
      .collect()(0)
    assert(r.getAs[Long]("n_a") == 4L && r.getAs[Long]("n_b") == 4L)
    // D = |2*4 - 0*4| / 16 = 0.5 -> 500000 ppm, at v = 2
    assert(r.getAs[Long]("ks_ppm") == 500000L)
    assert(r.getAs[Long]("at_value") == 2L)
  }

  test("ksDrift: random parity with the scalar reference across bucket widths") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val as = Seq.fill(300)(rnd.nextInt(50).toLong)
    val bs = Seq.fill(200)((rnd.nextInt(50) + rnd.nextInt(10)).toLong)
    val df = (as.map(("a", _)) ++ bs.map(("b", _))).toDF("g", "v")
    val (refD, refV) = refKs(as, bs)
    val refPpm = (refD * 1000000 / (BigInt(300) * 200)).toLong
    for (w <- Seq(1L, 7L, 1000L)) {
      val r = Snapshot.ksDrift(df, "v", "g", "a", "b", bucketWidth = w)
        .collect()(0)
      assert(r.getAs[Long]("ks_ppm") == refPpm, s"width $w")
      assert(r.getAs[Long]("at_value") == refV, s"width $w")
    }
  }
}
