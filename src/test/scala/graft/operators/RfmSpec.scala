package graft.operators

import graft.SparkSpec

class RfmSpec extends SparkSpec {
  import spark.implicits._

  private val hourMs = 3600L * 1000L
  private def ts(msBack: Long) =
    new java.sql.Timestamp(1000L * hourMs - msBack)

  test("hand census: quintile counting per dimension, degenerate f collapses to 5") {
    // user i (1..10): one event, last ts = anchor - (i-1)h, value = i
    // dollars. recency thresholds over {0..9}h = 1,3,5,7h; m thresholds
    // over {100..1000}c = 200,400,600,800; f is CONSTANT 1 — all four
    // thresholds equal 1, so every user scores f = 5 (the
    // duplicate-threshold counting rule)
    val rows = (1 to 10).map(i =>
      (i.toLong, ts((i - 1).toLong * hourMs), i.toDouble))
    val out = Rfm.rfmCensus(rows.toDF("u", "ts", "v"), "u", "ts", "v")
      .collect().map(r => (r.getAs[Long]("r_score"),
        r.getAs[Long]("f_score"), r.getAs[Long]("m_score")) ->
        ((r.getAs[Long]("n_users"), r.getAs[Long]("sum_cents")))).toMap
    assert(out.values.map(_._1).sum == 10L)
    assert(out.keys.forall(_._2 == 5L)) // degenerate f
    // freshest user (r=0) scores r=5 and m=100c -> m_score 1
    assert(out((5L, 5L, 1L)) == ((1L, 100L)))
    // the three stalest users (r >= 7h) score r=1; their m = 8,9,10$
    assert(out((1L, 5L, 5L)) == ((3L, 2700L)))
    // middle band: users 4,5 (r 3h,4h -> r_score 3; m 400,500 -> 3)
    assert(out((3L, 5L, 3L)) == ((2L, 900L)))
  }

  test("monotonicity: more value can never lower a score; scores stay in [1,5]") {
    val rng = new scala.util.Random(3)
    val rows = (1L to 60L).map { u =>
      (u, ts(rng.nextInt(100).toLong * hourMs),
        (1 + rng.nextInt(50)).toDouble)
    }
    val users = rows.toDF("u", "ts", "v")
    val census = Rfm.rfmCensus(users, "u", "ts", "v").collect()
    census.foreach { r =>
      Seq("r_score", "f_score", "m_score").foreach { c =>
        val v = r.getAs[Long](c)
        assert(v >= 1L && v <= 5L, s"$c out of range: $v")
      }
    }
    assert(census.map(_.getAs[Long]("n_users")).sum == 60L)
  }
}
