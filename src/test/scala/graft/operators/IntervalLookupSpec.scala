package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IntervalLookupSpec extends SparkSpec {
  import spark.implicits._

  private val dim = Seq(
    (0L, 10L, "a"), (10L, 20L, "b"), (50L, 60L, "c"))
    .toDF("lo", "hi", "tag")

  test("intervalLookup: boundary semantics [lo, hi), gaps, and misses") {
    val fact = Seq(-5L, 0L, 9L, 10L, 19L, 20L, 49L, 50L, 59L, 60L, 100L)
      .toDF("v")
    val out = Joins.intervalLookup(fact, col("v"), dim, "lo", "hi")
      .collect().map(r => r.getAs[Long]("v") ->
        Option(r.getAs[String]("tag"))).toMap
    assert(out == Map(
      -5L -> None, 0L -> Some("a"), 9L -> Some("a"),
      10L -> Some("b"), 19L -> Some("b"), 20L -> None,
      49L -> None, 50L -> Some("c"), 59L -> Some("c"),
      60L -> None, 100L -> None))
  }

  test("intervalLookup: parity with the naive theta join on random data") {
    val rnd = new scala.util.Random(7)
    val iv = (0 until 50).map(i => (i * 100L, i * 100L + 37L, i.toLong))
    val dimBig = iv.toDF("lo", "hi", "band")
    val fact = (1 to 2000).map(_ => rnd.nextLong() % 6000L).toDF("v")
    val fast = Joins.intervalLookup(fact, col("v"), dimBig, "lo", "hi")
      .select(col("v"), col("band"))
      .collect().map(r => (r.getLong(0), Option(r.get(1)).map(_.toString))).sortBy(x => (x._1, x._2)).toSeq
    val naive = fact.join(dimBig,
        col("v") >= col("lo") && col("v") < col("hi"), "left")
      .select(col("v"), col("band"))
      .collect().map(r => (r.getLong(0), Option(r.get(1)).map(_.toString))).sortBy(x => (x._1, x._2)).toSeq
    assert(fast == naive)
  }

  test("q221 bracket ids: a heavy mode collapsing deciles skips ids " +
      "identically to the oracle's threshold-count semantics") {
    // Heavy-mode fixture: value 100 occupies >30% of the data, so
    // several PERCENTILE_DISC deciles coincide at 100. The q221 rule:
    // bracket id of a row = how many of the NINE (duplicate-preserving)
    // thresholds are <= its value (the oracle's CASE-sum), while the
    // interval dim dedups threshold VALUES (zero-width [t, t) intervals
    // are rejected by intervalLookup) but keeps the counting ids.
    val vals: Seq[Long] =
      (1L to 30L) ++ Seq.fill(40)(100L) ++ (201L to 230L)
    val df = vals.toDF("pc")
    val thresholds = Percentiles.percentileDisc(
        df.select(lit(0).as("g"), col("pc").as("v")), "g", "v",
        (1 to 9).map(_ / 10.0))
      .orderBy(col("p")).collect()
      .map(_.getAs[Number]("value").longValue())
    assert(thresholds.distinct.length < 9,
      s"fixture must collapse deciles: $thresholds")
    val bounds = thresholds.distinct
    val los = (Long.MinValue + 1L) +: bounds
    val his = bounds :+ Long.MaxValue
    val ids = 0L +: bounds.map(t => thresholds.count(_ <= t).toLong)
    val dimQ = los.zip(his).zip(ids)
      .map { case ((lo, hi), i) => (lo, hi, i) }
      .toSeq.toDF("lo", "hi", "bracket")
    val got = Joins.intervalLookup(df, col("pc"), dimQ, "lo", "hi")
      .collect().map(r =>
        r.getAs[Long]("pc") -> r.getAs[Long]("bracket"))
    // oracle semantics, replayed in the JVM: CASE-sum over all nine
    got.foreach { case (pc, b) =>
      val want = thresholds.count(_ <= pc).toLong
      assert(b == want, s"pc=$pc bracket=$b want=$want")
    }
    // collapsed ids must SKIP (e.g. ... -> 7) rather than renumber
    val usedIds = got.map(_._2).distinct.sorted.toSeq
    assert(usedIds == ids.distinct.sorted.toSeq &&
      usedIds.length < 10 && usedIds.max == 9L,
      s"ids must skip collapsed brackets: $usedIds")
  }

  test("intervalLookup: loud validation of overlap, emptiness, and cap") {
    val fact = Seq(1L).toDF("v")
    val overlap = Seq((0L, 10L, "a"), (5L, 15L, "b")).toDF("lo", "hi", "t")
    assert(intercept[IllegalArgumentException] {
      Joins.intervalLookup(fact, col("v"), overlap, "lo", "hi")
    }.getMessage.contains("overlap"))
    val empty = Seq((10L, 10L, "a")).toDF("lo", "hi", "t")
    assert(intercept[IllegalArgumentException] {
      Joins.intervalLookup(fact, col("v"), empty, "lo", "hi")
    }.getMessage.contains("interval"))
    assert(intercept[IllegalArgumentException] {
      Joins.intervalLookup(fact, col("v"), dim, "lo", "hi", maxIntervals = 2)
    }.getMessage.contains("cap"))
  }
}
