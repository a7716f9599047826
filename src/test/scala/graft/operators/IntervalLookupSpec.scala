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
