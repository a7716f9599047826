package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, timestamp_micros}

class SeqPatternsSpec extends SparkSpec {
  import spark.implicits._

  private val min = 60000000L
  // A: a@0, b@10m, a@70m, c@200m  — a→b in 10m; b→a at EXACTLY 60m
  //    (inclusive boundary); a→c best gap 130m (out)
  // B: b@0, a@5m, c@50m           — b→a, b→c, a→c (45m)
  // C: a@0                        — antecedent support only
  // D: a@0, b@0 (simultaneous)    — must chain NEITHER direction
  private def fixture = Seq(
    ("A", 0L, "a"), ("A", 10 * min, "b"), ("A", 70 * min, "a"),
    ("A", 200 * min, "c"),
    ("B", 0L, "b"), ("B", 5 * min, "a"), ("B", 50 * min, "c"),
    ("C", 0L, "a"),
    ("D", 0L, "a"), ("D", 0L, "b"),
    ("D", 30 * min, "zzz")) // outside the alphabet: ignored entirely
    .toDF("u", "us", "t")
    .withColumn("ts", timestamp_micros(col("us")))

  private def run(minSupport: Long = 1L) =
    SeqPatterns.level2(fixture, "u", "ts", "t", Seq("a", "b", "c"),
        maxGapMinutes = 60L, minSupport = minSupport)
      .collect().map(r => (r.getAs[String]("antecedent"),
        r.getAs[String]("consequent")) ->
        ((r.getAs[Long]("n_entities"), r.getAs[Long]("n_ante"),
          r.getAs[Long]("n_cons"), r.getAs[Long]("support_ppm"),
          r.getAs[Long]("confidence_ppm"), r.getAs[Long]("lift_ppm"))))
      .toMap

  test("hand-checked supports, gap boundary inclusive, simultaneous events never chain") {
    val out = run()
    // N = 4 entities; ante supports: a=4 (A,B,C,D), b=3 (A,B,D), c=2
    assert(out.keySet == Set(("a", "b"), ("a", "c"), ("b", "a"), ("b", "c")))
    // b→a: A (exactly 60m, inclusive) + B; D's same-ts pair must NOT count
    assert(out(("b", "a")) == ((2L, 3L, 4L, 500000L, 666666L, 666666L)))
    // a→b: only A (D simultaneous, B's b precedes its a)
    assert(out(("a", "b")) == ((1L, 4L, 3L, 250000L, 250000L, 333333L)))
    // a→c: only B (A's best a→c gap is 130m > 60m)
    assert(out(("a", "c")) == ((1L, 4L, 2L, 250000L, 250000L, 500000L)))
    assert(out(("b", "c")) == ((1L, 3L, 2L, 250000L, 333333L, 666666L)))
  }

  test("minSupport gates the output rows") {
    assert(run(minSupport = 2L).keySet == Set(("b", "a")))
  }

  test("repartition-invariant") {
    def m(d: org.apache.spark.sql.DataFrame) =
      SeqPatterns.level2(d, "u", "ts", "t", Seq("a", "b", "c"), 60L)
        .collect().map(r => (r.getString(0), r.getString(1),
          r.getAs[Long]("n_entities"))).sorted.toSeq
    assert(m(fixture.coalesce(1)) == m(fixture.repartition(7)))
  }

  test("empty corpus yields no rows, not a crash") {
    val empty = Seq.empty[(String, Long, String)].toDF("u", "us", "t")
      .withColumn("ts", timestamp_micros(col("us")))
    assert(SeqPatterns.level2(empty, "u", "ts", "t", Seq("a", "b"), 60L)
      .collect().isEmpty)
  }
}
