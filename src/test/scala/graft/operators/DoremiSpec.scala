package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DoremiSpec extends SparkSpec {
  import spark.implicits._

  // Two domains: "ref" IS the training slice (zero OOV); "hard" is all
  // out-of-vocabulary bigrams (maximum excess).
  private def fixture = Seq(
    (0L, "a b a b a", "ref"),
    (1L, "a b a b a", "ref"),
    (2L, "x y x y x", "hard")
  ).toDF("doc_id", "text", "source")

  test("hard domain gains weight across iterations, ref keeps the floor") {
    val out = Doremi.domainWeights(fixture,
        fixture.filter(col("source") === "ref"), "doc_id", "text", "source",
        iters = 3)
      .collect().map(r => r.getString(0) ->
        (r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    val (h1, h2, h3) = out("hard")
    val (r1, r2, r3) = out("ref")
    assert(h1 > r1 && h2 > r2 && h3 > r3, s"hard must outweigh ref: $out")
    assert(h1 < h2 && h2 < h3, s"hard weight must grow each step: $out")
    assert(r1 > r2 && r2 > r3, s"ref weight must shrink each step: $out")
    // Uniform floor: ref never drops below smooth div k = 10000/2.
    assert(r3 >= 5000L, s"smoothing floor violated: $r3")
  }

  test("weights replay the exact integer update") {
    // ref: 8 bigrams all in-vocab -> loss 0. hard: 4 bigrams all OOV ->
    // loss 1000000, excess 1000000. w0 = 500000 each.
    // S = 500000*1e6 + 500000*2e6; wprime_hard = 990000*500000*2e6 div S
    //   + 5000; wprime_ref symmetric with 1e6.
    val rows = Doremi.domainWeights(fixture,
        fixture.filter(col("source") === "ref"), "doc_id", "text", "source",
        iters = 1)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    val s1 = 500000L * 1000000L + 500000L * 2000000L
    val expectedRef = 990000L * (500000L * 1000000L) / s1 + 5000L
    val expectedHard = 990000L * (500000L * 2000000L) / s1 + 5000L
    assert(rows("ref") == expectedRef, s"${rows("ref")} != $expectedRef")
    assert(rows("hard") == expectedHard, s"${rows("hard")} != $expectedHard")
  }

  test("zero-token and single-token docs don't break the loss") {
    val docs = Seq(
      (0L, "a b a", "ref"),
      (1L, "", "empty"),
      (2L, "solo", "empty")
    ).toDF("doc_id", "text", "source")
    val out = Doremi.domainWeights(docs,
        docs.filter(col("source") === "ref"), "doc_id", "text", "source",
        iters = 1)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // "" splits to one token -> 0 bigrams; greatest(nb, 1) guards the div.
    assert(out("empty") == 0L, s"empty-domain loss must be 0: $out")
  }
}
