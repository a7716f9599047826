package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {
  import spark.implicits._

  test("raw docs sharing target grams outscore unlike docs per gram") {
    val docs = Seq(
      (0L, "alpha beta alpha beta alpha beta"), // target
      (1L, "alpha beta alpha beta"),            // raw, target-like
      (2L, "gamma delta gamma delta")           // raw, target-unlike
    ).toDF("doc_id", "text")
    val out = Dsir.importanceScores(docs, "doc_id", "text",
        targetPred = col("doc_id") === 0L)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out.keySet == Set(1L, 2L), "only raw docs are scored")
    assert(out(1L) > out(2L),
      s"target-like doc should outscore: ${out(1L)} vs ${out(2L)}")
  }

  test("per-gram contribution is the floored smoothed ratio") {
    // One shared bigram "a b": t=1 (doc 0), r=2 (doc 1 twice).
    // contrib = floor(1000000 * (1+1) / (2+1)) = 666666; doc 1 has
    // exactly 2 grams of that bucket -> imp_score = 2 * 666666.
    val docs = Seq(
      (0L, "a b"),
      (1L, "a b a b") // bigrams: "a b", "b a", "a b" -> but "b a" differs
    ).toDF("doc_id", "text")
    val row = Dsir.importanceScores(docs, "doc_id", "text",
        targetPred = col("doc_id") === 0L)
      .collect()(0)
    // grams of doc 1: "a b"(x2, contrib 666666), "b a"(x1, t=0,r=1 ->
    // floor(1000000*1/2) = 500000)
    assert(row.getLong(1) == 3L)
    assert(row.getLong(2) == 2L * 666666L + 500000L)
  }
}
