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

  test("fitModel + scoreAgainst reproduces the fused op exactly") {
    val docs = Seq(
      (0L, "alpha beta alpha beta alpha beta"),
      (1L, "alpha beta alpha beta"),
      (2L, "gamma delta gamma delta"),
      (3L, "alpha gamma beta delta epsilon zeta")
    ).toDF("doc_id", "text")
    val pred = col("doc_id") === 0L
    val fused = Dsir.importanceScores(docs, "doc_id", "text", pred)
      .orderBy("doc_id").collect().toSeq
    val model = Dsir.fitModel(docs, "doc_id", "text", pred)
    val split = Dsir.scoreAgainst(model, docs.filter(!pred), "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(split == fused)
  }

  test("scoreAgainst: model-unseen buckets smooth to the add-1 value") {
    // model fit on a/b only; "zz yy" grams hit no model bucket -> each
    // gram contributes scale = 1e6
    val hist = Seq((0L, "a b"), (1L, "a b")).toDF("doc_id", "text")
    val model = Dsir.fitModel(hist, "doc_id", "text", col("doc_id") === 0L)
    val fresh = Seq((10L, "zz yy xx")).toDF("doc_id", "text")
    val row = Dsir.scoreAgainst(model, fresh, "doc_id", "text").collect()(0)
    assert(row.getLong(1) == 2L && row.getLong(2) == 2000000L)
  }
}
