package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Null inputs must degrade gracefully in the round-4 text/vector ops —
  * zero-stat rows or dropped rows, never exceptions or poisoned
  * aggregates (the corpus tables have no nulls, but library callers'
  * tables will).
  */
class NullSafetySpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq((0L, Some("a b c d e f")), (1L, None))
    .toDF("doc_id", "text")

  test("boilerplateStats: null text yields a zero-stats row") {
    val out = Dedup.boilerplateStats(docs, "doc_id", "text", k = 3, minDocs = 2)
      .orderBy("doc_id").collect()
    assert(out.length == 2)
    assert(out(1).getAs[Long]("n_phrases") == 0L)
    assert(out(1).getAs[Double]("boiler_frac") == 0.0)
  }

  test("bigramScores: null text yields a zero-score row") {
    val out = LmScore.bigramScores(docs, docs.filter(col("doc_id") === 0L),
        "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.length == 2)
    assert(out(1).getAs[Long]("n_bigrams") == 0L)
    assert(out(1).getAs[Long]("avg_score") == 0L)
  }

  test("cdcChunks: null text drops the document, others unaffected") {
    val out = Dedup.cdcChunks(docs, "doc_id", "text", w = 3, divisor = 4L)
      .collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Long]("doc_id") == 0L))
  }

  test("vocab coverage: null text contributes no tokens") {
    val out = Vocab.coverage(docs, "doc_id", "text", topN = 100).collect()
    assert(out.length == 6) // a..f from doc 0 only
    assert(out.map(_.getAs[Long]("cnt")).sum == 6L)
  }

  test("kmeansFixed: a null vector gets a null cell, not an exception") {
    val vecs = Seq((0L, Some(Seq(0.0f, 0.0f))), (1L, Some(Seq(1.0f, 1.0f))),
      (2L, None)).toDF("id", "vec")
    val out = Clustering.kmeansFixed(vecs, "id", "vec", k = 2, iters = 1)
      .orderBy("id").collect()
    assert(out.length == 3)
    assert(!out(0).isNullAt(1) && !out(1).isNullAt(1))
    assert(out(2).isNullAt(1))
  }
}
