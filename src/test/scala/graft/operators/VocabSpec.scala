package graft.operators

import graft.SparkSpec

/** Vocabulary coverage: hand-checked counts, lexicographic tie-breaks,
  * document frequencies, and the cumulative coverage curve.
  */
class VocabSpec extends SparkSpec {
  import spark.implicits._

  test("ranked counts with doc frequency and cumulative coverage") {
    val docs = Seq((0L, "a a b c"), (1L, "a b b")).toDF("doc_id", "text")
    val out = Vocab.coverage(docs, "doc_id", "text", topN = 10)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[String]("tok"),
        r.getAs[Long]("cnt"), r.getAs[Long]("df"), r.getAs[Double]("cum_frac")))
    assert(out.toSeq == Seq(
      (1L, "a", 3L, 2L, 3.0 / 7),
      (2L, "b", 3L, 2L, 6.0 / 7),
      (3L, "c", 1L, 1L, 1.0)))
  }

  test("topN truncates the tail but coverage still uses the full total") {
    val docs = Seq((0L, "a a b c")).toDF("doc_id", "text")
    val out = Vocab.coverage(docs, "doc_id", "text", topN = 1).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Double]("cum_frac") == 0.5) // 2 of 4 tokens
  }
}
