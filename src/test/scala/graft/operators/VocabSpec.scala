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

  test("frequencySpectrum: hand census — hapax mass is N1/N; tail buckets collapse") {
    import org.apache.spark.sql.functions.col
    // counts: a=1, b=1, c=2, d=3, e=5 -> spectrum r1:2 types/2 tokens,
    // r2:1/2, r3:1/3, r5:1/5; totals 5 types / 12 tokens
    val docs = Seq((0L, "a c d e e"), (1L, "b c d e e"), (2L, "d e"))
      .toDF("doc_id", "text")
    val out = Vocab.frequencySpectrum(docs, "text", maxR = 10)
      .collect().map(r => r.getAs[Long]("r_bucket") ->
        ((r.getAs[Long]("n_types"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("type_share_ppm"),
          r.getAs[Long]("token_share_ppm")))).toMap
    assert(out(1L) == ((2L, 2L, 400000L, 166666L))) // Good-Turing N1/N
    assert(out(2L) == ((1L, 2L, 200000L, 166666L)))
    assert(out(3L) == ((1L, 3L, 200000L, 250000L)))
    assert(out(5L) == ((1L, 5L, 200000L, 416666L)))
    assert(out.keySet == Set(1L, 2L, 3L, 5L))
    // maxR = 2: r >= 3 collapses into bucket 3
    val tail = Vocab.frequencySpectrum(docs, "text", maxR = 2)
      .collect().map(r => r.getAs[Long]("r_bucket") ->
        ((r.getAs[Long]("n_types"), r.getAs[Long]("n_tokens")))).toMap
    assert(tail(3L) == ((2L, 8L))) // d(3) + e(5)
    // empty tokens and null docs drop
    val messy = Seq((0L, "x  x"), (1L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val m = Vocab.frequencySpectrum(messy, "text").collect()
    assert(m.length == 1 &&
      m.head.getAs[Long]("r_bucket") == 2L &&
      m.head.getAs[Long]("n_types") == 1L)
  }

  test("frequencySpectrum n-grams: sliding windows, short docs drop") {
    import org.apache.spark.sql.functions.col
    // bigrams of "a b c a b c": (a b)x2, (b c)x2, (c a)x1
    val docs = Seq((0L, "a b c a b c"), (1L, "z")) // 1 word: no bigram
      .toDF("doc_id", "text")
    val out = Vocab.frequencySpectrum(docs, "text", n = 2)
      .collect().map(r => r.getAs[Long]("r_bucket") ->
        ((r.getAs[Long]("n_types"), r.getAs[Long]("n_tokens")))).toMap
    assert(out == Map(1L -> ((1L, 1L)), 2L -> ((2L, 4L))))
    // double spaces do not create phantom grams
    val spaced = Seq((0L, "a  b a b")).toDF("doc_id", "text")
    val sp = Vocab.frequencySpectrum(spaced, "text", n = 2)
      .collect().map(r => r.getAs[Long]("r_bucket") ->
        r.getAs[Long]("n_types")).toMap
    // grams: (a b)x2, (b a)x1
    assert(sp == Map(1L -> 1L, 2L -> 1L))
  }
}
