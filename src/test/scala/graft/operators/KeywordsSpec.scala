package graft.operators

import graft.SparkSpec

class KeywordsSpec extends SparkSpec {
  import spark.implicits._

  private def run(texts: Seq[String], stops: Seq[String], k: Int = 10,
                  maxWords: Int = 6) =
    Keywords.rakeTopK(texts.toDF("text"), "text", stops, k, maxWords)
      .collect().map(r => (r.getAs[String]("phrase"),
        r.getAs[Long]("n_words"), r.getAs[Long]("n_occurrences"),
        r.getAs[Long]("score_ppm"))).toSeq

  test("hand RAKE: degree/frequency scoring, punctuation + stopword delimiters") {
    // phrases: "keyword extraction works" and "keyword alone"
    // keyword: freq 2, deg 5 -> 2.5e6; extraction/works: 3e6; alone: 2e6
    val out = run(Seq("Keyword extraction works. Keyword alone"), Seq("of"))
    assert(out == Seq(
      ("keyword extraction works", 3L, 1L, 8500000L),
      ("keyword alone", 2L, 1L, 4500000L)))
  }

  test("multiword phrases outrank their members; ties break lexicographically") {
    // "deep learning of deep models": both phrases score 4e6 (every
    // word's deg/freq is 2) — tie resolves by phrase string
    val out = run(Seq("deep learning of deep models"), Seq("of"))
    assert(out.map(_._1) == Seq("deep learning", "deep models"))
    assert(out.forall(_._4 == 4000000L))
  }

  test("occurrences count per appearance; maxPhraseWords drops run-ons") {
    val out = run(Seq("big data", "big data", "a b c d e f g"),
      Seq.empty, maxWords = 6)
    // the 7-word run-on is dropped entirely; "big data" occurs twice
    assert(out.map(_._1) == Seq("big data"))
    assert(out.head._3 == 2L)
    // each of big/data: freq 2, deg 4 -> 2e6; phrase = 4e6
    assert(out.head._4 == 4000000L)
  }

  test("case folding and non-alnum splitting") {
    val out = run(Seq("Spark-SQL! spark sql?"), Seq.empty)
    // "Spark-SQL!" tokenizes to spark, sql (hyphen/bang delimit...
    // no wait: '-' is a delimiter, so "spark" and "sql" are SEPARATE
    // single-word phrases; "spark sql" is one 2-word phrase
    val m = out.map(o => o._1 -> o).toMap
    assert(m.contains("spark sql"))
    assert(m("spark")._3 == 1L && m("sql")._3 == 1L)
    // spark: freq 3 (two singles? no: spark appears in "spark",
    // "spark sql" -> freq 2... plus the hyphen-split "sql" single.
    // tokens: [spark][sql] (split by -), then [spark sql] (one phrase)
    // spark: freq 2, deg 3; sql: freq 2, deg 3 -> ws 1.5e6 each
    assert(m("spark")._4 == 1500000L)
    assert(m("spark sql")._4 == 3000000L)
  }
}
