package graft.operators

import graft.SparkSpec

/** Bigram LM scoring: hand-computed Laplace-smoothed integer scores on a
  * tiny corpus, OOV accounting, and the short-document zero path.
  */
class LmScoreSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed scores, OOV counts, and short-doc zeros") {
    // Train: "a b a b c" -> bigrams ab, ba, ab, bc
    //   cb: (a,b)=2 (b,a)=1 (b,c)=1 ; cu: a->2, b->2 ; V = 3 (a,b,c)
    val train = Seq((100L, "a b a b c")).toDF("id", "text")
    val corpus = Seq(
      (0L, "a b c"),   // (a,b): (2+1)*1e6 div (2+3) = 600000
                       // (b,c): (1+1)*1e6 div (2+3) = 400000
      (1L, "c a"),     // (c,a): OOV, prefix c unseen -> 1e6 div 3 = 333333
      (2L, "x")        // < 2 tokens -> all zeros
    ).toDF("id", "text")

    val out = LmScore.bigramScores(corpus, train, "id", "text")
      .orderBy("id").collect()

    assert(out(0).getAs[Long]("n_bigrams") == 2L)
    assert(out(0).getAs[Long]("n_oov") == 0L)
    assert(out(0).getAs[Long]("score_sum") == 600000L + 400000L)
    assert(out(0).getAs[Long]("avg_score") == 500000L)

    assert(out(1).getAs[Long]("n_bigrams") == 1L)
    assert(out(1).getAs[Long]("n_oov") == 1L)
    assert(out(1).getAs[Long]("score_sum") == 333333L)
    assert(out(1).getAs[Long]("avg_score") == 333333L)

    assert(out(2).getAs[Long]("n_bigrams") == 0L)
    assert(out(2).getAs[Long]("n_oov") == 0L)
    assert(out(2).getAs[Long]("score_sum") == 0L)
    assert(out(2).getAs[Long]("avg_score") == 0L)
  }

  test("seen-prefix unseen-suffix uses the smoothed prefix denominator") {
    val train = Seq((0L, "a b a c")).toDF("id", "text")
    // cb: (a,b)=1 (b,a)=1 (a,c)=1 ; cu: a->2, b->1 ; V=3
    val corpus = Seq((1L, "a a")).toDF("id", "text")
    // (a,a): OOV but prefix a seen -> (0+1)*1e6 div (2+3) = 200000
    val r = LmScore.bigramScores(corpus, train, "id", "text").collect().head
    assert(r.getAs[Long]("n_oov") == 1L)
    assert(r.getAs[Long]("score_sum") == 200000L)
  }

  test("stupid backoff: hand-computed level selection and scores") {
    // Train: "a b c a b d" -> N=6; c1: a=2,b=2,c=1,d=1
    //   c2: (a,b)=2 (b,c)=1 (c,a)=1 (b,d)=1
    //   c3: (a,b,c)=1 (b,c,a)=1 (c,a,b)=1 (a,b,d)=1
    val train = Seq((100L, "a b c a b d")).toDF("id", "text")
    val corpus = Seq(
      (0L, "a b c"), // trigram hit: 1e6 div c2(a,b)=2 -> 500000
      (1L, "b c d"), // unigram backoff on d: 16*1*1e6 div (100*6) = 26666
      (2L, "a b x"), // x unseen everywhere -> OOV, 0
      (3L, "d a b"), // bigram backoff (a,b): 4*2*1e6 div (10*c1(a)=20) = 400000
      (4L, "x y")    // < 3 tokens -> zeros
    ).toDF("id", "text")
    val out = LmScore.stupidBackoffScores(corpus, train, "id", "text")
      .orderBy("id").collect()
    assert(out(0).getAs[Long]("n_hit3") == 1L &&
      out(0).getAs[Long]("score_sum") == 500000L)
    assert(out(1).getAs[Long]("n_backoff") == 1L &&
      out(1).getAs[Long]("score_sum") == 26666L)
    assert(out(2).getAs[Long]("n_oov") == 1L &&
      out(2).getAs[Long]("score_sum") == 0L)
    assert(out(3).getAs[Long]("n_backoff") == 1L &&
      out(3).getAs[Long]("score_sum") == 400000L)
    assert(out(4).getAs[Long]("n_trigrams") == 0L &&
      out(4).getAs[Long]("avg_score") == 0L)
  }

  test("stupid backoff: oversized model falls back to shuffle joins") {
    val train = Seq((100L, "a b c a b d"), (101L, "c d e a b")).toDF("id", "text")
    val corpus = Seq((0L, "a b c d"), (1L, "e a b"), (2L, "x")).toDF("id", "text")
    val guarded = LmScore.stupidBackoffScores(corpus, train, "id", "text",
      maxBroadcastModelRows = 0L)
    val bhj = guarded.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
    }
    assert(bhj.isEmpty, s"model broadcast despite guard: $bhj")
    val expected = LmScore.stupidBackoffScores(corpus, train, "id", "text")
      .orderBy("id").collect().toSeq
    assert(guarded.orderBy("id").collect().toSeq == expected)
  }

  test("oversized model falls back to shuffle joins with identical scores") {
    val train = Seq((100L, "a b a b c"), (101L, "c d e a b")).toDF("id", "text")
    val corpus = Seq((0L, "a b c d"), (1L, "e a"), (2L, "x")).toDF("id", "text")
    val guarded = LmScore.bigramScores(corpus, train, "id", "text",
      maxBroadcastModelRows = 0L) // force the fallback
    // the model count tables must NOT be broadcast-hash-joined (the
    // one-row vocab scalar still rides a broadcast nested-loop cross)
    val bhj = guarded.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
    }
    assert(bhj.isEmpty, s"model broadcast despite guard: $bhj")
    val expected = LmScore.bigramScores(corpus, train, "id", "text")
      .orderBy("id").collect().toSeq
    assert(guarded.orderBy("id").collect().toSeq == expected)
  }
}
