package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("native hashedFeatureScore matches the HOF fold, empty-token edges included") {
    val rng = new scala.util.Random(23)
    val texts = Seq("", " ", "a", "a b", "a  b", " a b ", "tab le",
      "日本 語 text") ++
      (0 until 40).map(_ => Seq.fill(1 + rng.nextInt(20))(
        rng.alphanumeric.take(1 + rng.nextInt(6)).mkString).mkString(" "))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val native = df.select(
        TextFunctions.hashedFeatureScore(col("text")).as("s"))
      .orderBy(col("s")).collect().map(_.getLong(0)).toSeq
    val hof = df.select(
        TextFunctions.hashedFeatureScoreViaHof(col("text")).as("s"))
      .orderBy(col("s")).collect().map(_.getLong(0)).toSeq
    assert(native == hof)
  }

  test("langId identifies real sentences by char-ngram profiles") {
    val samples = Seq(
      ("the cat sat on the mat and it is warm", "en"),
      ("der Hund und die Katze sind nicht das Problem", "de"),
      ("le chat est sur la table et les livres sont à lui", "fr"),
      ("el perro y la casa de los niños es una maravilla", "es"),
      ("il gatto che dorme per una giornata intera sono cose note", "it"))
      .toDF("text", "expected")
    val out = samples.withColumn("predicted", TextFunctions.langId(col("text")))
      .select("expected", "predicted").as[(String, String)].collect()
    out.foreach { case (exp, pred) => assert(pred == exp, s"expected $exp got $pred") }
  }

  test("langId returns 'und' for non-language input") {
    val out = Seq("zzz qqq xxx kkk 12345").toDF("text")
      .select(TextFunctions.langId(col("text"))).as[String].collect()(0)
    assert(out == "und")
  }

  test("token stats: counts, distinct, average length") {
    val df = Seq("aa bb aa cccc").toDF("text")
    val row = df.select(
      TextFunctions.tokenCount(col("text")).as("n"),
      TextFunctions.distinctTokenCount(col("text")).as("d"),
      TextFunctions.avgTokenLength(col("text")).as("avg")).collect()(0)
    assert(row.getAs[Int]("n") == 4)
    assert(row.getAs[Int]("d") == 3)
    assert(math.abs(row.getAs[Double]("avg") - 10.0 / 4) < 1e-12)
  }

  test("shingles produce n-k+1 word n-grams, empty-safe for short docs") {
    val df = Seq("a b c d", "a b").toDF("text")
    val out = df.select(TextFunctions.shingles(col("text"), 3).as("sh"))
      .as[Seq[String]].collect()
    assert(out(0) == Seq("a b c", "b c d"))
    assert(out(1) == Seq.empty)
  }

  test("cleanTokens: native kernel matches the HOF chain on edge shapes") {
    val stops = Seq("the", "a", "of", "and", "to", "in")
    // Edge shapes: consecutive dups, stopword runs that expose new dups
    // ("x the x" -> "x x" -> "x"), leading/trailing/double spaces (empty
    // tokens are ordinary tokens), all-stopword, empty, single-token.
    val docs = Seq(
      "key agg agg row the the table a a value",
      "x the x and x",
      " leading and trailing ",
      "double  space  a  a",
      "the a of and to in",
      "",
      "solo",
      "a", "aa aa", "the the the")
    val df = docs.toDF("text")
    val toks = split(col("text"), " ")
    val hof = df.select(
      array_join(
        filter(
          filter(toks, t => !t.isin(stops: _*)),
          (t, i) => when(i === 0, lit(true))
            .otherwise(t =!= get(filter(toks, tt => !tt.isin(stops: _*)), i - 1))),
        " ").as("cleaned"),
      size(filter(
        filter(toks, t => !t.isin(stops: _*)),
        (t, i) => when(i === 0, lit(true))
          .otherwise(t =!= get(filter(toks, tt => !tt.isin(stops: _*)), i - 1))))
        .as("n")).as[(String, Int)].collect()
    val native = df.select(
      TextFunctions.cleanTokens(col("text"), stops).as("cleaned"),
      TextFunctions.cleanTokensCount(col("text"), stops).as("n"))
      .as[(String, Int)].collect()
    docs.indices.foreach { i =>
      assert(native(i) == hof(i), s"doc '${docs(i)}': native=${native(i)} hof=${hof(i)}")
    }
    // Spot-check the all-stopword doc: cleans to "" with count 0 (not 1).
    assert(native(4) == (("", 0)))
  }

  test("cleanTokens handles null input and non-ASCII tokens") {
    val stops = Seq("the")
    val df = Seq[String](null, "héllo héllo the wörld").toDF("text")
    val out = df.select(TextFunctions.cleanTokens(col("text"), stops)).collect()
    assert(out(0).isNullAt(0))
    assert(out(1).getString(0) == "héllo wörld")
  }

  test("quality score rewards length and stopword presence, penalizes punct") {
    val good = "the quick brown fox jumps over the lazy dog " * 12
    val bad = "@#$% ^&*! )(*& @#$%"
    val df = Seq(good, bad).toDF("text")
    val scores = df.select(TextFunctions.qualityScore(col("text"),
      TextFunctions.LangProfiles("en").map(_.trim)).as("q")).as[Double].collect()
    assert(scores(0) > 0.8)
    assert(scores(1) < 0.4)
  }

  test("readabilityCounts: words, terminator runs, vowel groups") {
    val df = Seq("The cat sat. Did it? Yes!!!").toDF("text")
    val r = df.select(TextFunctions.readabilityCounts(col("text")).as("c"))
      .select(col("c.n_words"), col("c.n_sentences"), col("c.n_syllables"))
      .as[(Long, Long, Long)].head()
    // 6 whitespace words; "." "?" "!!!" = 3 terminator RUNS;
    // vowel groups: e,a,a,i,i,e -> 6 ("Yes" has e; "Did it" i,i)
    assert(r == ((6L, 3L, 6L)))
  }

  test("fleschMilli: exact integer formula with floor-safe division") {
    // W=10, S=2, Y=12: 206835 - 1015*10/2 - 84600*12/10
    //                = 206835 - 5075 - 101520 = 100240
    val df = Seq((10L, 2L, 12L)).toDF("w", "s", "y")
    val fm = df.select(TextFunctions.fleschMilli(struct(
        col("w").as("n_words"), col("s").as("n_sentences"),
        col("y").as("n_syllables"))).as("f")).as[Long].head()
    assert(fm == 100240L)
    // terminator-free fragment: S clamps to 1, not a division by zero
    val frag = Seq("no terminator here").toDF("text")
    val f2 = frag.select(TextFunctions.fleschMilli(
      TextFunctions.readabilityCounts(col("text"))).as("f")).as[Long].head()
    // W=3, S=1, Y=6 (o,o,e,i,a,o,e->7? groups: n[o] termin[a]t[o]r:
    // o,a,o; h[e]r[e]: e,e; n[o]: o -> o,e,i,a,o,e,e = count below
    assert(f2 == 206835L - 1015L * 3L -
      (84600L * 7L) / 3L)
  }
}
