package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyword extraction — RAKE (Rose, Engel, Cramer & Cowley 2010,
  * "Automatic keyword extraction from individual documents"): candidate
  * phrases are maximal runs of content words between stopword/
  * non-alphanumeric delimiters; each content word scores
  * degree/frequency (degree = Σ lengths of the phrases it appears in —
  * words that travel in long multiword phrases outrank words that only
  * appear alone), and a phrase scores the sum of its word scores. The
  * PHRASE-level complement of the unigram TF-IDF (q75) and adjacency
  * PMI (q227) surfaces: it extracts "support vector machine", not
  * three words.
  */
object Keywords {

  /** Top-k RAKE phrases over a corpus, exact integer scoring.
    *
    * Tokenization: lowercase; `[^a-z0-9 ]+` punctuation runs split
    * FRAGMENTS (portable Java∩RE2), single spaces split words,
    * stopwords delimit within a fragment (a double space yields an
    * empty token, which also delimits). Word score =
    * degree·1e6 div freq (floored — deterministic); phrase score =
    * Σ floored word scores; ties rank lexicographically. Phrases are
    * counted once per OCCURRENCE (a phrase appearing in 100 docs
    * contributes 100× to its words' degree/freq — the RAKE paper's
    * corpus reading).
    *
    * Scale shape: two chained generators (fragments, then words) +
    * one per-(doc, fragment) window (the gaps-and-islands run id —
    * partitioned, never global), one phrase aggregate, a word-stats
    * aggregate on the exploded phrase words, a scored join back on the
    * word key, and a TakeOrdered top-k cut. Everything shuffles on
    * doc/word/phrase keys; no global windows.
    *
    * Output (k rows): (phrase, n_words, n_occurrences, score_ppm) —
    * score desc, phrase asc.
    */
  def rakeTopK(df: DataFrame, textCol: String, stopwords: Seq[String],
               k: Int, maxPhraseWords: Int = 6): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(maxPhraseWords >= 1, s"maxPhraseWords must be >= 1")
    val stops = stopwords.map(_.toLowerCase)
    // Two-stage tokenization (the canonical RAKE reading): punctuation
    // splits the text into FRAGMENTS (a phrase never crosses ". " or
    // "-"), spaces split fragments into words, stopwords delimit
    // within a fragment. The synthetic doc id is assigned BEFORE any
    // generator — in the same select, a nondeterministic expression
    // evaluates per EXPLODED row and every token becomes its own
    // "document".
    val docs = df
      .filter(col(textCol).isNotNull)
      .select(monotonically_increasing_id().as("__doc"),
        lower(col(textCol)).as("__txt"))
    val frags = docs
      .select(col("__doc"),
        posexplode(split(col("__txt"), "[^a-z0-9 ]+"))
          .as(Seq("__f", "__frag")))
    val toks = frags
      .select(col("__doc"), col("__f"),
        posexplode(split(col("__frag"), " ")).as(Seq("__p", "__w")))
      .withColumn("__stop",
        col("__w") === "" || col("__w").isInCollection(stops))
    // islands within a fragment: run id = stopword count so far
    val w = Window.partitionBy(col("__doc"), col("__f")).orderBy(col("__p"))
    val phrases = toks
      .withColumn("__run",
        sum(when(col("__stop"), 1L).otherwise(0L)).over(w))
      .filter(!col("__stop"))
      .groupBy(col("__doc"), col("__f"), col("__run"))
      .agg(array_join(transform(array_sort(collect_list(
          struct(col("__p"), col("__w").as("s")))), x => x.getField("s")),
          " ").as("phrase"),
        count(lit(1)).as("__len"))
      .filter(col("__len") <= maxPhraseWords)
      .select(col("phrase"), col("__len"))
    // word stats over phrase OCCURRENCES: freq = appearances, degree =
    // Σ length of containing phrases (the word itself included)
    val words = phrases
      .select(col("__len"), explode(split(col("phrase"), " ")).as("__w"))
      .groupBy(col("__w"))
      .agg(count(lit(1)).as("__freq"), sum(col("__len")).as("__deg"))
      .withColumn("__ws", expr("(__deg * 1000000L) div __freq"))
    // score DISTINCT phrases (the occurrence count rides along), so the
    // word-score sum runs once per phrase — never occurrences × words
    // rows, whose product would outgrow exact-double division at scale
    val phraseTab = phrases.groupBy(col("phrase"))
      .agg(max(col("__len")).as("n_words"),
        count(lit(1)).as("n_occurrences"))
    val scored = phraseTab
      .select(col("phrase"), col("n_words"), col("n_occurrences"),
        explode(split(col("phrase"), " ")).as("__w"))
      .join(words.select(col("__w"), col("__ws")), "__w")
      .groupBy(col("phrase"), col("n_words"), col("n_occurrences"))
      .agg(sum(col("__ws")).as("score_ppm"))
      .select(col("phrase"), col("n_words"), col("n_occurrences"),
        col("score_ppm"))
    scored.orderBy(col("score_ppm").desc, col("phrase").asc).limit(k)
  }
}
