package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tokenizer-vocabulary construction: corpus token frequencies ranked
  * with a cumulative-coverage curve — the table a tokenizer build reads
  * to pick its vocab size ("top-V tokens cover X% of the stream").
  * `/root/reference` has no analytics surface; part of the
  * training-data-pipeline inventory (SURVEY.md §2 Part B).
  *
  * Scale shape (a 100 TB web corpus has 10⁸–10⁹ distinct whitespace
  * tokens, so "vocabulary-sized" is NOT small):
  *   - corpus-sized work is ONE token explode + a map-side-combinable
  *     groupBy(token) — no countDistinct mixed in (that would EXPAND
  *     every exploded row before the shuffle);
  *   - the global top-`topN` cut is a distributed bounded heap
  *     (TakeOrderedAndProject: each task keeps topN rows, the driver
  *     merges partitions × topN) — NO full-vocabulary sort and no
  *     single-partition window over distinct tokens;
  *   - document frequency is a second narrow pass filtered by a
  *     broadcast of the topN surviving tokens BEFORE the distinct
  *     aggregate, so the (tok, doc) distinct shuffle carries only
  *     rows mentioning a top token;
  *   - the rank/cumsum window runs over <= topN rows (the cumulative
  *     sum at rank r only involves ranks 1..r, all inside the cut).
  * Coverage fractions are single integer÷integer divisions — no float
  * accumulation anywhere.
  */
object Vocab {

  /** Top-`topN` tokens by corpus frequency with document frequency and
    * cumulative stream coverage. Ties rank lexicographically so the
    * output is total-ordered and engine-portable.
    */
  def coverage(df: DataFrame, idCol: String, textCol: String,
               topN: Int = 50): DataFrame = {
    val toks = df.select(col(idCol), explode(split(col(textCol), " ")).as("tok"))
    // Pass 1: token stream counts (map-side partials collapse each
    // token per task before the shuffle — hot tokens included).
    val counts = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("tot"))
    // Distributed bounded top-N: identical row set to rank <= topN
    // under the same total order, without ranking the full vocabulary.
    val top = counts.orderBy(col("cnt").desc, col("tok").asc).limit(topN)
    // Pass 2: document frequency for ONLY the surviving tokens.
    val dfreq = toks.join(broadcast(top.select(col("tok"))), "tok")
      .select(col("tok"), col(idCol)).distinct()
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val ord = Window.orderBy(col("cnt").desc, col("tok").asc)
    top.join(broadcast(dfreq), "tok")
      .withColumn("rank", row_number().over(ord).cast("long"))
      .withColumn("cum_cnt", sum(col("cnt"))
        .over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(total))
      .select(col("rank"), col("tok"), col("cnt"), col("df"),
        (col("cum_cnt").cast("double") / col("tot")).as("cum_frac"))
  }

  /** Token frequency-of-frequencies spectrum (the Zipf census behind
    * Good & Turing 1953): how many TYPES occur exactly r times, for
    * r = 1..maxR with an open tail bucket — the shape that sizes a
    * vocabulary before anyone trains one. The r = 1 row's token share
    * IS the Good-Turing unseen-event mass N₁/N: the probability the
    * next token drawn is a type never seen in this corpus — the
    * highest-value single number for vocab sizing and OOV budgeting
    * (a corpus with 40% hapax types but 0.4% hapax mass tokenizes
    * fine; 4% hapax mass does not). The hapax TYPE ratio is the
    * vocabulary-novelty complement the dedup family reads.
    *
    * The unit is the word `n`-gram: unigrams for open vocabularies;
    * on template-heavy or small-vocabulary corpora the unigram
    * spectrum saturates (every word frequent) and the 3-5-gram
    * spectrum is the one that carries signal — it doubles as the
    * repetition/boilerplate census (a corpus whose 4-grams are mostly
    * non-hapax is template text).
    *
    * Exact integers throughout: shares in floored ppm of the type and
    * token totals. Scale shape: one tokenize pass (n-grams are an
    * array transform, no window, no self-join) → n-gram counts (the
    * vocabulary aggregate every text op pays) → a SECOND aggregate
    * over the vocabulary-bounded count table to the ≤ maxR+1-row
    * spectrum. Nothing corpus² anywhere.
    *
    * Output: (r_bucket [1..maxR, maxR+1 = "(maxR)+"], n_types,
    * n_tokens, type_share_ppm, token_share_ppm), ordered by caller.
    */
  def frequencySpectrum(df: DataFrame, textCol: String, n: Int = 1,
                        maxR: Int = 10): DataFrame = {
    require(maxR >= 1, s"maxR must be >= 1, got $maxR")
    require(n >= 1 && n <= 16, s"n must be in [1,16], got $n")
    val base = df
      .filter(col(textCol).isNotNull)
      .select(expr(s"filter(split($textCol, ' '), x -> x != '')")
        .as("__arr"))
    val toks =
      if (n == 1) base.select(explode(col("__arr")).as("__tok"))
      else base
        .filter(size(col("__arr")) >= n)
        // guard keeps size − n ≥ 0, so sequence() is ascending
        .select(explode(expr(
          s"transform(sequence(0, size(__arr) - $n)," +
            s" i -> array_join(slice(__arr, i + 1, $n), ' '))"))
          .as("__tok"))
    val counts = toks.groupBy(col("__tok")).agg(count(lit(1)).as("__r"))
    val spectrum = counts
      .groupBy(least(col("__r"), lit(maxR.toLong + 1)).as("r_bucket"))
      .agg(count(lit(1)).as("n_types"), sum(col("__r")).as("n_tokens"))
    spectrum
      .crossJoin(broadcast(spectrum.agg(
        sum(col("n_types")).as("__tt"), sum(col("n_tokens")).as("__tn"))))
      .select(col("r_bucket"), col("n_types"), col("n_tokens"),
        expr("(n_types * 1000000L) div __tt").as("type_share_ppm"),
        expr("(n_tokens * 1000000L) div __tn").as("token_share_ppm"))
  }
}
