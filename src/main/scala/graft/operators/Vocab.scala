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
}
