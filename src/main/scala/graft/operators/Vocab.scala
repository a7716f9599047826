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
  * Scale shape: the corpus-sized work is ONE token explode + a
  * map-side-combinable groupBy(token); everything after operates on the
  * VOCABULARY (bounded, orders of magnitude smaller than the corpus) —
  * the global rank/cumsum window is a documented bounded
  * single-partition step over vocab rows, same class as the packing
  * bucket totals. Coverage fractions are single integer÷integer
  * divisions — no float accumulation anywhere.
  */
object Vocab {

  /** Top-`topN` tokens by corpus frequency with document frequency and
    * cumulative stream coverage. Ties rank lexicographically so the
    * output is total-ordered and engine-portable.
    */
  def coverage(df: DataFrame, idCol: String, textCol: String,
               topN: Int = 50): DataFrame = {
    val toks = df.select(col(idCol), explode(split(col(textCol), " ")).as("tok"))
    val counts = toks.groupBy(col("tok"))
      .agg(count(lit(1)).as("cnt"), countDistinct(col(idCol)).as("df"))
    val total = counts.agg(sum(col("cnt")).as("tot"))
    val ord = Window.orderBy(col("cnt").desc, col("tok").asc)
    counts
      .withColumn("rank", row_number().over(ord).cast("long"))
      .withColumn("cum_cnt", sum(col("cnt"))
        .over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("rank") <= topN)
      .crossJoin(broadcast(total))
      .select(col("rank"), col("tok"), col("cnt"), col("df"),
        (col("cum_cnt").cast("double") / col("tot")).as("cum_frac"))
  }
}
