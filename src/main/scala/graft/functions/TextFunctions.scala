package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text-analysis functions for large-scale document pipelines.
  *
  * All functions are pure Catalyst expressions (no UDFs) so they stay inside
  * whole-stage codegen and survive predicate pushdown / column pruning — at
  * 100 TB the difference between an expression and a black-box UDF is the
  * difference between a pruned columnar scan and a full deserialize.
  *
  * Capability parity target: text-analysis ops beyond the reference surface
  * (the reference, kaflow, has no analytics; see SURVEY.md §2 Part B17).
  */
object TextFunctions {

  /** Whitespace tokens of a text column (literal single-space split, matching
    * SQL `string_split(text, ' ')`).
    */
  def tokens(text: Column): Column = split(text, " ")

  /** Word n-gram shingles (default 3) as an array of strings.
    * `sequence(1, max(n-k+1, 0))` is empty-safe for short docs; 1-based
    * `element_at` keeps parity with SQL list indexing.
    */
  def shingles(text: Column, k: Int = 3): Column = {
    val toks = tokens(text)
    transform(
      sequence(lit(1), greatest(size(toks) - lit(k - 1), lit(0))),
      i => concat_ws(" ", (0 until k).map(j => element_at(toks, i + lit(j))): _*))
  }

  /** Number of whitespace tokens. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** Number of distinct whitespace tokens. */
  def distinctTokenCount(text: Column): Column = size(array_distinct(tokens(text)))

  /** Mean token length in characters, as a double. Computed as sum/count —
    * never `avg` over decimals — so float semantics are engine-identical.
    */
  def avgTokenLength(text: Column): Column = {
    val toks = tokens(text)
    aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks)
  }

  /** Per-occurrence ratio of tokens that appear in a fixed stopword list. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val toks = tokens(text)
    size(filter(toks, t => t.isin(stopwords: _*))).cast("double") / size(toks)
  }

  /** Ratio of non-alphanumeric, non-space characters. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[^A-Za-z0-9 ]", ""))).cast("double") /
      greatest(length(text), lit(1))

  /** Heuristic document quality score in [0,1]:
    * 0.5 * length saturation (chars/500 capped at 1)
    * + 0.3 * stopword presence (ratio * 3 capped at 1)
    * + 0.2 * (1 - punctuation ratio).
    * Deterministic double arithmetic (identical IEEE op sequence per engine).
    */
  def qualityScore(text: Column, stopwords: Seq[String]): Column =
    lit(0.5) * least(length(text).cast("double") / 500.0, lit(1.0)) +
      lit(0.3) * least(stopwordRatio(text, stopwords) * 3.0, lit(1.0)) +
      lit(0.2) * (lit(1.0) - punctRatio(text))
}
