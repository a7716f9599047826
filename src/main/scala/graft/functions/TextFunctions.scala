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

  /** Word n-gram shingles (default 3) as an array of strings. Documents
    * shorter than k tokens yield an empty array — guarded explicitly
    * because Spark's `sequence(1, 0)` counts *down* ([1,0]), unlike SQL
    * generate_series which is empty; 1-based `element_at` keeps parity
    * with SQL list indexing.
    */
  def shingles(text: Column, k: Int = 3): Column =
    shinglesOfTokens(tokens(text), k)

  /** Shingles over an existing token-array column. Hot path: the native
    * codegen'd [[graft.functions.expressions.Shingles]] kernel — the
    * HOF formulation below pays an interpreted lambda per shingle
    * (HOFs are CodegenFallback) and taxed every shingle consumer
    * (measured 3.4x on q141 before its rewrite).
    */
  def shinglesOfTokens(toks: Column, k: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.expressions.Shingles(
      ColumnBridge.expression(toks), k))
  }

  /** HOF formulation of [[shinglesOfTokens]] — the interpreted parity
    * reference (OperatorsSpec pins bitwise equality with the native
    * kernel), not the hot path.
    */
  def shinglesOfTokensViaHof(toks: Column, k: Int): Column =
    when(size(toks) < k, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), size(toks) - lit(k - 1)),
        i => concat_ws(" ", (0 until k).map(j => element_at(toks, i + lit(j))): _*)))

  /** The q140 hashed-feature linear quality score — native one-pass
    * kernel ([[graft.functions.expressions.HashedFeatureScore]]); the
    * HOF fold below is the spec-pinned parity reference.
    */
  def hashedFeatureScore(text: Column, buckets: Int = 1024): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.expressions.HashedFeatureScore(
      ColumnBridge.expression(text), buckets, graft.operators.Dedup.M))
  }

  /** HOF formulation of [[hashedFeatureScore]] — parity reference only. */
  def hashedFeatureScoreViaHof(text: Column, buckets: Int = 1024): Column =
    aggregate(split(text, " "), lit(0L), (acc, t) =>
      acc + ((graft.operators.Dedup.polyHash(t) % buckets.toLong)
        * lit(2654435761L) % 1000L - 500L))

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

  /** GPT-2-style pretokenizer pattern, restricted to the portable subset
    * Java regex and RE2 (DuckDB) match identically: contraction suffixes,
    * optionally space-prefixed letter runs, digit runs, punctuation runs,
    * then bare spaces. No lookahead (RE2 has none), no `\s` (Java's
    * includes vertical tab, RE2's does not) — alternation order carries
    * the priorities, and both engines scan leftmost with first-matching
    * alternative, so token counts are engine-identical.
    */
  val BpePattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ']+| "

  /** Number of BPE-ish pretokens — the statistic training-cost estimates
    * want (whitespace counts undercount punctuation-heavy text). A real
    * BPE would further merge within these pretokens; the pretoken count is
    * the deterministic, vocabulary-free upper structure both engines
    * reproduce.
    */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpePattern), lit(0)))

  /** Cleaned text: stopword removal + consecutive-duplicate-token
    * collapse, fused into one native pass over the UTF-8 bytes (see
    * [[graft.functions.expressions.CleanTokens]]). Same semantics as the
    * HOF chain `array_join(filter(filter(tokens, not stopword), run-head),
    * " ")` that q112 and the DuckDB oracle use.
    */
  def cleanTokens(text: Column, stopwords: Seq[String]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.expressions.CleanTokens(
      ColumnBridge.expression(text), stopwords))
  }

  /** PII redaction: emails, dotted-quad IPs and dashed phone numbers
    * replaced by `<EMAIL>`/`<IP>`/`<PHONE>` markers in three sequential
    * byte-level passes (see [[graft.functions.expressions.PiiScrub]] for
    * the exact regex-equivalent semantics the DuckDB oracle replays).
    */
  def piiScrub(text: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.expressions.PiiScrub(
      ColumnBridge.expression(text)))
  }

  /** Token count of [[cleanTokens]]'s output — its own scalar because an
    * all-stopword document cleans to "", which a re-split would count as
    * one empty token instead of zero.
    */
  def cleanTokensCount(text: Column, stopwords: Seq[String]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.expressions.CleanTokensCount(
      ColumnBridge.expression(text), stopwords))
  }

  /** The four Gopher-style quality counters (n_words, char_sum, n_stop,
    * n_types) as one struct from a single byte-scan — see
    * [[graft.functions.expressions.GopherStats]] for the exact
    * split/filter/array_distinct parity semantics the oracle replays.
    */
  def gopherStats(text: Column, stopwords: Seq[String]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.expressions.GopherStats(
      ColumnBridge.expression(text), stopwords))
  }

  /** Unicode-script composition counters (multilingual front-door
    * signal) — one native byte pass; see
    * [[graft.functions.expressions.ScriptMix]].
    */
  def scriptMix(text: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.expressions.ScriptMix(
      ColumnBridge.expression(text)))
  }

  /** Interpreted parity reference for [[scriptMix]]: split per
    * character, classify code points via HOF folds. Spec-pinned equal;
    * not the hot path.
    */
  def scriptMixViaHof(text: Column): Column = {
    // split("", "") yields [""] (ascii 0) — guard the empty string
    val cps = when(length(text) === 0, array().cast("array<int>"))
      .otherwise(transform(split(text, ""), c => ascii(c)))
    def cnt(pred: Column => Column) =
      size(filter(cps, pred)).cast("long")
    val latin = cnt(cp => (cp >= 65 && cp <= 90) || (cp >= 97 && cp <= 122) ||
      (cp >= 0xC0 && cp <= 0x24F))
    val cyr = cnt(cp => cp >= 0x400 && cp <= 0x4FF)
    val cjk = cnt(cp => (cp >= 0x4E00 && cp <= 0x9FFF) ||
      (cp >= 0x3040 && cp <= 0x30FF) || (cp >= 0xAC00 && cp <= 0xD7AF))
    val dig = cnt(cp => cp >= 48 && cp <= 57)
    val spc = cnt(cp => cp === 32 || cp === 9 || cp === 10 || cp === 13)
    struct(latin.as("n_latin"), cyr.as("n_cyrillic"), cjk.as("n_cjk"),
      dig.as("n_digit"), spc.as("n_space"),
      (size(cps).cast("long") - latin - cyr - cjk - dig - spc).as("n_other"))
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

  /** Character-n-gram language identification (Cavnar-Trenkle-style,
    * profile-scored): each language has a signature set of frequent
    * character n-grams; the predicted language maximizes the per-character
    * signature hit rate. Expression-only (substring counting via
    * length-difference), so it runs inside codegen at full scan speed —
    * no UDF, no model file.
    */
  val LangProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq(" the ", " and ", " of ", " to ", "ing ", " is ", " that ", " it "),
    "de" -> Seq(" der ", " die ", " und ", " das ", " ist ", "chen ", " nicht ", " ein "),
    "fr" -> Seq(" le ", " la ", " les ", " de ", " et ", " est ", " une ", " que "),
    "es" -> Seq(" el ", " la ", " los ", " de ", " y ", " es ", " una ", "ción "),
    "it" -> Seq(" il ", " la ", " di ", " e ", " che ", " per ", " una ", " sono "))

  private def countOccurrences(text: Column, pattern: String): Column =
    (length(text) - length(replace(text, lit(pattern), lit("")))) / pattern.length

  /** Per-language score: signature-gram characters matched per character. */
  def langScore(text: Column, lang: String): Column = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    val hits = LangProfiles(lang)
      .map(p => countOccurrences(padded, p) * p.length)
      .reduce(_ + _)
    hits.cast("double") / greatest(length(padded), lit(1))
  }

  /** Predicted language code, or "und" when no profile scores above the
    * threshold (proportion of characters covered by signature grams).
    */
  def langId(text: Column, threshold: Double = 0.02): Column = {
    val scored = LangProfiles.keys.toSeq.sorted.map(l => (l, langScore(text, l)))
    val best = scored.map(_._2).reduce(greatest(_, _))
    scored.foldLeft(when(best < threshold, lit("und"))) { case (acc, (l, s)) =>
      acc.when(s === best, lit(l))
    }.otherwise(lit("und"))
  }

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

  /** Readability raw counts: whitespace words, sentence terminators
    * ([.!?] runs — "..." is ONE terminator), and the vowel-group
    * syllable proxy (runs of [aeiouy] in the lowercased text — the
    * classic cheap estimator; all-consonant tokens contribute 0, a
    * documented proxy bias). Both regexes live in the portable
    * Java-regex ∩ RE2 subset (no lookaround, no escapes-with-
    * engine-variance), so DuckDB's regexp_extract_all counts them
    * identically.
    *
    * Output: struct(n_words, n_sentences, n_syllables) — all longs.
    */
  def readabilityCounts(text: Column): Column = struct(
    size(tokens(text)).cast("long").as("n_words"),
    regexp_count(text, lit("[.!?]+")).cast("long").as("n_sentences"),
    regexp_count(lower(text), lit("[aeiouy]+")).cast("long")
      .as("n_syllables"))

  /** Flesch reading ease in exact floored MILLI-points — both engines
    * replay the integer arithmetic bit-for-bit:
    *
    *   flesch_milli = 206835 − (1015·W) div S − (84600·Y) div W
    *
    * with W = max(n_words, 1), S = max(n_sentences, 1) (a fragment
    * with no terminator reads as one sentence), Y the vowel-group
    * proxy. Scores can leave [0, 206.835] on degenerate inputs —
    * standard for Flesch; consumers bucket, not clamp.
    */
  def fleschMilli(counts: Column): Column = {
    // exact integer division for non-negative longs: subtract the
    // remainder first, so the double divide is of an exact multiple
    // (integer < 2^53 — exact) — Column./ alone would round-trip
    // through an inexact quotient
    def idiv(a: Column, b: Column): Column =
      ((a - pmod(a, b)) / b).cast("long")
    val w = greatest(counts.getField("n_words"), lit(1L))
    val s = greatest(counts.getField("n_sentences"), lit(1L))
    lit(206835L) - idiv(lit(1015L) * w, s) -
      idiv(lit(84600L) * counts.getField("n_syllables"), w)
  }
}
