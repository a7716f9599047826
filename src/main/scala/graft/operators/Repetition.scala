package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Within-document LINE-level repetition signals — the remaining Gopher
  * repetition filters (Rae et al. 2021, arXiv:2112.11446 Table A1:
  * "fraction of duplicate lines" / "fraction of characters in duplicate
  * lines"). q79 covers the gram-level signals (duplicate 3-gram
  * fraction, top-token coverage); this covers the line-level pair. The
  * fixture corpus has no newlines, so a "line" is a fixed-width token
  * window (`lineTokens`, the q113/q139 chunk convention) — the operator
  * takes the window width, a real corpus with newlines would pre-split
  * and use width 1.
  *
  * Definitions (documented, exact): a line occurring c times in a
  * document contributes c-1 duplicate occurrences (every copy beyond
  * the first). `dup_line_frac = Σ(c-1) / Σc` and
  * `dup_char_frac = Σ((c-1)·len) / Σ(c·len)` over the document's
  * distinct line contents. Counts are exact integers; the two ratios
  * are single long/long double divisions — bit-reproducible in DuckDB.
  *
  * Scale shape: one narrow chunk-explode, then ONE combinable
  * `groupBy(doc, line-hash)` + per-doc aggregate — map-side partials
  * collapse a pathological document's repeated line before the
  * exchange, and no window ever buffers a document. Lines travel as
  * 64-bit content hashes + lengths, never strings, after the first
  * aggregate.
  */
object Repetition {

  /** Per-document line repetition stats over `lineTokens`-token lines.
    * Output: (idCol, n_lines, n_dup_lines, dup_line_frac,
    * dup_char_frac); documents shorter than one full line window still
    * produce their single remainder line.
    */
  def lineStats(df: DataFrame, idCol: String, textCol: String,
                lineTokens: Int = 10): DataFrame = {
    require(lineTokens >= 1, s"lineTokens must be >= 1, got $lineTokens")
    val toks = df.select(col(idCol), split(col(textCol), " ").as("__ts"))
    // One row per line window; remainder window included (slice caps at
    // the array end). Lines reduce to (polyHash, char length) — content
    // equality within a document via the house content hash, the same
    // id every dedup operator keys on.
    val lines = toks.select(col(idCol),
        explode(transform(
          // `div`, not `/`: Column./ is IEEE double division.
          sequence(lit(0), expr(s"(size(__ts) - 1) div $lineTokens")),
          g => array_join(
            slice(col("__ts"), g * lineTokens + 1, lit(lineTokens)), " ")))
          .as("__line"))
      .select(col(idCol), Dedup.polyHash(col("__line")).as("__lid"),
        length(col("__line")).cast("long").as("__len"))
    lines.groupBy(col(idCol), col("__lid"))
      .agg(count(lit(1)).as("__c"), max(col("__len")).as("__len"))
      .groupBy(col(idCol))
      .agg(sum(col("__c")).cast("long").as("n_lines"),
        sum(col("__c") - 1L).cast("long").as("n_dup_lines"),
        sum((col("__c") - 1L) * col("__len")).cast("long").as("__dupch"),
        sum(col("__c") * col("__len")).cast("long").as("__ch"))
      .select(col(idCol), col("n_lines"), col("n_dup_lines"),
        (col("n_dup_lines").cast("double") / col("n_lines")).as("dup_line_frac"),
        (col("__dupch").cast("double") / col("__ch")).as("dup_char_frac"))
  }
}
