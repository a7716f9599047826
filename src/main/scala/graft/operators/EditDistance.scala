package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.functions.expressions.{DeletionVariants, LevenshteinWithin}

/** Exact edit-distance similarity self-join via deletion neighborhoods
  * (FastSS — Bocek et al., "Fast Similarity Search in Large Dictionaries",
  * 2007; the index form popularized by SymSpell). Finds every unordered
  * pair of distinct strings with Levenshtein distance <= tau, with NO
  * cross join: if ed(r, s) <= tau then deleting the substituted/deleted
  * characters from r and the substituted/inserted ones from s (each at
  * most tau deletions) yields a COMMON subsequence, so the <=tau-deletion
  * neighborhoods of r and s intersect — candidates are an equi-join on
  * the shared variant string, then each candidate pair is verified once
  * with the native banded [[LevenshteinWithin]] kernel (codegen,
  * O(tau·n) per pair after common-affix stripping).
  *
  * `/root/reference` has no analytics surface; this is part of the
  * training-data-pipeline inventory (SURVEY.md §2) — typo/variant
  * detection over token vocabularies, entity names, URLs.
  *
  * Scale shape (100 TB corpus → a dictionary of 10⁸–10⁹ distinct keys):
  *   - per string the variant fan-out is C(L,0)+…+C(L,tau) rows — a
  *     narrow explode, no vocabulary broadcast, no index on the driver
  *     (SymSpell's in-memory dictionary re-expressed as a shuffle join);
  *   - candidate volume is Σ_v |posting(v)|² over variant keys. Deletion
  *     variants are near-unique for natural-language keys of length
  *     >= ~2·tau+2; very short strings or tiny alphabets degrade toward
  *     all-pairs (their neighborhoods collapse), which is intrinsic to
  *     the problem — there ARE that many genuinely close pairs. The
  *     verify step is a narrow filter after a pair-level distinct, so
  *     each surviving pair costs exactly one banded DP;
  *   - every stage is combinable: distinct strings (map-side), distinct
  *     (variant, string) (map-side), pair-distinct (map-side). A hot
  *     variant key skew-spreads under AQE skew-join handling.
  *
  * tau is capped at 2: neighborhoods grow as C(L, tau), and for tau >= 3
  * segment-based filters (PassJoin, Li et al. 2011) dominate — documented
  * here so the cap reads as a design boundary, not a gap.
  *
  * Output: (s_a, s_b, dist) with s_a < s_b, dist <= tau, one row per
  * unordered pair of DISTINCT input strings (nulls dropped).
  */
object EditDistance {

  /** All strings obtainable from `s` by deleting at most `tau`
    * characters, deduplicated — the HOF reference formulation of the
    * native [[DeletionVariants]] kernel (EditDistanceSpec pins set
    * equality between the two; the native kernel is what [[pairs]]
    * runs: one byte pass per variant vs nested interpreted lambdas).
    */
  private[graft] def deletionVariantsHof(colName: String, tau: Int): Column = {
    val s = colName
    val d0 = s"array($s)"
    // Delete position i (1-based): prefix [1, i-1] ++ suffix [i+1, L].
    val d1 = s"""CASE WHEN length($s) >= 1 THEN
        transform(sequence(1, length($s)),
          i -> concat(substr($s, 1, i - 1), substr($s, i + 1, length($s))))
      ELSE array() END"""
    // Delete positions i < j: [1, i-1] ++ [i+1, j-1] ++ [j+1, L].
    val d2 = s"""CASE WHEN length($s) >= 2 THEN
        flatten(transform(sequence(1, length($s) - 1),
          i -> transform(sequence(i + 1, length($s)),
            j -> concat(substr($s, 1, i - 1),
                        substr($s, i + 1, j - i - 1),
                        substr($s, j + 1, length($s))))))
      ELSE array() END"""
    tau match {
      case 1 => expr(s"array_distinct(concat($d0, $d1))")
      case 2 => expr(s"array_distinct(concat($d0, $d1, $d2))")
      case t => throw new IllegalArgumentException(
        s"tau must be 1 or 2 (got $t); for tau >= 3 use a segment filter")
    }
  }

  /** Every unordered pair of distinct non-null values of `strCol` with
    * Levenshtein distance <= `tau`. See object scaladoc for the shape.
    */
  def pairs(df: DataFrame, strCol: String, tau: Int): DataFrame = {
    require(tau == 1 || tau == 2, s"tau must be 1 or 2, got $tau")
    val strs = df.select(col(strCol).cast("string").as("s"))
      .where(col("s").isNotNull).distinct()
    // Join on the 64-bit hash of the variant, not the variant string:
    // the candidate shuffle moves 8-byte keys instead of near-full-length
    // substrings. A hash collision only ADDS a candidate (the verify step
    // discards it) — never loses one, so exactness is preserved.
    val variantsCol = ColumnBridge.column(
      DeletionVariants(ColumnBridge.expression(col("s")), tau))
    val vars = strs
      .select(col("s"), explode(variantsCol).as("v"))
      .select(col("s"), xxhash64(col("v")).as("h"))
    val cand = vars.as("a")
      .join(vars.as("b"), col("a.h") === col("b.h") && col("a.s") < col("b.s"))
      .select(col("a.s").as("s_a"), col("b.s").as("s_b"))
    // Verify BEFORE deduplicating: the banded DP is a narrow filter while
    // distinct is a full shuffle, and near-threshold dictionaries (the
    // dense digit-neighborhood case) carry ~1.02 duplicates per pair but
    // several non-pairs per true pair — dedup is cheapest on survivors.
    // The native banded kernel replaces Spark's built-in threshold
    // levenshtein (~76 µs/call on 18-char keys — it dominated the whole
    // join at sf1) with the same contract: distance if <= tau, else -1.
    val distCol = ColumnBridge.column(LevenshteinWithin(
      ColumnBridge.expression(col("s_a")),
      ColumnBridge.expression(col("s_b")), tau))
    cand
      .withColumn("dist", distCol.cast("long"))
      .where(col("dist") >= 0)
      .distinct()
  }

  /** The recurring-ingest form (the q97/q130/q161 incremental
    * contract at string granularity): every ED<=tau pair involving at
    * least one BATCH string, with history × history never generated —
    * the batch side's variants probe the union's variants, so the
    * candidate volume is |batch|-proportional regardless of how large
    * the accumulated dictionary grows. Output: (s_a, s_b, dist) with
    * s_a < s_b, each unordered pair once, every pair containing at
    * least one batch string (batch-batch pairs included).
    */
  def pairsIncremental(batch: DataFrame, history: DataFrame, strCol: String,
      tau: Int): DataFrame = {
    require(tau == 1 || tau == 2, s"tau must be 1 or 2, got $tau")
    def strsOf(df: DataFrame) = df.select(col(strCol).cast("string").as("s"))
      .where(col("s").isNotNull).distinct()
    val variantsCol = ColumnBridge.column(
      DeletionVariants(ColumnBridge.expression(col("s")), tau))
    def varsOf(df: DataFrame) = df
      .select(col("s"), explode(variantsCol).as("v"))
      .select(col("s"), xxhash64(col("v")).as("h"))
    val b = strsOf(batch)
    val u = strsOf(history).union(b).distinct()
    val cand = varsOf(b).as("a")
      .join(varsOf(u).as("b"),
        col("a.h") === col("b.h") && col("a.s") =!= col("b.s"))
      .select(least(col("a.s"), col("b.s")).as("s_a"),
        greatest(col("a.s"), col("b.s")).as("s_b"))
    val distCol = ColumnBridge.column(LevenshteinWithin(
      ColumnBridge.expression(col("s_a")),
      ColumnBridge.expression(col("s_b")), tau))
    cand
      .withColumn("dist", distCol.cast("long"))
      .where(col("dist") >= 0)
      .distinct()
  }
}
