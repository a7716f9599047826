package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage (Fellegi & Sunter 1969, "A theory for
  * record linkage"; Newcombe et al. 1959) — match records for the SAME
  * entity across two registries that share no key: crawl metadata vs a
  * curated catalog, author tables across snapshots, dedup of scraped
  * entity lists. The classic decision rule: candidate pairs from
  * BLOCKING (an equi-join on coarse keys — the only thing keeping the
  * pair space from |A|x|B|), per-field agreement tests on the pairs,
  * a log-likelihood match weight per field (agreement weight
  * log(m/u) > 0, disagreement log((1-m)/(1-u)) < 0), and a two-threshold
  * classification: match / possible (clerical review) / non-match.
  *
  * Weights here are INTEGER milli-bits supplied by the caller (the m/u
  * probabilities are survey parameters, not data), so scores sum exactly
  * and the DuckDB oracle replays the whole decision rule.
  *
  * Scale shape: the blocking join is the one shuffle; the pair space is
  * Σ_b |A_b|·|B_b| over blocks — CHOOSE BLOCKS so that stays linear
  * (e.g. add a rounded-attribute component, the q165 posting-list
  * lesson). Agreement tests are narrow per-pair expressions (the edit
  * distance rule should use the banded
  * [[graft.functions.expressions.LevenshteinWithin]] kernel, not the
  * built-in). Output is cut to score >= tLo by default: at 100 TB the
  * non-match mass is the pair space itself and is never materialized.
  *
  * Output: left/right id columns + one boolean per rule
  * (agree_<rule>), score, verdict ('match' | 'possible').
  */
object Linkage {

  /** One field comparison: `agree` is evaluated on the blocked pair
    * frame (qualify columns with the caller's own names; both inputs'
    * columns are visible). Null-safe: a null agreement counts as
    * disagreement. */
  case class LinkRule(name: String, agree: Column, wAgree: Long, wDisagree: Long) {
    require(wAgree > wDisagree,
      s"rule $name: agreement weight must exceed disagreement weight")
  }

  /** Banded edit-distance agreement test (distance <= tau) through the
    * native [[graft.functions.expressions.LevenshteinWithin]] kernel —
    * the rule to use for name/string fields (the built-in levenshtein
    * measured ~76us/call on short keys; the kernel is the q165 path).
    */
  def levWithin(a: Column, b: Column, tau: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.expressions.LevenshteinWithin(
      ColumnBridge.expression(a), ColumnBridge.expression(b), tau)) >= 0
  }

  def fellegiSunter(a: DataFrame, b: DataFrame,
                    blockKeys: Seq[(String, String)],
                    idCols: Seq[String],
                    rules: Seq[LinkRule],
                    tLo: Long, tHi: Long,
                    keepNonMatches: Boolean = false): DataFrame = {
    require(blockKeys.nonEmpty, "blocking keys are mandatory (no cross join)")
    require(rules.nonEmpty, "need at least one field rule")
    require(tLo <= tHi, s"thresholds out of order: $tLo > $tHi")
    val overlap = a.columns.toSet.intersect(b.columns.toSet)
    require(overlap.isEmpty,
      s"registries must use disjoint column names (rules and idCols reference " +
        s"them unqualified); shared: ${overlap.mkString(", ")}")
    val cond = blockKeys.map { case (ka, kb) => a(ka) === b(kb) }.reduce(_ && _)
    val pairs = a.join(b, cond)
    val withAgree = rules.foldLeft(pairs) { (df, r) =>
      df.withColumn(s"agree_${r.name}", coalesce(r.agree, lit(false)))
    }
    val score = rules.map(r =>
        when(col(s"agree_${r.name}"), lit(r.wAgree)).otherwise(lit(r.wDisagree)))
      .reduce(_ + _)
    val scored = withAgree
      .withColumn("score", score)
      .withColumn("verdict",
        when(col("score") >= tHi, lit("match"))
          .when(col("score") >= tLo, lit("possible"))
          .otherwise(lit("non_match")))
    val cut = if (keepNonMatches) scored else scored.filter(col("score") >= tLo)
    cut.select(idCols.map(col) ++
      rules.map(r => col(s"agree_${r.name}")) ++
      Seq(col("score"), col("verdict")): _*)
  }

  /** Multi-pass blocking (Newcombe's classic recall fix for the
    * single-pass trade): run [[fellegiSunter]] once per blocking-key
    * set and union the results deduplicated on the id pair — a true
    * match missed by one pass (e.g. a typo'd surname block) is caught
    * by another (e.g. the birth-year block). Scores are identical
    * across passes (same rules), so dedup is a plain distinct on the
    * full row. Pair space = Σ over passes of Σ_b |A_b|·|B_b|.
    */
  def fellegiSunterMultiBlock(a: DataFrame, b: DataFrame,
                              blockPasses: Seq[Seq[(String, String)]],
                              idCols: Seq[String],
                              rules: Seq[LinkRule],
                              tLo: Long, tHi: Long): DataFrame = {
    require(blockPasses.nonEmpty, "need at least one blocking pass")
    blockPasses.map(bk =>
        fellegiSunter(a, b, bk, idCols, rules, tLo, tHi))
      .reduce(_ unionByName _)
      .distinct()
  }
}
