package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Association measures between categorical signals — the "are these two
  * metadata columns independent?" audits a release runs before trusting a
  * stratified design (a lang×source association means per-source quotas
  * silently reshape the language mixture, and vice versa).
  */
object Association {

  /** Per-category chi-square decomposition of the A×B contingency table,
    * in exact integer arithmetic both engines replay.
    *
    * Uses the O²-form of the statistic — chi² = N · (Σ_cells O²/(R·C)) − N
    * — rather than the (O−E)² form: empty cells contribute zero, so the
    * bounded OBSERVED table is enough (no full-grid generation), and the
    * largest intermediate is O²·N·1e6 ≤ N³·1e6, inside DECIMAL(38,0) up
    * to ~4e10 rows (the (O·N−R·C)² form hits N⁴ and dies at ~3e9).
    * Per-cell terms are floored ppm (deterministic; documented, as q227's
    * per-cell rule): chi2_ppm per row-category a is
    *   Σ_b floor(O_ab² · N · 1e6 / (R_a · C_b)) − R_a · 1e6,
    * and Σ_a chi2_ppm is the (floored) full-table statistic ·1e6.
    *
    * Scale shape: ONE corpus aggregate to the observed |A|×|B| cell table
    * (bounded by category cardinalities, never corpus-sized — hot cells
    * collapse map-side); row/column/grand totals re-aggregate that table;
    * the term join runs bounded×bounded. The corpus is scanned once.
    *
    * Output per row-category: (colA, n, dof, chi2_ppm), dof = (|A|−1)(|B|−1).
    */
  def chiSquare(df: DataFrame, colA: String, colB: String): DataFrame = {
    val dec = "decimal(38,0)"
    val cells = df
      .filter(col(colA).isNotNull && col(colB).isNotNull)
      .groupBy(col(colA).as("__a"), col(colB).as("__b"))
      .agg(count(lit(1)).as("__o"))
    val rows = cells.groupBy(col("__a")).agg(sum(col("__o")).as("__r"))
    val cols = cells.groupBy(col("__b")).agg(sum(col("__o")).as("__c"))
    val tot = cells.agg(sum(col("__o")).cast(dec).as("__n"),
      count_distinct(col("__a")).as("__ka"),
      count_distinct(col("__b")).as("__kb"))
    cells.join(rows, "__a").join(cols, "__b")
      .crossJoin(broadcast(tot))
      .withColumn("__term", expr(
        "(CAST(__o AS DECIMAL(38,0)) * CAST(__o AS DECIMAL(38,0)) * __n" +
          " * CAST(1000000 AS DECIMAL(38,0)))" +
          " div (CAST(__r AS DECIMAL(38,0)) * CAST(__c AS DECIMAL(38,0)))"))
      .groupBy(col("__a"))
      .agg(max(col("__r")).as("n"),
        max((col("__ka") - 1) * (col("__kb") - 1)).as("dof"),
        (sum(col("__term")) -
          max(col("__r")).cast(dec) * lit(1000000).cast(dec))
          .cast("long").as("chi2_ppm"))
      .select(col("__a").as(colA), col("n"), col("dof"), col("chi2_ppm"))
  }

  /** Top-k collocations by pointwise mutual information over consecutive
    * token pairs (Church & Hanks 1990) — the corpus-analysis op that
    * surfaces boilerplate multiword units ("all rights reserved") and
    * genuine compounds, where raw bigram counts only surface "of the".
    *
    * Logs are avoided (engine-portable): the lift ratio
    * P(xy)/(P(x)·P(y)) ships as exact floored ppm,
    *   lift_ppm = (c_xy · N² · 1e6) div (M · c_x · c_y),
    * monotone in PMI (PMI > 0 ⇔ lift_ppm > 1e6), with N = total tokens,
    * M = total bigram positions. DECIMAL(38,0) bound: c_xy·N²·1e6 ≤
    * N³·1e6 — exact to ~4e10 tokens (the chiSquare class; shard beyond).
    *
    * Scale shape: one positions explode to the bigram VOCABULARY table
    * (hot bigrams collapse map-side) + the unigram vocabulary table from
    * its own narrow pass; two vocab×vocab equi-joins attach c_x and c_y;
    * the min-support cut happens before any join; final top-k is a
    * TakeOrdered over the surviving vocabulary table (never corpus rows).
    *
    * Output: (bigram, n_pair, n_left, n_right, lift_ppm), the k largest
    * by (lift_ppm DESC, bigram ASC) — deterministic ties.
    */
  def pmiTopBigrams(df: DataFrame, textCol: String, minCount: Long,
                    k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val dec = "decimal(38,0)"
    val toks = df.select(split(col(textCol), " ").as("__l"))
    val uni = toks.select(explode(col("__l")).as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("__cw"))
    val bi = toks.select(col("__l"),
        explode(when(size(col("__l")) < 2, array().cast("array<int>"))
          .otherwise(sequence(lit(1), size(col("__l")) - 1))).as("__i"))
      .select(element_at(col("__l"), col("__i")).as("__w1"),
        element_at(col("__l"), col("__i") + 1).as("__w2"))
      .groupBy(col("__w1"), col("__w2")).agg(count(lit(1)).as("__cxy"))
      .filter(col("__cxy") >= minCount)
    val tot = uni.agg(sum(col("__cw")).cast(dec).as("__n"))
      .crossJoin(toks.select(
        (size(col("__l")) - 1).cast("long").as("__m0"))
        .agg(sum(greatest(col("__m0"), lit(0L))).cast(dec).as("__m")))
    bi
      .join(uni.withColumnRenamed("__w", "__w1")
        .withColumnRenamed("__cw", "__cx"), "__w1")
      .join(uni.withColumnRenamed("__w", "__w2")
        .withColumnRenamed("__cw", "__cy"), "__w2")
      .crossJoin(broadcast(tot))
      .select(concat_ws(" ", col("__w1"), col("__w2")).as("bigram"),
        col("__cxy").as("n_pair"), col("__cx").as("n_left"),
        col("__cy").as("n_right"),
        expr("(CAST(__cxy AS DECIMAL(38,0)) * __n * __n" +
          " * CAST(1000000 AS DECIMAL(38,0)))" +
          " div (__m * CAST(__cx AS DECIMAL(38,0))" +
          " * CAST(__cy AS DECIMAL(38,0)))").cast("long").as("lift_ppm"))
      .orderBy(col("lift_ppm").desc, col("bigram"))
      .limit(k)
  }
}
