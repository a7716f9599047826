package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Experiment (A/B) readouts — conversion rates per variant with
  * Wilson score intervals (Wilson 1927; the interval that behaves at
  * small n and extreme rates where the Wald ±z·se interval collapses
  * or leaves [0,1]) and lift against a named control.
  *
  * Determinism contract: rates and lift are EXACT integer ppm
  * (DECIMAL(38,0) cross products); the Wilson bounds are IEEE doubles
  * computed with one pinned operation order — division, multiplication
  * and sqrt are each correctly-rounded, so two engines evaluating the
  * identical expression tree produce bitwise-identical doubles (the
  * q44/qualityScore house precedent) — then floored to ppm longs so
  * the released numbers are integers.
  */
object Experiment {

  /** z = 1.96 (two-sided 95%) as both engines parse it. */
  private val Z = 1.96

  /** Wilson bounds as floored-ppm (lo, hi) columns from (conv, n)
    * long columns; n must be > 0 (callers aggregate, so every variant
    * row has n ≥ 1).
    */
  private def wilsonPpm(conv: Column, n: Column): (Column, Column) = {
    val nd = n.cast("double")
    val phat = conv.cast("double") / nd
    val z = lit(Z)
    val z2 = z * z
    val denom = lit(1.0) + z2 / nd
    val center = (phat + z2 / (lit(2.0) * nd)) / denom
    val half = z * sqrt(phat * (lit(1.0) - phat) / nd +
      z2 / (lit(4.0) * nd * nd)) / denom
    (floor((center - half) * lit(1000000.0)).cast("long"),
      floor((center + half) * lit(1000000.0)).cast("long"))
  }

  /** JVM twin of the Column-level Wilson bounds — the SAME pinned op
    * order (each step a correctly-rounded IEEE op, so the two forms
    * are bitwise identical; ExperimentSpec pins it). Shared with the
    * ingest-time [[graft.streaming.ExperimentStream]].
    */
  def wilsonPpmRef(conv: Long, n: Long): (Long, Long) = {
    require(n > 0, s"n must be positive, got $n")
    val nd = n.toDouble
    val phat = conv.toDouble / nd
    val z2 = Z * Z
    val denom = 1.0 + z2 / nd
    val center = (phat + z2 / (2.0 * nd)) / denom
    val half = Z * math.sqrt(phat * (1.0 - phat) / nd +
      z2 / (4.0 * nd * nd)) / denom
    (math.floor((center - half) * 1000000.0).toLong,
      math.floor((center + half) * 1000000.0).toLong)
  }

  /** Per-variant conversion readout with lift vs `controlVariant`.
    *
    * Input: one row per EXPERIMENT UNIT (user/session — the caller's
    * dedup responsibility, typically one groupBy(user) upstream) with
    * its variant label and a boolean converted flag. Null variants and
    * null flags drop (an unassigned unit is outside the experiment; an
    * unknown outcome can't count either way).
    *
    * Output per variant: n, conversions, rate_ppm (exact), Wilson 95%
    * [lo, hi] in floored ppm, lift_vs_control_ppm (exact —
    * conv_v·n_c·1e6 div (n_v·conv_c); null for the control itself and
    * when the control never converts), and `significant` — the
    * conservative disjoint-interval call: the variant's Wilson band
    * does not overlap the control's (null for the control row).
    *
    * Scale shape: ONE combinable aggregate to the variant table
    * (bounded by the variant count — hot variants collapse map-side);
    * the control row broadcasts back onto it. The unit table is
    * scanned once.
    */
  def conversionLift(df: DataFrame, variantCol: String,
                     convertedCol: String,
                     controlVariant: String): DataFrame = {
    val dec = "decimal(38,0)"
    val byVariant = df
      .filter(col(variantCol).isNotNull && col(convertedCol).isNotNull)
      .groupBy(col(variantCol).as("variant"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(convertedCol), 1L).otherwise(0L)).as("conversions"))
    val (lo, hi) = wilsonPpm(col("conversions"), col("n"))
    val scored = byVariant.select(col("variant"), col("n"),
      col("conversions"),
      expr("(conversions * 1000000L) div n").as("rate_ppm"),
      lo.as("wilson_lo_ppm"), hi.as("wilson_hi_ppm"))
    // Aggregate (never filter-to-maybe-empty) the control row: a typo'd
    // control label would otherwise cross-join every variant away and
    // silently return an EMPTY readout. The agg always yields one row;
    // assert_true fails the job loudly when no variant matched.
    val control = scored.filter(col("variant") === controlVariant)
      .agg(count(lit(1)).as("__k"),
        max(col("n")).as("__cn"), max(col("conversions")).as("__cc"),
        max(col("wilson_lo_ppm")).as("__clo"),
        max(col("wilson_hi_ppm")).as("__chi"))
    scored.crossJoin(broadcast(control))
      .withColumn("__guard", assert_true(col("__k") === 1L,
        lit(s"conversionLift: control variant '$controlVariant' matched " +
          "no row — check the label")))
      .filter(col("__guard").isNull) // assert_true yields null; keeps rows
      .select(col("variant"), col("n"), col("conversions"),
        col("rate_ppm"), col("wilson_lo_ppm"), col("wilson_hi_ppm"),
        when(col("variant") =!= controlVariant && col("__cc") > 0,
          expr(s"(CAST(conversions AS $dec) * __cn" +
            s" * CAST(1000000 AS $dec)) div (CAST(n AS $dec) * __cc)")
            .cast("long")).as("lift_vs_control_ppm"),
        when(col("variant") =!= controlVariant,
          col("wilson_lo_ppm") > col("__chi") ||
            col("wilson_hi_ppm") < col("__clo")).as("significant"))
  }
}
