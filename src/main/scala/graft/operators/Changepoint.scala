package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-point detection over per-key tick series — one-sided CUSUM
  * (Page 1954, "Continuous inspection schemes"): the monitoring op a
  * pipeline runs over ingest-rate / quality-rate series to catch upward
  * level shifts that per-tick thresholds miss (each tick looks normal;
  * the cumulative drift does not).
  *
  * The classic recurrence S_t = max(0, S_{t-1} + (x_t − μ − k)) is not
  * a combinable aggregate, but it has a closed form over prefix sums:
  * S_t = P_t − min(0, min_{j≤t} P_j) with P the prefix sum of
  * deviations — two window passes, no sequential driver loop. All
  * arithmetic is EXACT: deviations are scaled to integer units of
  * 10⁻⁶·(per-key mean) — d_t = x_t·N·10⁶ − tot·(10⁶ + slackPpm) — and
  * run in DECIMAL(38,0) (the t-closeness rule: at 10¹² events the
  * 10⁶·N·x products pass a long).
  *
  * Scale shape: the tick series is CALENDAR-bounded (ticks per key =
  * time range / step, independent of event volume), so the per-key
  * windows run over bounded partitions; the raw corpus is touched only
  * by the one groupBy that builds the series. Baseline μ is the
  * per-key series mean (two bounded aggregates + one join).
  *
  * @param slackPpm  the CUSUM allowance k as ppm of the per-key mean
  *                  (classic k = δ/2 for a target shift δ)
  * @param hMeanTicksPpm alarm threshold as ppm of ONE MEAN-TICK of
  *                  cumulative excess (2·10⁶ = alarm after ~2 mean
  *                  ticks' worth of excess mass)
  *
  * Output: keyCols + (tick, x, cusum_ppm — S_t in ppm of a mean tick,
  * floor division — and alarm, compared exactly, never through the
  * floored ppm).
  *
  * Caveats: (key, tick) must be unique (true for [[tickCounts]]); ticks
  * with NO observations are absent from the series, so a rate DROP is
  * invisible to this one-sided form — zero-fill via
  * [[Resample.locfGrid]]-style gridding first if empty ticks matter.
  */
object Changepoint {

  def cusumShift(series: DataFrame, keyCols: Seq[String], tickCol: String,
                 valueCol: String, slackPpm: Long,
                 hMeanTicksPpm: Long): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(slackPpm >= 0, s"slackPpm must be >= 0, got $slackPpm")
    require(hMeanTicksPpm > 0, s"hMeanTicksPpm must be > 0, got $hMeanTicksPpm")
    val dec = "decimal(38,0)"
    val st = series.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).cast(dec).as("__nt"),
        sum(col(valueCol)).cast(dec).as("__tot"))
    // ppm-of-mean units presuppose a positive per-key mean: a zero or
    // negative total would null the ppm division and invert the alarm
    // threshold's sign — fail loudly in-plan instead (the bounded key
    // table pays the check, not the corpus)
    val stChecked = st.withColumn("__tot",
      when(col("__tot") > 0, col("__tot")).otherwise(raise_error(concat(
        lit("cusumShift needs a positive per-key value total, got "),
        col("__tot").cast("string")))))
    val d = series.join(stChecked, keyCols)
      .withColumn("__d",
        (col(valueCol).cast(dec) * col("__nt") * lit(1000000L).cast(dec) -
          col("__tot") * lit(1000000L + slackPpm).cast(dec)).cast(dec))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tickCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val s = d
      .withColumn("__p", sum(col("__d")).over(w))
      .withColumn("__s",
        col("__p") - least(lit(0).cast(dec), min(col("__p")).over(w)))
    s.select(keyCols.map(col) ++ Seq(
      col(tickCol), col(valueCol),
      expr(s"__s div __tot").cast("long").as("cusum_ppm"),
      (col("__s") > lit(hMeanTicksPpm).cast(dec) * col("__tot")).as("alarm")): _*)
  }

  /** Convenience: per-key fixed-step tick counts from raw events —
    * the series builder feeding [[cusumShift]] (one corpus aggregate).
    */
  def tickCounts(events: DataFrame, keyCols: Seq[String], tsCol: String,
                 stepSeconds: Long): DataFrame = {
    require(stepSeconds > 0)
    events
      .withColumn("tick",
        timestamp_seconds(floor(unix_timestamp(col(tsCol)) / stepSeconds)
          * stepSeconds))
      .groupBy(keyCols.map(col) :+ col("tick"): _*)
      .agg(count(lit(1)).as("n"))
  }
}
