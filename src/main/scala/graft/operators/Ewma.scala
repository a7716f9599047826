package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EWMA control chart (Roberts 1959; Hunter 1986; NIST/SEMATECH 6.3.2.4)
  * over per-key tick series — the SMOOTHED deviation monitor between the
  * two existing alarm shapes: per-tick z-bands (q253) fire on single
  * spikes and forgive persistent small drift; CUSUM (q218) accumulates
  * forever and is tuned for one level shift. The EWMA statistic
  * s_t = α·x_t + (1−α)·s_{t−1} forgets geometrically, so it catches a
  * sustained 1-2σ drift within a few ticks and then re-arms itself.
  *
  * Exactness: α is pinned to 1/2 (half the weight on the newest point —
  * the aggressive-smoothing end of Hunter's 0.05–0.5 band), and the
  * geometric tail is TRUNCATED at `memory` lags and renormalized, which
  * makes the statistic an exact rational with a power-of-two-minus-one
  * denominator:
  *
  *   s_t = Σ_{i=0..m} x_{t−i}·2^(m−i) / (2^(m+1) − 1),   m = min(t, memory−1)
  *
  * (at memory = 8 the dropped tail carries 2⁻⁸ < 0.4% of the weight).
  * Numerator and denominator stay integers; ewma_milli is their floored
  * milli quotient. The alarm compares exactly, never through the floored
  * ratio: with μ = tot/n, σ² = (n·Σx² − tot²)/n² the per-key TRAINED
  * baseline (the whole series, the q253 convention) and the steady-state
  * EWMA variance σ²·α/(2−α) = σ²/3 at α = 1/2, |s_t − μ| > L·σ/√3 cross-
  * multiplies to the all-integer
  *
  *   3·(num·n − tot·D)² > L²·D²·(n·Σx² − tot²),   D = 2^(m+1) − 1
  *
  * evaluated in DECIMAL(38,0) (a 1e12-count tick at memory 8 leaves the
  * squared term < 1e31 — comfortable headroom). The headroom is NOT a
  * static require (it depends on the data's tick magnitudes, which a
  * require can't see without an extra pass); instead the alarm is
  * guarded IN-PLAN: the contract makes every operand non-null, so a
  * null on either side of the comparison can only mean DECIMAL(38,0)
  * overflow, and the plan raises rather than silently emitting a null
  * alarm (Spark's non-ANSI decimal overflow nulls where DuckDB's
  * HUGEINT stays exact — the guard turns that silent cross-engine
  * divergence into a loud failure).
  *
  * Scale shape: identical to [[Changepoint.cusumShift]] — the tick series
  * is CALENDAR-bounded, so the lag window and the alarm join run over
  * bounded per-key partitions; the raw corpus pays only the groupBy that
  * built the series (e.g. [[Changepoint.tickCounts]]).
  *
  * Caveats: (key, tick) must be unique with non-null, NON-NEGATIVE
  * values (true for tick counts); absent ticks are absent from the
  * smoothing — zero-fill via the LOCF grid first if silence must pull
  * the average down.
  *
  * Output: keyCols + (tick, x, ewma_milli, alarm).
  */
object Ewma {

  def controlChart(series: DataFrame, keyCols: Seq[String], tickCol: String,
                   valueCol: String, memory: Int = 8, l: Int = 3): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(memory >= 2 && memory <= 16,
      s"memory must be in [2,16], got $memory")
    require(l >= 1 && l <= 6, s"l must be in [1,6], got $l")
    val dec = "decimal(38,0)"
    val stats = series.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).cast(dec).as("__n"),
        sum(col(valueCol)).cast(dec).as("__tot"),
        sum(expr(s"CAST($valueCol AS $dec) * $valueCol")).as("__sx2"))
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(tickCol))
    // m = how many lagged points exist, capped at memory−1; for i ≤ m the
    // lag is inside the partition, so the coalesce only ever zero-fills
    // the weights the cap itself excluded.
    val lagged = series
      .withColumn("__m",
        least(row_number().over(w).cast("int") - 1, lit(memory - 1)))
      .withColumn("__num",
        (0 until memory).map { i =>
          val x = if (i == 0) col(valueCol) else lag(col(valueCol), i).over(w)
          coalesce(
            when(lit(i) <= col("__m"),
              x.cast(dec) * expr(s"CAST(shiftleft(CAST(1 AS BIGINT), __m - $i) AS $dec)")),
            lit(0).cast(dec))
        }.reduce(_ + _))
      .withColumn("__d",
        expr(s"CAST(shiftleft(CAST(1 AS BIGINT), __m + 1) - 1 AS $dec)"))
    val joined = lagged.join(stats, keyCols)
      .withColumn("__delta",
        (col("__num") * col("__n") - col("__tot") * col("__d")).cast(dec))
    // Overflow guard: inputs are non-null by contract, so a null side
    // here can only be DECIMAL(38,0) overflow — raise, don't emit a
    // silently-null alarm (see scaladoc headroom note).
    val lhs = lit(3).cast(dec) * col("__delta") * col("__delta")
    val rhs = lit(l.toLong * l).cast(dec) * col("__d") * col("__d") *
      (col("__n") * col("__sx2") - col("__tot") * col("__tot"))
    val alarm = when(lhs.isNull || rhs.isNull,
      raise_error(lit("ewma alarm: DECIMAL(38,0) overflow in the " +
        "cross-multiplied band comparison")).cast("boolean"))
      .otherwise(lhs > rhs)
    joined.select(keyCols.map(col) ++ Seq(
      col(tickCol), col(valueCol),
      expr(s"(CAST(1000 AS $dec) * __num) div __d").cast("long")
        .as("ewma_milli"),
      alarm.as("alarm")): _*)
  }
}
