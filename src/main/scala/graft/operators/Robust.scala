package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust (median/MAD) outlier statistics — the distribution-free
  * complement to the mean-based monitors: q218's CUSUM detects a LEVEL
  * SHIFT in a series, the MAD fence flags INDIVIDUAL rows whose value is
  * wildly off for their group, with a breakdown point of 50% (a mean/
  * stddev z-score is itself dragged by the outliers it is supposed to
  * find — one corrupt feed day can hide itself; the median/MAD pair
  * cannot be moved until half the data is corrupt).
  */
object Robust {

  /** Per-group robust outlier fence: |x − median| > k · MAD, where MAD is
    * the median absolute deviation (Hampel's rule; k ≈ 5 corresponds to
    * ~3.4 sigma under normality via the 1.4826 consistency factor — the
    * factor is deliberately NOT applied, k is the knob).
    *
    * Exactness: values enter as integer units (cents — the caller casts
    * via DECIMAL(18,2)·100, the house double→exact rule), both medians are
    * exact distributed PERCENTILE_DISC (rank ceil(n/2) — the q65-pinned
    * DuckDB quantile_disc parity), deviations/fences are integer
    * arithmetic carried in longs. Strict `>` so a group with MAD 0 flags
    * every value off the median, and a constant group flags nothing.
    *
    * Scale shape: two [[Percentiles.percentileDisc]] passes (each
    * range-partitions values with per-task bounded memory — never a
    * whole-group buffer on one reducer) + equi-joins of the corpus
    * against the bounded per-group median tables + one final combinable
    * aggregate. No windows, no cross products.
    *
    * Output per group: (groupCol, n, median, mad, n_outliers, out_ppm).
    */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
                  k: Long = 5L): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val base = df.filter(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).as("__g"), col(valueCol).cast("long").as("__v"))
    val med = Percentiles.percentileDisc(base, "__g", "__v", Seq(0.5))
      .select(col("__g"), col("value").cast("long").as("__med"))
    val dev = base.join(med, "__g")
      .withColumn("__dev", abs(col("__v") - col("__med")))
    val mad = Percentiles.percentileDisc(
        dev.select(col("__g"), col("__dev")), "__g", "__dev", Seq(0.5))
      .select(col("__g"), col("value").cast("long").as("__mad"))
    dev.join(mad, "__g")
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("n"),
        max(col("__med")).as("median"),
        max(col("__mad")).as("mad"),
        sum(when(col("__dev") > col("__mad") * k, 1L).otherwise(0L))
          .as("n_outliers"))
      .select(col("__g").as(groupCol), col("n"), col("median"), col("mad"),
        col("n_outliers"),
        expr("(n_outliers * 1000000) div n").as("out_ppm"))
  }
}
