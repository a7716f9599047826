package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robust trend estimation — Theil–Sen (Theil 1950; Sen 1968): the
  * slope of a series as the MEDIAN of all pairwise slopes, with the
  * same 29%-contamination breakdown logic that makes [[Robust]]'s MAD
  * fence survive the outliers a least-squares line chases. The
  * monitoring complement of [[Changepoint]] (is the level DRIFTING,
  * vs did it SHIFT) and [[Seasonal]] (is this tick abnormal).
  */
object Trend {

  /** Per-key Theil–Sen slope over an integer series.
    *
    * Input: one row per (key, x, y) POINT — typically the per-key tick
    * series from [[Changepoint.tickCounts]], so x is an epoch
    * hour/day and y a count or cents value; duplicate x within a key
    * is a contract violation there too (collapse first — a vertical
    * pair has no slope). Slopes are exact truncated ppm:
    * slope_ppm = (y2 − y1)·1e6 div (x2 − x1) over every pair
    * x1 < x2 — SQL `div` truncation toward zero, which DuckDB's `//`
    * matches on negative numerators too (measured: (−7)//2 = −3), so
    * falling slopes replay identically — and the estimate is the
    * exact PERCENTILE_DISC median
    * (lower middle on even counts — the q225 rule).
    *
    * Scale shape: one corpus aggregate builds the series (the caller's
    * job); the pair join is per-key series² — CALENDAR-bounded (a
    * 30-day hourly window is 720 points → ≤ 259k pairs per key,
    * INDEPENDENT of corpus row count), keyed on the series key so
    * pairs never cross keys. The median runs on the pair table.
    *
    * Output: (keyCol, n_points, n_pairs, slope_ppm) — keys with a
    * single point emit no row (no pair, no slope).
    */
  def theilSen(df: DataFrame, keyCol: String, xCol: String,
               yCol: String): DataFrame = {
    val pts = df
      .filter(col(keyCol).isNotNull && col(xCol).isNotNull &&
        col(yCol).isNotNull)
      .select(col(keyCol).as("__k"), col(xCol).cast("long").as("__x"),
        col(yCol).cast("long").as("__y"))
    val pairs = pts.as("a")
      .join(pts.as("b"), col("a.__k") === col("b.__k") &&
        col("a.__x") < col("b.__x"))
      .select(col("a.__k").as("__k"),
        ((col("b.__y") - col("a.__y")) * 1000000L).as("__dy"),
        (col("b.__x") - col("a.__x")).as("__dx"))
      .select(col("__k"), expr("__dy div __dx").as("__s"))
    val med = Percentiles.percentileDisc(
        pairs.select(col("__k").as("__g"), col("__s").as("__v")),
        "__g", "__v", Seq(0.5))
      .select(col("__g").as("__k"), col("value").cast("long").as("slope_ppm"))
    val counts = pts.groupBy(col("__k")).agg(count(lit(1)).as("n_points"))
    counts
      .join(pairs.groupBy(col("__k")).agg(count(lit(1)).as("n_pairs")), "__k")
      .join(med, "__k")
      .select(col("__k").as(keyCol), col("n_points"), col("n_pairs"),
        col("slope_ppm"))
  }
}
