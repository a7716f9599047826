package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Seasonal-baseline anomaly detection — the monitoring op between
  * [[Changepoint]] (persistent level shifts) and [[Robust]] (static
  * fences): event-rate series have a DAILY SHAPE, and a global fence
  * either fires every rush hour or sleeps through a quiet-hour spike.
  * The seasonal profile is the per-(key, hour-of-day) MEDIAN of the
  * hourly counts (seasonal-naive baseline, 50%-breakdown like q225's
  * fence), and a tick is anomalous when it leaves the Hampel band of
  * ITS OWN hour-of-day: |n − med(key,hod)| > k · MAD(key,hod), strict
  * (a constant profile flags nothing; MAD 0 flags every off-median
  * tick — the [[Robust.madOutliers]] rules).
  */
object Seasonal {

  /** Hour-of-day anomaly flags over per-key hourly event counts.
    *
    * Exact arithmetic throughout: ticks are epoch hours
    * (unix_micros div 3600e6 — the q249 ceiling family), counts are
    * longs, both medians come from the distributed exact
    * PERCENTILE_DISC ladder (even counts take the lower middle — the
    * q225 rule both engines replay).
    *
    * Gappy-series caveat (the [[Changepoint.cusumShift]] note): hours
    * with NO events produce no tick row and therefore don't enter the
    * profile — right for "is this observed hour abnormal for its slot",
    * but a zeros-are-signal monitor should zero-fill against a
    * calendar grid first (the q212 locfGrid recipe) so silent hours
    * drag the median down.
    *
    * Scale shape: ONE corpus aggregate to the (key, tick) count table
    * (calendar-bounded — keys × hours, never event-volume); both
    * percentile passes and the flag join run on that bounded table and
    * its (key, hod) rollup. The corpus is scanned once.
    *
    * Output: (keyCol, tick_hour, hod, n, med, mad, is_anomaly),
    * one row per OBSERVED (key, hour) tick.
    */
  def hourOfDayAnomalies(df: DataFrame, keyCol: String, tsCol: String,
                         k: Long = 3L): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val ticks = df
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol).as("__k"),
        expr(s"unix_micros($tsCol) div ${3600L * 1000000L}L").as("__t"))
      .groupBy(col("__k"), col("__t"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__hod", pmod(col("__t"), lit(24L)))
    // composite (key, hod) shadow group for the exact-percentile ladder
    val grouped = ticks.select(
      concat_ws("/", col("__k").cast("string"), col("__hod").cast("string"))
        .as("__g"), col("__k"), col("__t"), col("__hod"), col("__n"))
    val med = Percentiles.percentileDisc(
        grouped.select(col("__g"), col("__n").as("__v")), "__g", "__v",
        Seq(0.5))
      .select(col("__g"), col("value").cast("long").as("__med"))
    val dev = grouped.join(med, "__g")
      .withColumn("__dev", abs(col("__n") - col("__med")))
    val mad = Percentiles.percentileDisc(
        dev.select(col("__g"), col("__dev").as("__v")), "__g", "__v",
        Seq(0.5))
      .select(col("__g"), col("value").cast("long").as("__mad"))
    dev.join(mad, "__g")
      .select(col("__k").as(keyCol), col("__t").as("tick_hour"),
        col("__hod").as("hod"), col("__n").as("n"),
        col("__med").as("med"), col("__mad").as("mad"),
        (col("__dev") > col("__mad") * k).as("is_anomaly"))
  }
}
