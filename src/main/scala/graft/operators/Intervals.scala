package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sweep-line aggregation over validity intervals — the occupancy
  * question every interval table eventually gets asked: how many
  * versions/sessions/reservations were OPEN at time t? A join against
  * a time grid re-scans the intervals per tick; the sweep line turns
  * each interval into two boundary deltas and the curve into a prefix
  * sum — one pass, no grid join.
  */
object Intervals {

  /** Hourly concurrency curve: for each hour tick H (epoch hours) where
    * the count changes, the number of intervals with from ≤ H < to
    * (open intervals — null `to` — count forever). Each interval emits
    * +1 at its first covered tick ⌈from⌉ and −1 at ⌈to⌉ (both exact
    * integer ceilings in micros, so a boundary timestamp lands
    * identically in every engine); the curve is the running sum over
    * the CHANGE ticks — a step function, LOCF-readable between rows.
    *
    * Scale shape: one narrow pass to the boundary deltas, one
    * aggregate to the per-tick delta table (calendar-bounded — hours
    * since epoch, not data-sized), then the house two-phase cumsum
    * (in-day window partitioned by the day, day offsets over the
    * aggregate-bounded day table). The interval table is scanned once
    * and never joined against a grid.
    *
    * Null policy: a null `to` means open-forever (+1, no −1); a null
    * `from` means the interval never validly opened — the whole row is
    * dropped, INCLUDING its `to` boundary (emitting only the −1 would
    * drive the curve negative).
    *
    * Output: (tick_hour, delta, n_open), change ticks only, ordered
    * consumers LOCF between them.
    */
  def hourlyCoverage(df: DataFrame, fromCol: String,
                     toCol: String): DataFrame = {
    val b = 3600L * 1000000L
    def ceilTick(c: String) =
      expr(s"(unix_micros($c) + ${b - 1}L) div ${b}L")
    // Both legs filter on the SAME validity predicate (fromCol
    // non-null): a null-from/non-null-to row is malformed — it has no
    // well-defined open point — and is dropped ENTIRELY. Filtering the
    // -1 leg on toCol alone would emit its close delta without the
    // matching open and skew the running sum negative.
    val valid = df.filter(col(fromCol).isNotNull)
    val deltas = valid
      .select(ceilTick(fromCol).as("__tick"), lit(1L).as("__d"))
      .unionAll(valid.filter(col(toCol).isNotNull)
        .select(ceilTick(toCol).as("__tick"), lit(-1L).as("__d")))
    val byTick = deltas.groupBy(col("__tick"))
      .agg(sum(col("__d")).as("delta"))
      .filter(col("delta") =!= 0)
    val wIn = Window.partitionBy(col("__day")).orderBy(col("__tick"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wOff = Window.orderBy(col("__day"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val inDay = byTick.withColumn("__day", expr("__tick div 24"))
      .withColumn("__run", sum(col("delta")).over(wIn))
    val offsets = inDay.groupBy(col("__day"))
      .agg(sum(col("delta")).as("__dsum"))
      .withColumn("__off",
        coalesce(sum(col("__dsum")).over(wOff), lit(0L)))
      .select(col("__day"), col("__off"))
    inDay.join(offsets, "__day")
      .select(col("__tick").as("tick_hour"), col("delta"),
        (col("__run") + col("__off")).as("n_open"))
  }
}
