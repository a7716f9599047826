package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Watermark-delay advisor — the measurement behind Structured
  * Streaming's other magic number (`withWatermark("ts", "10 minutes")`):
  * a delay too short silently DROPS late rows from every windowed
  * aggregate; too long holds state and delays emission. The defensible
  * choice comes from the stream's own disorder: replay events in
  * arrival order, track the running event-time high-water mark, and
  * measure each row's LATENESS = highwater − ts (clamped at 0). A
  * candidate delay D then has an exact dropped-row count: rows with
  * lateness > D are the ones a D-delay watermark would discard
  * (Akidau et al. 2015's watermark semantics, measured instead of
  * guessed).
  *
  * Per group (stream/topic/type — watermarks are chosen per stream):
  * total rows, disorder ppm (any lateness > 0), max lateness, and the
  * drop ppm for each candidate delay in a bounded grid — all from ONE
  * arrival-ordered window pass + one conditional aggregate (the q295
  * sweep shape). Exact integers; floored ppm.
  *
  * `arrivalCol` must encode arrival order within each group (an ingest
  * sequence / kafka offset; generation id on synthetic data). Scale
  * shape: the window partitions by group — stream-bounded, not
  * corpus-bounded only when groups are few; for a single hot stream
  * the pass is the same sort a watermark assignment itself pays.
  *
  * Output per group: (groupCol, n_events, disorder_ppm,
  * max_late_micros, drop_ppm_<d> for each delay — null ppm when the
  * group is empty never occurs; groups come from the data).
  */
object Lateness {

  def watermarkAdvisor(df: DataFrame, groupCol: String, arrivalCol: String,
                       tsCol: String,
                       delaysSeconds: Seq[Long]): DataFrame = {
    require(delaysSeconds.nonEmpty && delaysSeconds.forall(_ >= 0),
      s"delaysSeconds must be non-negative, got $delaysSeconds")
    require(delaysSeconds.size <= 64, "bounded grid: at most 64 delays")
    val base = df
      .filter(col(groupCol).isNotNull && col(arrivalCol).isNotNull &&
        col(tsCol).isNotNull)
      .select(col(groupCol), col(arrivalCol).as("__arr"),
        unix_micros(col(tsCol)).as("__us"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("__arr"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val late = base
      .withColumn("__late",
        greatest(coalesce(max(col("__us")).over(w) - col("__us"), lit(0L)),
          lit(0L)))
    val delayAggs = delaysSeconds.map { d =>
      sum(when(col("__late") > d * 1000000L, 1L).otherwise(0L))
        .as(s"__d_$d")
    }
    val ag = late.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n_events"),
      (Seq(sum(when(col("__late") > 0L, 1L).otherwise(0L)).as("__nl"),
        max(col("__late")).as("max_late_micros")) ++ delayAggs): _*)
    ag.select(
      col(groupCol) +: col("n_events") +:
        expr("(__nl * 1000000L) div n_events").as("disorder_ppm") +:
        col("max_late_micros") +:
        delaysSeconds.map(d =>
          expr(s"(__d_$d * 1000000L) div n_events").as(s"drop_ppm_$d")): _*)
  }
}
