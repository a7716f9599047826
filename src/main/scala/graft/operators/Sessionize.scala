package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time windowing wrappers. These work identically in batch and
  * Structured Streaming (the same `window`/`session_window` expressions);
  * streaming callers add `withWatermark` upstream (see
  * graft.streaming.StreamOps).
  */
object Windows {

  /** Tumbling window aggregation keyed by window start. */
  def tumbling(df: DataFrame, tsCol: String, width: String,
               keys: Seq[String], aggs: Seq[Column]): DataFrame =
    df.groupBy((window(col(tsCol), width) +: keys.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("window.start"))
      .withColumn("window_end", col("window.end"))
      .drop("window")

  /** Sliding window aggregation (width, slide). */
  def sliding(df: DataFrame, tsCol: String, width: String, slide: String,
              keys: Seq[String], aggs: Seq[Column]): DataFrame =
    df.groupBy((window(col(tsCol), width, slide) +: keys.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("window.start"))
      .withColumn("window_end", col("window.end"))
      .drop("window")

  /** Session windows with a fixed inactivity gap. Two consecutive events
    * belong to the same session iff their time difference is <= `gap`:
    * Spark merges [ts, ts+gap) intervals that overlap *or abut*, so an
    * exact-gap successor extends the session (verified in OperatorsSpec).
    */
  def session(df: DataFrame, tsCol: String, gap: String,
              keys: Seq[String], aggs: Seq[Column]): DataFrame =
    df.groupBy((session_window(col(tsCol), gap) +: keys.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("session_start", col("session_window.start"))
      .withColumn("session_end", col("session_window.end"))
      .drop("session_window")
}
