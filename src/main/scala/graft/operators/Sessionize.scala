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

  /** Event-level sessionization: LABEL every event with its per-key
    * session sequence number (1, 2, ...) — the lag/running-sum classic.
    * Where [[session]] aggregates sessions away, this keeps the events
    * (per-session feature pipelines join on the label). A new session
    * starts when the gap to the previous event EXCEEDS `gapMicros`
    * (<= gap continues — matching `session_window`'s inclusive-gap merge
    * semantics). `tieBreak` totalizes the ordering under duplicate
    * timestamps so labels are deterministic. One window over (key, ts)
    * — the partitionBy exchange is the only shuffle.
    */
  def withSessionIds(df: DataFrame, keyCol: String, tsCol: String,
                     gapMicros: Long, tieBreak: String): DataFrame = {
    import org.apache.spark.sql.expressions.{Window => W}
    val w = W.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieBreak))
    val prev = lag(col(tsCol), 1).over(w)
    val isNew = when(prev.isNull ||
      unix_micros(col(tsCol)) - unix_micros(prev) > gapMicros, 1L).otherwise(0L)
    df.withColumn("session_seq",
      sum(isNew).over(w.rowsBetween(W.unboundedPreceding, W.currentRow)))
  }
}
