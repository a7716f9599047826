package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming stateful operators (SURVEY.md §2 B12-B14).
  *
  * These wrap the engine's streaming primitives with the state hygiene a
  * 100 TB deployment needs: every stateful op is watermark-bounded so the
  * state store cannot grow without limit, and session state uses event-time
  * timeouts, not wall-clock.
  */
object StreamOps {

  /** Watermarked streaming dedup: exactly the batch `dropDuplicates`
    * semantics, with state expiry at the watermark — state is O(keys within
    * the watermark horizon), not O(history).
    */
  def dedupWithinWatermark(df: DataFrame, tsCol: String, watermark: String,
                           keys: Seq[String]): DataFrame =
    df.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** Watermarked tumbling-window aggregation (append-mode compatible). */
  def windowedAgg(df: DataFrame, tsCol: String, watermark: String,
                  width: String, keys: Seq[String],
                  aggs: Seq[org.apache.spark.sql.Column]): DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy((window(col(tsCol), width) +: keys.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Typed running session state via mapGroupsWithState — the arbitrary-
    * state escape hatch (reference has no analog; its only state is the
    * Kafka offset). Event-time timeout closes sessions at the watermark.
    */
  case class SessionInput(userId: Long, ts: java.sql.Timestamp, value: Double)
  case class SessionState(nEvents: Long, sum: Double, startMs: Long, lastMs: Long)
  case class SessionOutput(userId: Long, nEvents: Long, sum: Double,
                           startMs: Long, endMs: Long, closed: Boolean)

  def runningSessions(events: Dataset[SessionInput], gapMs: Long): Dataset[SessionOutput] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.userId)
      .mapGroupsWithState[SessionState, SessionOutput](GroupStateTimeout.EventTimeTimeout) {
        (userId, batch, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            SessionOutput(userId, s.nEvents, s.sum, s.startMs, s.lastMs + gapMs, closed = true)
          } else {
            val sorted = batch.toSeq.sortBy(_.ts.getTime)
            val init = state.getOption
            val s = sorted.foldLeft(init) {
              case (None, e) =>
                Some(SessionState(1L, e.value, e.ts.getTime, e.ts.getTime))
              case (Some(st), e) if e.ts.getTime - st.lastMs < gapMs =>
                Some(st.copy(nEvents = st.nEvents + 1, sum = st.sum + e.value,
                  lastMs = e.ts.getTime))
              case (Some(_), e) => // gap exceeded: restart session
                Some(SessionState(1L, e.value, e.ts.getTime, e.ts.getTime))
            }.get
            state.update(s)
            state.setTimeoutTimestamp(s.lastMs + gapMs)
            SessionOutput(userId, s.nEvents, s.sum, s.startMs, s.lastMs, closed = false)
          }
      }
  }

  /** Stream-stream interval join with watermarks on both sides — the
    * bounded-state form of B14's stream-stream join.
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   leftTs: String, rightTs: String, key: String,
                   watermark: String, within: String): DataFrame = {
    val l = left.withWatermark(leftTs, watermark).as("l")
    val r = right.withWatermark(rightTs, watermark).as("r")
    l.join(r, expr(
      s"l.$key = r.$key AND r.$rightTs >= l.$leftTs AND " +
        s"r.$rightTs <= l.$leftTs + interval $within"))
  }
}
