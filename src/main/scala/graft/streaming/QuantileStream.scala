package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TTLConfig}

import graft.functions.expressions.QuantileSketchAgg

/** Ingest-time quantiles — the [[QuantileSketchAgg]] summary as stream
  * state, for "what do p50/p95/p99 document length look like RIGHT NOW
  * on this shard?" distribution monitoring without any rescan. One
  * summary per shard in state (≤ k·levels doubles regardless of stream
  * length — levels grow as log2(n/k)); every micro-batch folds its rows
  * in with the IDENTICAL deterministic compaction the batch aggregate
  * applies ([[QuantileSketchAgg.Sketch]], shared class) and re-emits
  * the shard's current estimates.
  *
  * The cross-shard merged view stays batch-side (summaries are
  * mergeable — ship the state snapshots and [[QuantileSketchAgg]] them,
  * the q108 two-phase contract), and the rank-error guarantee
  * 2·(levels+1)·n/k holds for ANY merge/arrival order, which is what
  * the spec pins (estimates are order-dependent; the guarantee is not).
  */
class QuantileSketchProcessor(k: Int, quantiles: Seq[Double])
    extends StatefulProcessor[Long, (Long, Double), (Long, Double, Double, Long)] {

  @transient private var state
      : org.apache.spark.sql.streaming.ValueState[Array[Byte]] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    state = getHandle.getValueState[Array[Byte]]("sketch", Encoders.BINARY,
      TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[(Long, Double)],
      timerValues: org.apache.spark.sql.streaming.TimerValues)
      : Iterator[(Long, Double, Double, Long)] = {
    val sk = if (state.exists()) QuantileSketchAgg.fromBytes(state.get(), k)
             else new QuantileSketchAgg.Sketch(k)
    rows.foreach { case (_, v) => sk.add(v) }
    state.update(QuantileSketchAgg.toBytes(sk))
    if (sk.n == 0L) Iterator.empty
    else quantiles.iterator.map(q => (key, q, sk.quantile(q), sk.n))
  }
}

object QuantileStream {

  /** Wire the processor onto a (shard, value) stream; after each batch a
    * shard re-emits (shard, p, est, n) for every requested quantile.
    */
  def apply(ds: Dataset[(Long, Double)], k: Int, quantiles: Seq[Double])
      : Dataset[(Long, Double, Double, Long)] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1).transformWithState(
      new QuantileSketchProcessor(k, quantiles),
      TimeMode.None(), OutputMode.Append())
  }
}
