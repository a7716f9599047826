package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TTLConfig}

/** Ingest-time weighted sampling — `Sampling.weightedSample` as a
  * stream: rows arrive as (group, id, weight); each group keeps the k
  * smallest rational priorities ((id·1000003 + 17) mod 1e9+7 div
  * max(w, 1), ties by id) seen so far in state — exactly k (priority,
  * id, weight) entries per group regardless of stream length (the
  * reservoir contract: state never grows, a heavy item can only REPLACE
  * a weaker one). After every micro-batch the processor re-emits its
  * group's CURRENT sample, rn-tagged in priority order, so a monitor
  * always sees the live sample.
  *
  * Because priorities are deterministic per row, the final emitted
  * sample equals the BATCH `weightedSample` over the union of all
  * batches — arrival order and batch boundaries cannot change the k
  * smallest of a fixed multiset (StreamingSpec pins batch == stream).
  */
class WeightedSampleProcessor(k: Int)
    extends StatefulProcessor[String, (String, Long, Long), (String, Long, Long, Long, Long)] {

  @transient private var entries
      : org.apache.spark.sql.streaming.ListState[SamplingStream.SampleEntry] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    entries = getHandle.getListState[SamplingStream.SampleEntry]("sample",
      Encoders.product[SamplingStream.SampleEntry], TTLConfig.NONE)
  }

  override def handleInputRows(key: String, rows: Iterator[(String, Long, Long)],
      timerValues: org.apache.spark.sql.streaming.TimerValues)
      : Iterator[(String, Long, Long, Long, Long)] = {
    var buf = entries.get().map(e => (e.priority, e.id, e.weight)).toVector
    rows.foreach { case (_, id, w) =>
      // floorMod (not %) so negative ids still hash onto [0, P) — the
      // batch operator's pmod, kept in lockstep
      val pri = math.floorMod(id * 1000003L + 17L, 1000000007L) / math.max(w, 1L)
      buf = (pri, id, w) +: buf
    }
    // dedup BY ID keeping the smallest priority: a re-offered id with a
    // changed weight must never occupy two reservoir slots (the batch
    // operator emits one row per unique id); then keep the k smallest.
    buf = buf.groupBy(_._2).valuesIterator
      .map(_.minBy(e => (e._1, e._3))).toVector
      .sortBy(e => (e._1, e._2)).take(k)
    entries.put(buf.map { case (p, id, w) =>
      SamplingStream.SampleEntry(p, id, w) }.toArray)
    buf.iterator.zipWithIndex.map { case ((p, id, w), i) =>
      (key, i + 1L, id, w, p)
    }
  }
}

object SamplingStream {
  /** One reservoir slot in state. */
  case class SampleEntry(priority: Long, id: Long, weight: Long)

  /** Wire the processor onto a (group, id, weight) stream; after each
    * batch a group re-emits its full current sample as (group, rn, id,
    * weight, priority), smallest priority first.
    */
  def apply(ds: Dataset[(String, Long, Long)], k: Int)
      : Dataset[(String, Long, Long, Long, Long)] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1).transformWithState(new WeightedSampleProcessor(k),
      TimeMode.None(), OutputMode.Append())
  }
}
