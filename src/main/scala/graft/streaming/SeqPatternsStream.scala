package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TTLConfig}

/** Ingest-time twin of the batch level-2 sequential pattern miner
  * ([[graft.operators.SeqPatterns.level2]]): per-entity state is
  * k last-seen timestamps (headed by an alphabet fingerprint slot, so
  * a restart against a checkpoint written by a different alphabet of
  * the same size fails loudly instead of misattributing slots) + k²
  * running min gaps (k = |alphabet| ≤ 16 — BOUNDED per entity, never
  * the event history), and each
  * micro-batch re-emits the post-batch value for every cell it
  * improved (upsert semantics, the HistDriftStream pattern) plus a
  * one-time seen-marker per (entity, type) — the antecedent-support
  * row the rule metrics need. The rule readout is a GLOBAL function
  * of all entities, so it stays reader-side:
  * [[graft.operators.SeqPatterns.rulesFromCells]] over the upserted
  * cell table IS the readout — batch == stream reduces to cell-table
  * equality (StreamingSpec pins parity incl. shuffled within-batch
  * arrival, batch splits, and a checkpoint restart).
  *
  * Why the min-gap recurrence is exact: when b arrives at t, the only
  * NEW candidate pairs end at t, and among a-occurrences before t the
  * LATEST one minimizes t − t_a; pairs ending at earlier b's were
  * already folded in when those b's arrived. So min over
  * (last-seen a, arriving b) candidates equals the batch min over all
  * (a-occurrence, first-b-after) pairs. Same-timestamp events never
  * chain: last-seen updates only after a whole timestamp group is
  * processed, and the strict `t_a < t` guard also covers a timestamp
  * group split across micro-batches.
  *
  * Arrival contract: rows sort by timestamp WITHIN a micro-batch
  * (shuffled intra-batch arrival is free); ACROSS batches the
  * ordered-arrival contract of CusumStream/EwmaStream applies — a
  * late event older than the entity's high-water mark contributes no
  * backdated pairs (measure feed disorder with the q296 watermark
  * advisor first).
  *
  * In rows: (entity, tsUs, type) — pre-filter nulls and off-alphabet
  * types. Out rows: (entity, ante, cons, minGapUs), with
  * cons = "*" marking "ante first seen" (gap 0, unused).
  */
class SeqPatternsCellProcessor(alphabet: Seq[String], ttl: TTLConfig)
    extends StatefulProcessor[String, (String, Long, String),
      (String, String, String, Long)] {

  private val k = alphabet.size
  private val idx = alphabet.zipWithIndex.toMap
  // 64-bit fingerprint of the ORDERED alphabet, persisted as the head
  // slot of the lastSeen state: restored state is only valid for the
  // exact alphabet that wrote it — a restart against a checkpoint from
  // a reordered or substituted alphabet of the same size would
  // otherwise silently misattribute lastSeen/minGap slots to the wrong
  // types (length alone can't tell them apart).
  private val alphFp: Long = {
    var h = 1125899906842597L // FNV-ish seeded polynomial over chars
    for (s <- alphabet) { h = 31 * h + 0; for (c <- s) h = 31 * h + c }
    h
  }

  @transient private var lastSeen: ListState[Long] = _
  @transient private var minGap: ListState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    lastSeen = getHandle.getListState[Long]("lastSeen", Encoders.scalaLong, ttl)
    minGap = getHandle.getListState[Long]("minGap", Encoders.scalaLong, ttl)
  }

  override def handleInputRows(key: String,
      rows: Iterator[(String, Long, String)],
      timerValues: org.apache.spark.sql.streaming.TimerValues):
      Iterator[(String, String, String, Long)] = {
    // State layout: lastSeen = [alphFp, t_0 .. t_{k-1}] (fingerprint
    // head slot), minGap = k² running mins. Empty = fresh entity; any
    // populated state must carry THIS alphabet's fingerprint and the
    // matching lengths — anything else is a checkpoint written by a
    // different alphabet (or corrupt) and must fail, not be silently
    // reinterpreted slot-by-slot.
    val rawLast = lastSeen.get().toArray
    val rawMg = minGap.get().toArray
    val fresh = rawLast.isEmpty && rawMg.isEmpty
    if (!fresh && (rawLast.length != k + 1 || rawLast(0) != alphFp ||
        rawMg.length != k * k))
      throw new IllegalStateException(
        s"SeqPatternsStream state for entity '$key' was written by a " +
          s"different alphabet or is corrupt (expected fingerprint " +
          s"$alphFp with ${k + 1}+${k * k} slots, found " +
          s"${rawLast.length}+${rawMg.length} slots" +
          (if (rawLast.nonEmpty) s", fingerprint ${rawLast(0)}" else "") +
          ") — restart with the checkpoint's original alphabet or a " +
          "fresh checkpoint")
    val last = if (fresh) Array.fill(k)(Long.MinValue) else rawLast.tail
    val mg = if (fresh) Array.fill(k * k)(Long.MaxValue) else rawMg
    val touched = scala.collection.mutable.LinkedHashSet.empty[Int]
    val seenNow = scala.collection.mutable.LinkedHashSet.empty[Int]
    val byTs = rows.toArray.collect {
      case (_, ts, t) if idx.contains(t) => (ts, idx(t))
    }.groupBy(_._1).toSeq.sortBy(_._1)
    for ((ts, group) <- byTs) {
      val types = group.map(_._2).distinct
      // close gaps from strictly-earlier occurrences only (last is
      // not yet updated with this timestamp group)
      for (bi <- types; ai <- 0 until k)
        if (last(ai) != Long.MinValue && last(ai) < ts) {
          val g = ts - last(ai)
          if (g < mg(ai * k + bi)) { mg(ai * k + bi) = g; touched += ai * k + bi }
        }
      for (ti <- types) {
        if (last(ti) == Long.MinValue) seenNow += ti
        if (ts > last(ti)) last(ti) = ts
      }
    }
    lastSeen.clear(); lastSeen.appendValue(alphFp)
    last.foreach(lastSeen.appendValue)
    minGap.clear(); mg.foreach(minGap.appendValue)
    seenNow.iterator.map(ti => (key, alphabet(ti), "*", 0L)) ++
      touched.iterator.map(p =>
        (key, alphabet(p / k), alphabet(p % k), mg(p)))
  }
}

object SeqPatternsStream {
  def cells(ds: Dataset[(String, Long, String)], alphabet: Seq[String],
            ttl: TTLConfig = TTLConfig.NONE):
      Dataset[(String, String, String, Long)] = {
    require(alphabet.nonEmpty && alphabet.size <= 16,
      s"alphabet must be 1..16 types, got ${alphabet.size}")
    require(!alphabet.contains("*"),
      "\"*\" is reserved as the seen-marker sentinel consequent — an " +
        "alphabet containing it would corrupt the rulesFromCells readout")
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1).transformWithState(
      new SeqPatternsCellProcessor(alphabet, ttl), StreamModes.forTtl(ttl),
      OutputMode.Append())
  }
}
