package graft.streaming

import scala.collection.mutable.ArrayBuffer

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode}

/** Streaming near-duplicate detection — the incremental form of the batch
  * MinHash-LSH pipeline (operators.Dedup), for "is this incoming document a
  * near-dup of anything we've already ingested?" at ingest time.
  *
  * Shape: each record's MinHash signature and band keys are computed
  * NARROWLY ([[Dedup.minhashSignatureCol]] — no aggregation, so it composes
  * with append-mode streaming), records explode to one row per band, and a
  * transformWithState processor keyed by band key holds the doc ids seen in
  * that bucket (ListState). A new arrival emits one candidate pair per
  * bucket-mate; exact-Jaccard verification of candidates stays a
  * downstream/batch concern, as in the batch pipeline.
  *
  * State hygiene at scale:
  *  - per-bucket membership is capped (`maxPerBucket`) so a degenerate
  *    bucket (boilerplate text) cannot grow state without bound — beyond
  *    the cap new arrivals still emit pairs against the stored sample but
  *    are not stored;
  *  - a TTL (`ttl`) expires bucket entries so state tracks the recent
  *    corpus, not all history (RocksDB-backed, per state API v2).
  */
object NearDupStream {

  case class BandDoc(band: String, docId: Long)
  case class CandidatePair(idA: Long, idB: Long, band: String)

  class BandBucketProcessor(maxPerBucket: Int, ttl: TTLConfig)
      extends StatefulProcessor[String, BandDoc, CandidatePair] {
    @transient private var seen: ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getListState[Long]("seen", Encoders.scalaLong, ttl)

    override def handleInputRows(band: String, rows: Iterator[BandDoc],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[CandidatePair] = {
      val stored = ArrayBuffer.empty[Long]
      seen.get().foreach(stored += _)
      val out = ArrayBuffer.empty[CandidatePair]
      rows.foreach { r =>
        stored.foreach { prev =>
          if (prev != r.docId)
            out += CandidatePair(math.min(prev, r.docId), math.max(prev, r.docId), band)
        }
        if (stored.length < maxPerBucket) {
          stored += r.docId
          seen.appendValue(r.docId)
        }
      }
      out.iterator
    }
  }

  /** Wire the banded processor onto a streaming (or batch) document frame.
    * Emits candidate pairs in Append mode; duplicates across bands are
    * possible by construction (same as the batch LSH candidate set before
    * its `distinct`) — deduplicate downstream where needed.
    */
  def candidates(docs: DataFrame, idCol: String, textCol: String,
                 numHashes: Int = 8, rowsPerBand: Int = 2, k: Int = 3,
                 maxPerBucket: Int = 64,
                 ttl: TTLConfig = TTLConfig.NONE): Dataset[CandidatePair] = {
    import docs.sparkSession.implicits._
    val sig = Dedup.minhashSignatureCol(col(textCol), numHashes, k)
    docs
      .filter(size(split(col(textCol), " ")) >= k)
      .select(
        explode(Dedup.bandKeysCol(sig, numHashes, rowsPerBand)).as("band"),
        col(idCol).cast("long").as("docId"))
      .as[BandDoc]
      .groupByKey(_.band)
      .transformWithState(new BandBucketProcessor(maxPerBucket, ttl),
        TimeMode.None(), OutputMode.Append())
  }
}
