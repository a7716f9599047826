package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recency-weighted frequency — the freshness signal quota and
  * trending systems need: yesterday's thousand events should outrank
  * last year's ten thousand. The standard exponential decay
  * w = 2^(−age/halfLife) is float arithmetic engines disagree on; here
  * age quantizes to whole half-lives (the bucket an event's timestamp
  * falls in, counted back from the anchor) and the weight becomes an
  * integer RIGHT SHIFT of the bucket count — exact, mergeable
  * (bucket counts are plain partial aggregates), and replayable bit
  * for bit in any engine.
  */
object Decay {

  /** Per-key half-life–decayed count:
    * decayed = Σ_b count(b) >> age_b over CALENDAR buckets of
    * `halfLifeDays` (bucket = ts div width, age = anchor's bucket −
    * event's bucket) — grid-aligned like the day/week partitions a
    * pipeline already writes, and the exact form the streaming twin
    * ([[graft.streaming.DecayStream]]) can maintain incrementally: a
    * bucket histogram re-ages under an advancing anchor by pure
    * arithmetic, where difference-from-anchor ages would need the raw
    * timestamp multiset. Events after the anchor clamp to age 0
    * rather than amplify; ages ≥ 63 shift to zero and are dropped.
    * Also reports the raw count and the freshness ratio decayed·1e6
    * div raw — 1e6 means everything happened within the newest
    * half-life, →0 as the history goes stale. Post-epoch timestamps
    * (both engines' integer division truncates toward zero).
    *
    * Scale shape: one corpus aggregate to the (key, age) bucket table
    * (hot keys combine map-side; ages are calendar-bounded), one
    * key-sized re-aggregate. The corpus is scanned once and never
    * rejoined.
    *
    * Output: (keyCol, n_events, decayed_weight, freshness_ppm).
    */
  def halfLifeCounts(events: DataFrame, keyCol: String, tsCol: String,
                     halfLifeDays: Int, asOfMicros: Long): DataFrame = {
    require(halfLifeDays >= 1, s"halfLifeDays must be >= 1, got $halfLifeDays")
    val bucketUs = halfLifeDays.toLong * 24L * 3600L * 1000000L
    val anchorBucket = Math.floorDiv(asOfMicros, bucketUs)
    // integer div, not float: a boundary timestamp must land in the
    // same bucket in every engine
    val age = greatest(lit(0L),
      expr(s"${anchorBucket}L - unix_micros(__ts) div ${bucketUs}L"))
    events
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol), col(tsCol).as("__ts"))
      .select(col(keyCol), age.as("__age"))
      .filter(col("__age") < 63)
      .groupBy(col(keyCol), col("__age"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col(keyCol))
      .agg(sum(col("__c")).as("n_events"),
        sum(expr("shiftright(__c, CAST(__age AS INT))"))
          .as("decayed_weight"))
      .select(col(keyCol), col("n_events"), col("decayed_weight"),
        expr("(CAST(decayed_weight AS DECIMAL(38,0)) * 1000000)" +
          " div n_events").cast("long").as("freshness_ppm"))
  }
}
