package graft.streaming

import org.apache.spark.sql.streaming.{TimeMode, TTLConfig}

/** transformWithState wiring shared by every ingest twin that exposes a
  * TTL knob: Spark REJECTS a non-NONE TTLConfig under TimeMode.None
  * (state TTL needs a clock), so the time mode must follow the TTL —
  * hardcoding TimeMode.None() next to a ttl parameter makes the
  * documented state-hygiene knob unusable (query fails at startup the
  * moment a caller passes a real TTL).
  *
  * Operational note for TTL mode: under ProcessingTime the engine
  * schedules micro-batches to advance the state clock even without new
  * data, so pair it with a real trigger interval (e.g.
  * `.trigger(Trigger.ProcessingTime("10 seconds"))`) — under the
  * default as-fast-as-possible trigger those clock batches run
  * back-to-back, and test-style `processAllAvailable()` never settles.
  */
object StreamModes {
  def forTtl(ttl: TTLConfig): TimeMode =
    if (ttl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime()
}
