package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-grid resampling with last-observation-carried-forward — the
  * gap-fill step that turns an irregular event stream into the
  * fixed-cadence series downstream feature pipelines and monitors
  * expect (one row per key per tick, holding the latest observation).
  *
  * Scale shape: the grid is built from a BOUNDED table — one aggregate
  * gives each key's first-observation tick and one 1-row aggregate the
  * global last tick; `sequence` + `explode` expands ticks narrowly, so
  * grid size is (distinct keys) x (ticks), never a function of raw event
  * volume. The fill itself reuses the engine's as-of merge operator
  * ([[Joins.asofMerge]], graft.plans.AsofJoinExec): each side
  * exchanges+sorts on the key once, then a single forward merge pass —
  * no per-key windows over the unbounded observation stream, no range
  * join. A hot key costs a sort partition of its own observations, not
  * a buffered cross product.
  *
  * Determinism: observations sharing an exact (key, ts) are collapsed
  * to the lexicographically greatest payload struct BEFORE the merge
  * (put a unique id first in `payload` to make that a stable "latest
  * writer wins"), so the carried value never depends on scan order.
  *
  * Output: (key, grid_ts, <payload...> — null until the key's first
  * observation tick, then carried forward — plus last_obs_ts and
  * gap_micros = grid_ts - last_obs_ts in microseconds).
  */
object Resample {

  /** Time-weighted average per key over an irregular series — the
    * aggregation where a value counts for HOW LONG it held, not how
    * often it was sampled (TWAP and its ops cousins; a plain mean
    * over-weights chatty periods). Each observation holds from its
    * timestamp to the key's next one; the key's LAST observation
    * closes the window (weight 0 — it has no held interval yet), so a
    * single-observation key reports null. Same-timestamp duplicates:
    * the tie-break LAST row holds the interval (a superseding
    * same-instant write), the earlier ties get zero width — the
    * `tieCol` total order makes that deterministic in both engines.
    *
    * Exact arithmetic: interval micros (long) × value cents
    * (DECIMAL(18,2)·100, the house float-determinism rule), summed in
    * DECIMAL(38,0) — headroom ≈ 1e13 key-years of microsecond
    * intervals at 1e6-cent values. twa_cents = Σ(cents·Δt) div ΣΔt.
    *
    * Scale shape: one per-key window (lead) ordered by (ts, tie-break)
    * — partitioned by the key, the SCD2 contract (a key's history fits
    * a task) — then one combinable aggregate. No grid, no join; the
    * corpus is scanned once.
    *
    * Output: (keyCol, n_obs, span_us, twa_cents) — span_us = held
    * time, twa_cents null when nothing was ever held.
    */
  def timeWeightedAvg(obs: DataFrame, keyCol: String, tsCol: String,
                      valueCol: String, tieCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    obs
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull &&
        col(valueCol).isNotNull)
      .select(col(keyCol), col(tsCol), col(tieCol),
        (col(valueCol).cast("decimal(18,2)") * 100).cast("long").as("__c"))
      .withColumn("__dt",
        unix_micros(lead(col(tsCol), 1).over(w)) - unix_micros(col(tsCol)))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_obs"),
        coalesce(sum(col("__dt")), lit(0L)).as("span_us"),
        sum(expr(s"CAST(__c AS $dec) * __dt")).as("__num"))
      .select(col(keyCol), col("n_obs"), col("span_us"),
        when(col("span_us") > 0, expr("__num div span_us"))
          .cast("long").as("twa_cents"))
  }

  /** @param perKeyEnd false (default): every key grids to the GLOBAL
    *   last tick — monitoring semantics, a series keeps reporting after
    *   its source goes quiet. true: each key grids only to ITS OWN last
    *   observation tick — churn semantics; at 100 TB with high key
    *   churn this is the knob that keeps grid volume proportional to
    *   live spans instead of (all keys) x (full calendar).
    */
  def locfGrid(obs: DataFrame, keyCol: String, tsCol: String,
               payload: Seq[String], stepSeconds: Long,
               perKeyEnd: Boolean = false): DataFrame = {
    require(payload.nonEmpty, "need at least one payload column")
    require(stepSeconds > 0, s"stepSeconds must be positive, got $stepSeconds")
    val o = obs
      .select((Seq(col(keyCol), col(tsCol).cast("timestamp").as(tsCol)) ++
        payload.map(col)): _*)
      .na.drop(Seq(keyCol, tsCol))
    // collapse exact-timestamp collisions deterministically
    val dedup = o.groupBy(col(keyCol), col(tsCol))
      .agg(max(struct(payload.map(col): _*)).as("__pay"))
      .select((Seq(col(keyCol), col(tsCol)) ++
        payload.map(p => col(s"__pay.$p").as(p))): _*)

    def tickOf(c: org.apache.spark.sql.Column) =
      timestamp_seconds(floor(unix_timestamp(c) / stepSeconds) * stepSeconds)
    val perKey = o.groupBy(col(keyCol))
      .agg(tickOf(min(col(tsCol))).as("__t0"),
        tickOf(max(col(tsCol))).as("__tk"))
    val spanned =
      if (perKeyEnd) perKey.withColumn("__t1", col("__tk"))
      else {
        // global end from the BOUNDED keys table (tickOf is monotone, so
        // max of per-key last ticks == tick of the global max) — not a
        // third corpus pass
        val globalEnd = perKey.agg(max(col("__tk")).as("__t1"))
        perKey.crossJoin(broadcast(globalEnd))
      }
    val grid = spanned
      .select(col(keyCol),
        explode(sequence(col("__t0"), col("__t1"),
          expr(s"interval $stepSeconds second"))).as("grid_ts"))

    val merged = Joins.asofMerge(grid, dedup, Seq(keyCol), "grid_ts", tsCol)
    merged.select((Seq(col(keyCol), col("grid_ts")) ++
      payload.map(p => col(s"asof_$p").as(p)) :+
      col(s"asof_$tsCol").as("last_obs_ts") :+
      (unix_micros(col("grid_ts")) - unix_micros(col(s"asof_$tsCol")))
        .as("gap_micros")): _*)
  }
}
