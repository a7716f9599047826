package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Inter-arrival burstiness — the traffic-SHAPE monitor the rate
  * monitors miss: two streams with identical hourly counts can be a
  * steady drizzle or silence-then-bursts, and capacity planning,
  * session gap tuning, and bot detection all read the difference. The
  * standard scalar is the squared coefficient of variation of
  * inter-arrival gaps: CV² = 1 for a Poisson stream, → 0 periodic,
  * > 1 bursty (Barabási 2005's heavy-tailed human timing).
  */
object Burstiness {

  /** Per-group CV² of per-entity inter-arrival gaps.
    *
    * Gaps are computed WITHIN an entity (user/session/host) — ordered
    * by (ts, tieCol) under a window partitioned by (entity, group), so
    * partitions are entity-history-bounded, never corpus-bounded — and
    * pooled per group. Exact integer output:
    *
    *   mean_gap_micros = Σg div n
    *   cv2_milli = (1000·(n·Σg² − (Σg)²)) div (Σg)²   [n ≥ 2]
    *
    * with Σg² in DECIMAL(38,0) (micros² reaches 1e24). Entities with a
    * single event contribute no gap; groups with fewer than 2 gaps
    * emit cv2_milli null. Zero gaps (same-instant repeats) count as
    * legitimate 0-micros gaps.
    *
    * Output: (groupCol, n_gaps, mean_gap_micros, cv2_milli).
    */
  def interArrivalCv2(df: DataFrame, entityCol: String, groupCol: String,
                      tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(entityCol), col(groupCol))
      .orderBy(col(tsCol), col(tieCol))
    val gaps = df
      .filter(col(entityCol).isNotNull && col(groupCol).isNotNull &&
        col(tsCol).isNotNull)
      .select(col(entityCol), col(groupCol), col(tsCol), col(tieCol))
      .withColumn("__g",
        unix_micros(col(tsCol)) - lag(unix_micros(col(tsCol)), 1).over(w))
      .filter(col("__g").isNotNull)
    cv2FromGaps(gaps, groupCol, "__g")
  }

  /** Tick-count dispersion census (Fisher 1950's index of dispersion,
    * variance-to-mean of counts per tick) — the COUNT-side view of
    * traffic shape next to [[interArrivalCv2]]'s gap-side one, and the
    * validity pre-check for every Poisson-calibrated alarm in the
    * family (q218's CUSUM slack, q287's EWMA sigma band assume
    * dispersion ≈ 1000 milli; overdispersed streams fire them
    * spuriously). Crucially it counts the SILENT ticks: the tick-count
    * table only holds ticks with events, so the span max−min+1 per
    * group restores the zeros that drive dispersion down — a stream
    * that is silent 90% of the time and bursts the rest is
    * overdispersed even if its active ticks look uniform.
    *
    * Exact rational: with span S, total T and Σc² over active ticks
    * (zeros add nothing), D = var/mean = (S·Σc² − T²)/(S·T) — all
    * integer in DECIMAL(38,0), milli floored; 1000 = Poisson, < 1000
    * under-dispersed (regular), > 1000 bursty.
    *
    * Scale shape: one corpus aggregate to the calendar-bounded tick
    * table, one bounded aggregate per group. Output per group:
    * (groupCol, span_ticks, active_ticks, total, mean_milli,
    * dispersion_milli — null when the total is 0).
    */
  def tickDispersion(df: DataFrame, groupCol: String, tsCol: String,
                     stepSeconds: Long): DataFrame = {
    require(stepSeconds > 0, s"stepSeconds must be positive, got $stepSeconds")
    val ticks = df
      .filter(col(groupCol).isNotNull && col(tsCol).isNotNull)
      .select(col(groupCol),
        expr(s"unix_micros($tsCol) div ${stepSeconds * 1000000L}")
          .as("__tick"))
      .groupBy(col(groupCol), col("__tick"))
      .agg(count(lit(1)).as("__c"))
    dispersionFromTicks(ticks, groupCol, "__tick", "__c")
  }

  /** The dispersion rollup over an already-built (group, tick, count)
    * table — shared by the batch operator above and the ingest twin's
    * parity contract ([[graft.streaming.TickDispersionStream]] upserts
    * exactly these cells incrementally, so batch == stream reduces to
    * tick-table equality).
    */
  def dispersionFromTicks(ticks0: DataFrame, groupCol: String,
                          tickCol: String, cntCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val ticks = ticks0.select(col(groupCol), col(tickCol).as("__tick"),
      col(cntCol).as("__c"))
    ticks.groupBy(col(groupCol))
      .agg((max(col("__tick")) - min(col("__tick")) + 1L).as("span_ticks"),
        count(lit(1)).as("active_ticks"),
        sum(col("__c")).as("total"),
        sum(expr(s"CAST(__c AS $dec) * __c")).as("__c2"))
      .select(col(groupCol), col("span_ticks"), col("active_ticks"),
        col("total"),
        expr("(total * 1000L) div span_ticks").as("mean_milli"),
        when(col("total") > 0,
          expr(s"(CAST(1000 AS $dec) *" +
            s" (CAST(span_ticks AS $dec) * __c2 -" +
            s" CAST(total AS $dec) * total))" +
            s" div (CAST(span_ticks AS $dec) * total)").cast("long"))
          .as("dispersion_milli"))
  }

  /** The per-group CV² rollup over an already-extracted gap table —
    * shared by the batch operator above and the ingest twin's parity
    * contract ([[graft.streaming.BurstinessStream]] emits exactly this
    * gap table incrementally, so batch == stream reduces to the gap
    * multiset matching).
    */
  def cv2FromGaps(gaps: DataFrame, groupCol: String,
                  gapCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    gaps.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_gaps"),
        sum(col(gapCol)).as("__sg"),
        sum(expr(s"CAST($gapCol AS $dec) * $gapCol")).as("__sg2"))
      .select(col(groupCol),
        col("n_gaps"),
        expr("__sg div n_gaps").as("mean_gap_micros"),
        when(col("n_gaps") >= 2 && col("__sg") > 0,
          expr(s"(1000 * (n_gaps * __sg2 - CAST(__sg AS $dec) * __sg))" +
            s" div (CAST(__sg AS $dec) * __sg)").cast("long"))
          .as("cv2_milli"))
  }
}
