package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ingest-time distribution-drift monitoring — the streaming form of
  * [[graft.operators.Snapshot.tokenDrift]]: per event-time window, how
  * far the incoming token distribution has moved from a STATIC
  * reference corpus (the previous crawl, the training mix). A crawler
  * config change shows up here within a window, not at the next
  * offline snapshot diff.
  *
  * Shape: the reference reduces to a BOUNDED (topVocab) broadcast
  * ppm table (batch-side, the q127 distributed top-N cut — never the
  * full vocabulary); the stream is one narrow token explode into a
  * single watermarked windowed aggregate keyed by (window, token),
  * left-joined to the broadcast reference. One stateful operator,
  * Append-mode safe; per-window rollups (L1 drift) are a bounded batch
  * aggregate over the emitted rows ([[summarize]]) — the same
  * downstream-verify split every streaming op here uses.
  */
object DriftStream {

  /** Reference ppm table: top-`topVocab` tokens by count with their
    * scaled-integer ppm (floor(1e6·cnt/total)) — bounded, broadcast-
    * safe by construction.
    */
  def referencePpm(reference: DataFrame, textCol: String,
                   topVocab: Int = 1000): DataFrame = {
    val cnt = reference
      .select(explode(split(col(textCol), " ")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("__rc"))
    val tot = cnt.agg(sum(col("__rc")).as("__rt"))
    cnt.orderBy(col("__rc").desc, col("tok").asc).limit(topVocab)
      .crossJoin(broadcast(tot))
      .select(col("tok"),
        expr("(1000000L * __rc) div greatest(__rt, 1L)").as("ref_ppm"))
  }

  /** Per-(window, token) observed counts with the reference ppm
    * attached (null ref_ppm = token outside the reference vocabulary —
    * itself a drift signal). `docs` must carry an event-time column.
    */
  def monitor(docs: DataFrame, tsCol: String, textCol: String,
              reference: DataFrame, refTextCol: String,
              windowDur: String = "1 minute", watermark: String = "2 minutes",
              topVocab: Int = 1000): DataFrame = {
    val ref = referencePpm(reference, refTextCol, topVocab)
    docs
      .withWatermark(tsCol, watermark)
      .select(col(tsCol), explode(split(col(textCol), " ")).as("tok"))
      .groupBy(window(col(tsCol), windowDur), col("tok"))
      .agg(count(lit(1)).as("obs_cnt"))
      .join(broadcast(ref), Seq("tok"), "left")
      .select(col("window.start").as("win_start"), col("tok"),
        col("obs_cnt"), col("ref_ppm"))
  }

  /** Window-level drift rollup over [[monitor]]'s emitted rows (run it
    * on the sink, batch-side): observed ppm within the window vs the
    * reference, summed |Δppm| over the window's OBSERVED tokens (an
    * absent reference token contributes only when it disappears
    * entirely — this is the one-sided ingest alarm, not the symmetric
    * offline [[graft.operators.Snapshot.tokenDrift]]), plus the
    * out-of-vocabulary token mass. Exact integer arithmetic end to end.
    */
  def summarize(monitored: DataFrame): DataFrame = {
    // Renamed key on the totals side: joining a frame with its own
    // aggregate would otherwise carry conflicting attribute references.
    val tot = monitored.select(col("win_start").as("__w"), col("obs_cnt"))
      .groupBy(col("__w")).agg(sum(col("obs_cnt")).as("__wt"))
    monitored.join(tot, col("win_start") === col("__w")).drop("__w")
      .select(col("win_start"), col("tok"), col("ref_ppm"),
        expr("(1000000L * obs_cnt) div greatest(__wt, 1L)").as("obs_ppm"),
        col("obs_cnt"))
      .groupBy(col("win_start"))
      .agg(sum(col("obs_cnt")).cast("long").as("n_tokens"),
        sum(when(col("ref_ppm").isNotNull,
          abs(col("obs_ppm") - col("ref_ppm"))).otherwise(col("obs_ppm")))
          .cast("long").as("l1_drift_ppm"),
        sum(when(col("ref_ppm").isNull, col("obs_cnt")).otherwise(0L))
          .cast("long").as("oov_tokens"))
  }
}
