package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LM training batch prep: concatenate documents in
  * a deterministic order and cut the token stream into fixed-capacity
  * bins (the "concat and chunk" scheme every large pretraining run uses
  * to avoid padding waste). `/root/reference` has no analytics surface —
  * this is part of the training-data-pipeline inventory layered on top
  * (SURVEY.md §2 Part B).
  *
  * The global running offset is computed with the two-phase shape that
  * survives 100 TB: a within-bucket window cumsum (parallel across
  * buckets) plus a broadcast prefix-total per bucket. The only global
  * step is the window over BUCKET TOTALS — thousands of rows, not
  * documents — the documented bounded-single-partition pattern
  * (SCALING.md), identical to how q111 decomposes its trailing window.
  */
object Packing {

  /** Per-document packing positions over `orderCol` (an INTEGRAL id that
    * defines the concatenation order and the bucketing: bucket =
    * floorDiv(orderCol, bucketWidth) — contiguity is not required,
    * monotonicity is). Output: one row per input row with
    * (orderCol, n_tokens, start_off, first_bin, last_bin).
    *
    * Zero-token documents get last_bin == first_bin (the bin their
    * start offset falls in — they occupy no tokens but still carry a
    * position), the same clamp the streaming counterpart
    * [[graft.streaming.PackingProcessor]] applies; batch == stream on
    * every row, zero-token rows included (StreamingSpec parity pin).
    */
  def packPositions(df: DataFrame, orderCol: String, nTokensCol: String,
                    capacity: Long, bucketWidth: Long = 100000L): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    // Exact integer floor-div for the bucket id: a double cast loses
    // precision beyond 2^53 (64-bit hash-derived order keys), which
    // could place edge rows in the wrong bucket and corrupt the prefix
    // sum. pmod keeps the floor semantics for negative keys.
    val base = df.select(col(orderCol),
        col(nTokensCol).cast("long").as("__n"))
      .withColumn("__b",
        expr(s"(CAST($orderCol AS BIGINT) - pmod(CAST($orderCol AS BIGINT), " +
          s"${bucketWidth}L)) div ${bucketWidth}L"))
    // Phase 1: cumsum within each bucket (parallel over buckets).
    val inBucket = Window.partitionBy(col("__b")).orderBy(col(orderCol))
    val local = base.withColumn("__cum_in", sum(col("__n")).over(inBucket))
    // Phase 2: exclusive prefix of bucket totals — rows = #buckets, a
    // bounded single-partition window over the AGGREGATED totals only.
    val totals = base.groupBy(col("__b")).agg(sum(col("__n")).as("__bt"))
    val prefW = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prefixes = totals
      .withColumn("__pre", sum(col("__bt")).over(prefW) - col("__bt"))
      .select(col("__b"), col("__pre"))
    local.join(broadcast(prefixes), "__b")
      .select(col(orderCol), col("__n").as("n_tokens"),
        (col("__pre") + col("__cum_in") - col("__n")).as("start_off"))
      // Integer div throughout (start_off >= 0, so truncation == floor):
      // double division would lose exactness past 2^53 total tokens.
      .withColumn("first_bin", expr(s"start_off div ${capacity}L"))
      .withColumn("last_bin",
        expr(s"(start_off + greatest(n_tokens, 1L) - 1L) div ${capacity}L"))
  }

  /** Per-bin packing summary: how many documents overlap each bin, how
    * many start in it, and the bin's token fill (== capacity for every
    * bin but the last — the no-padding invariant). The explode is bounded
    * by doc_tokens/capacity + 1 spanned bins per document.
    */
  def packBins(df: DataFrame, orderCol: String, nTokensCol: String,
               capacity: Long, bucketWidth: Long = 100000L): DataFrame = {
    val pos = packPositions(df, orderCol, nTokensCol, capacity, bucketWidth)
    pos.filter(col("n_tokens") > 0)
      .select(col("start_off"), col("n_tokens"), col("first_bin"),
        explode(sequence(col("first_bin"), col("last_bin"))).as("bin"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("first_bin") === col("bin"), 1L).otherwise(0L)).as("n_starting"),
        sum(least(col("start_off") + col("n_tokens"), (col("bin") + 1) * capacity)
          - greatest(col("start_off"), col("bin") * capacity)).as("n_tokens"))
  }

  /** Capacity-tuning report: for each candidate bin capacity, the bin
    * count, stream fill fraction and the number of documents straddling
    * a bin boundary (the ones a causal-masking loader truncates or
    * re-splits) — the table one reads before choosing a sequence
    * length. ONE [[packPositions]] pass feeds every capacity: start
    * offsets are capacity-independent, so the per-capacity bins are a
    * narrow integer-div derivation and the report is a single
    * combinable aggregate over rows × |capacities|. All ppm arithmetic
    * is exact integer division.
    *
    * Output: (capacity, n_docs, total_tokens, n_bins, fill_ppm,
    * straddling_docs), one row per capacity.
    */
  def efficiencyReport(df: DataFrame, orderCol: String, nTokensCol: String,
      capacities: Seq[Long], bucketWidth: Long = 100000L): DataFrame = {
    require(capacities.nonEmpty && capacities.forall(_ > 0),
      s"capacities must be positive, got $capacities")
    val pos = packPositions(df, orderCol, nTokensCol, capacities.max, bucketWidth)
      .select(col("start_off"), col("n_tokens"))
    val caps = capacities.distinct.sorted.mkString("array(", "L, ", "L)")
    pos
      .select(col("start_off"), col("n_tokens"),
        explode(expr(caps)).as("capacity"))
      .groupBy(col("capacity"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(when(expr("start_off div capacity") =!=
            expr("(start_off + greatest(n_tokens, 1L) - 1L) div capacity"),
          1L).otherwise(0L)).as("straddling_docs"))
      .withColumn("n_bins", expr(
        "CASE WHEN total_tokens > 0 THEN (total_tokens - 1) div capacity + 1 " +
          "ELSE 0L END"))
      .withColumn("fill_ppm", expr(
        "CASE WHEN n_bins > 0 THEN (1000000 * total_tokens) div (n_bins * capacity) " +
          "ELSE 0L END"))
      .select(col("capacity"), col("n_docs"), col("total_tokens"),
        col("n_bins"), col("fill_ppm"), col("straddling_docs"))
  }
}
