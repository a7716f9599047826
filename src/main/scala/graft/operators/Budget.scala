package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Budgeted head-of-ranking selection: keep rows in (score desc, id asc)
  * order while the running sum of a cost column stays within a budget —
  * "train on the best B tokens", the selection step that follows quality
  * scoring (classifier logits, DSIR importance weights).
  *
  * Scale shape: the naive form is a global-order window (one task sees
  * the whole corpus). Here scores are range-bucketed by exact integer
  * floor-div (the [[Packing]] two-phase pattern): rows get an in-bucket
  * prefix from a per-bucket window (parallel over buckets), bucket
  * TOTALS — #buckets rows, not corpus rows — take the one bounded
  * single-partition pass, and the exclusive bucket prefix is broadcast
  * back. Works for signed scores; ties break by id so the selection is
  * a deterministic total order.
  */
object Budget {

  /** Rows whose inclusive running cost in (scoreCol desc, idCol asc)
    * order is <= budget, with that running cost as `cum_cost`. Score
    * and cost must be integral (cast to long); cost must be >= 0.
    */
  def takeByBudget(df: DataFrame, idCol: String, scoreCol: String,
                   costCol: String, budget: Long,
                   bucketWidth: Long = 1000L): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    // Exact integer floor-div (Packing's form — a double cast loses
    // precision past 2^53), negated so ascending bucket order is
    // descending score order.
    val base = df.select(col(idCol), col(scoreCol).cast("long").as("__s"),
      col(costCol).cast("long").as("__c"))
    bucketCumsum(base,
      expr(s"-((__s - pmod(__s, ${bucketWidth}L)) div ${bucketWidth}L)"),
      Seq(col("__s").desc, col(idCol).asc), col("__c"))
      .filter(col("__cum") <= budget)
      .select(col(idCol), col("__s").as(scoreCol), col("__c").as(costCol),
        col("__cum").as("cum_cost"))
  }

  /** The house two-phase bucket cumsum, factored out (r10 — it used to
    * live in three shapes: here, via [[takeByBudget]] in
    * skipRateReport, and inlined in sortKeyAdvisor): running sum of
    * `valueCol` over the global (bucketCol asc, orderCols) order as
    * `__cum`, with NO global-order window — an in-bucket running sum
    * plus a broadcast bucket-prefix table. `bucketCol` must be
    * monotone in the leading order column so bucket-ascending +
    * in-bucket order = global order; with `valueCol = lit(1)` the
    * cumsum IS the 1-based global rank.
    */
  private[operators] def bucketCumsum(df: DataFrame, bucketCol: Column,
      orderCols: Seq[Column], valueCol: Column): DataFrame = {
    val base = df.withColumn("__bkx", bucketCol)
    val inBucket = Window.partitionBy(col("__bkx")).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = base.withColumn("__cum_in", sum(valueCol).over(inBucket))
    // Bucket totals: map-side combinable aggregate, #buckets rows.
    val totals = base.groupBy(col("__bkx")).agg(sum(valueCol).as("__bt"))
    val prefW = Window.orderBy(col("__bkx"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prefixes = totals
      .withColumn("__pre", sum(col("__bt")).over(prefW) - col("__bt"))
      .select(col("__bkx"), col("__pre"))
    local.join(broadcast(prefixes), "__bkx")
      .withColumn("__cum", col("__pre") + col("__cum_in"))
      .drop("__bkx", "__cum_in", "__pre")
  }

  /** Water-filling per-domain quota: the UNIFORM cap C such that
    * Σ min(nᵢ, C) uses up a global token budget — "2T tokens total,
    * balance the sources": small sources keep everything, large sources
    * are cut to the same waterline (the max-min-fair allocation;
    * LLaMA-class data recipes cap per-source contributions exactly this
    * way, with the cap today usually hand-tuned — this computes it).
    *
    * `df` is ALREADY domain-level (one row per domain — a bounded
    * table, the [[graft.operators.Doremi]] contract), so every window
    * here runs over k rows, never the corpus. All arithmetic is exact
    * longs: C = (B - P(uncapped)) div (#capped) at the unique boundary
    * where C ≥ every uncapped size and C < every capped size; the
    * integer-division remainder (< #capped) is reported per row rather
    * than smeared. A budget covering everything yields cap = null,
    * allocation = nᵢ, remainder = B - Σnᵢ.
    *
    * Output: (keyCol, n_tokens, cap, allocated, remainder), one row per
    * domain.
    */
  def waterFillCaps(df: DataFrame, keyCol: String, nCol: String,
                    budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val ord = Window.orderBy(col("__n").asc, col(keyCol).asc)
    // null-sized domains are dropped up front: they could never receive
    // an allocation and a null inside the prefix sums would poison the
    // waterline arithmetic (NullSafetySpec pins the behavior)
    val ranked = df.select(col(keyCol), col(nCol).cast("long").as("__n"))
      .filter(col("__n").isNotNull)
      .withColumn("__i", row_number().over(ord).cast("long"))
      .withColumn("__p", sum(col("__n"))
        .over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = ranked.agg(max(col("__i")).as("__k"), max(col("__p")).as("__tot"))
    // Candidate boundary per row i: rows 1..i-1 uncapped, cap spread
    // over the k-i+1 remaining. Valid iff cap < n_i (row i really is
    // capped); the smallest valid i is THE boundary.
    val cand = ranked.crossJoin(broadcast(tot))
      .withColumn("__cap",
        expr(s"(${budget}L - (__p - __n)) div (__k - __i + 1)"))
    val boundary = cand.filter(col("__cap") < col("__n"))
      .agg(min(col("__i")).as("__bi"))
    val capRow = cand.join(broadcast(boundary), col("__i") === col("__bi"),
        "inner")
      .select(col("__cap").as("__C"),
        expr(s"${budget}L - ((__p - __n) + (__k - __i + 1) * __cap)")
          .as("__rem"))
    // No boundary (budget >= total): cap null, remainder = B - total.
    val fallback = tot.select(lit(null).cast("long").as("__C"),
      (lit(budget) - col("__tot")).as("__rem"))
    val chosen = capRow.unionAll(
      fallback.join(broadcast(boundary), col("__bi").isNull, "inner")
        .select(col("__C"), col("__rem")))
    ranked.crossJoin(broadcast(chosen))
      .select(col(keyCol), col("__n").as("n_tokens"),
        col("__C").as("cap"),
        when(col("__C").isNull || col("__n") <= col("__C"), col("__n"))
          .otherwise(col("__C")).as("allocated"),
        col("__rem").as("remainder"))
  }
}
