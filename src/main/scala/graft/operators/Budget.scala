package graft.operators

import org.apache.spark.sql.DataFrame
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
      .withColumn("__b",
        expr(s"-((__s - pmod(__s, ${bucketWidth}L)) div ${bucketWidth}L)"))
    val inBucket = Window.partitionBy(col("__b"))
      .orderBy(col("__s").desc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = base.withColumn("__cum_in", sum(col("__c")).over(inBucket))
    // Bucket totals: map-side combinable aggregate, #buckets rows.
    val totals = base.groupBy(col("__b")).agg(sum(col("__c")).as("__bt"))
    val prefW = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prefixes = totals
      .withColumn("__pre", sum(col("__bt")).over(prefW) - col("__bt"))
      .select(col("__b"), col("__pre"))
    local.join(broadcast(prefixes), "__b")
      .withColumn("cum_cost", col("__pre") + col("__cum_in"))
      .filter(col("cum_cost") <= budget)
      .select(col(idCol), col("__s").as(scoreCol), col("__c").as(costCol),
        col("cum_cost"))
  }
}
