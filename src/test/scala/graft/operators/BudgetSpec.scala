package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class BudgetSpec extends SparkSpec {
  import spark.implicits._

  test("two-phase budget selection equals the naive global window") {
    // Signed scores straddling bucket boundaries (width 10), duplicate
    // scores (tie-break by id), zero-cost rows.
    val rows = (0L until 200L).map { i =>
      val score = (i * 37 % 100) - 50 // [-50, 49], many exact dupes
      val cost = if (i % 17 == 0) 0L else i % 7 + 1
      (i, score, cost)
    }
    val df = rows.toDF("id", "score", "cost").repartition(8)
    val naive = df.withColumn("cum_cost", sum(col("cost")).over(
        Window.orderBy(col("score").desc, col("id").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("cum_cost") <= 150L)
      .select("id", "score", "cost", "cum_cost")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val fast = Budget.takeByBudget(df, "id", "score", "cost",
        budget = 150L, bucketWidth = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(fast == naive)
    assert(fast.nonEmpty && fast.size < 200) // the budget actually cuts
  }

  test("degenerate budgets: zero selects nothing, huge selects everything") {
    val df = Seq((1L, 5L, 3L), (2L, 4L, 3L)).toDF("id", "score", "cost")
    assert(Budget.takeByBudget(df, "id", "score", "cost", 0L).count() == 0)
    assert(Budget.takeByBudget(df, "id", "score", "cost", 100L).count() == 2)
  }
}
