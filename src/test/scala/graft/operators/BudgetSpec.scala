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

  test("waterFillCaps: hand-computed waterline, tiny and covering budgets") {
    val per = Seq(("a", 5L), ("b", 10L), ("c", 100L)).toDF("src", "n")
    def run(b: Long) = Budget.waterFillCaps(per, "src", "n", b)
      .orderBy("src").collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_tokens"),
        if (r.isNullAt(2)) -1L else r.getAs[Long]("cap"),
        r.getAs[Long]("allocated"), r.getAs[Long]("remainder"))).toSeq
    // B=30: sorted [5,10,100] -> boundary i=3, C=(30-15)/1=15:
    // a,b keep all; c cut to 15; sum=30, remainder 0
    assert(run(30L) == Seq(("a", 5L, 15L, 5L, 0L), ("b", 10L, 15L, 10L, 0L),
      ("c", 100L, 15L, 15L, 0L)))
    // B=3: boundary i=1, C=3 div 3=1: everyone cut to 1, remainder 0
    assert(run(3L) == Seq(("a", 5L, 1L, 1L, 0L), ("b", 10L, 1L, 1L, 0L),
      ("c", 100L, 1L, 1L, 0L)))
    // B=4: C=1 (4 div 3), remainder 1 — reported, not smeared
    assert(run(4L).map(_._5).toSet == Set(1L))
    // B=200 >= total 115: cap null (-1 sentinel), everyone whole
    assert(run(200L) == Seq(("a", 5L, -1L, 5L, 85L), ("b", 10L, -1L, 10L, 85L),
      ("c", 100L, -1L, 100L, 85L)))
  }

  test("waterFillCaps: boundary row is capped, predecessor uncapped") {
    // B=25 over [5,10,100]: i=2 candidate C=(25-5)/2=10 is NOT < n_2=10
    // -> boundary is i=3 with C=(25-15)/1=10: b keeps its exact 10
    val per = Seq(("a", 5L), ("b", 10L), ("c", 100L)).toDF("src", "n")
    val out = Budget.waterFillCaps(per, "src", "n", 25L)
      .orderBy("src").collect()
      .map(r => (r.getString(0), r.getAs[Long]("allocated"))).toSeq
    assert(out == Seq(("a", 5L), ("b", 10L), ("c", 10L)))
  }

  test("degenerate budgets: zero selects nothing, huge selects everything") {
    val df = Seq((1L, 5L, 3L), (2L, 4L, 3L)).toDF("id", "score", "cost")
    assert(Budget.takeByBudget(df, "id", "score", "cost", 0L).count() == 0)
    assert(Budget.takeByBudget(df, "id", "score", "cost", 100L).count() == 2)
  }
}
