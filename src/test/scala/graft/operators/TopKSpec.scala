package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bounded top-k aggregate vs the window rank-filter: identical results
  * (including tiebreaks), on adversarial shapes — duplicated values, groups
  * smaller than k, many partitions.
  */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("perGroupAgg equals the window form on random data with ties") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 4000).map { i =>
      (s"g${i % 5}", math.floor(rnd.nextDouble() * 50) / 2.0, i.toLong)
    } ++ Seq(("tiny", 1.0, 9001L)) // group smaller than k
    val df = rows.toDF("g", "v", "id").repartition(16)

    val win = TopK.perGroup(df, Seq("g"), Seq(col("v").desc, col("id").asc), 7)
      .select(col("g"), col("rn"), col("id"), col("v"))
      .as[(String, Int, Long, Double)].collect().toSet
    val agg = TopK.perGroupAgg(df, Seq("g"), col("v"), col("id"), 7)
      .select(col("g"), col("rn"), col("id"), col("value"))
      .as[(String, Int, Long, Double)].collect().toSet
    assert(agg == win)
  }

  test("perGroupAgg plans as a hash aggregate (partial + final), no window sort") {
    val df = (1 to 100).map(i => (s"g${i % 3}", i.toDouble, i.toLong))
      .toDF("g", "v", "id")
    val plan = TopK.perGroupAgg(df, Seq("g"), col("v"), col("id"), 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("topk_agg"), s"aggregate not planned:\n$plan")
    assert(!plan.contains("Window"), s"must not fall back to a window:\n$plan")
  }
}
