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

  test("Misra-Gries: guaranteed heavies present, counts are lower bounds, merge-stable") {
    val rnd = new scala.util.Random(42)
    // Zipf-ish stream: a few heavy items over a long tail.
    val items = Seq.fill(5000)(rnd.nextInt(400) match {
      case x if x < 120 => "alpha"
      case x if x < 200 => "beta"
      case x if x < 260 => "gamma"
      case x => s"tail_$x"
    })
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = items.size
    val k = 20
    for (parts <- Seq(1, 8)) {
      val df = items.toDF("item").repartition(parts)
      val mg = TopK.frequentItems(df, col("item"), k)
        .as[(String, Long)].collect().toMap
      assert(mg.size <= k)
      // every item with freq > n/(k+1) is present
      truth.filter(_._2 > n / (k + 1)).keys.foreach { heavy =>
        assert(mg.contains(heavy), s"parts=$parts: lost heavy item $heavy")
      }
      // reported counts are lower bounds within n/(k+1)
      mg.foreach { case (item, c) =>
        assert(c <= truth(item), s"$item overcounted: $c > ${truth(item)}")
        assert(truth(item) - c <= n / (k + 1) + 1,
          s"$item undercounted beyond the bound")
      }
    }
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
