package graft.functions

import graft.SparkSpec
import graft.functions.expressions.QuantileSketchAgg
import org.apache.spark.sql.functions._

/** Deterministic-compaction quantile summary: exact below k, weight-
  * preserving compaction, the worst-case rank guarantee under adverse
  * merge orders, and the Spark aggregation path end to end.
  */
class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  private def exactDisc(sorted: Seq[Double], q: Double): Double =
    sorted(math.max(1, math.ceil(q * sorted.size).toLong).toInt - 1)

  private def rankErr(sorted: Seq[Double], est: Double, q: Double): Long = {
    val lt = sorted.count(_ < est).toLong
    val le = sorted.count(_ <= est).toLong
    val target = math.max(1L, math.ceil(q * sorted.size).toLong)
    // distance from the target to est's rank interval [lt+1, le]
    if (target < lt + 1) lt + 1 - target
    else if (target > le) target - le
    else 0L
  }

  test("below k the summary is the exact multiset: estimates equal PERCENTILE_DISC") {
    val sk = new QuantileSketchAgg.Sketch(64)
    val vals = Seq(5.0, 1.0, 9.0, 3.0, 3.0, 7.0, 2.0)
    vals.foreach(sk.add)
    val sorted = vals.sorted
    for (q <- Seq(0.0, 0.1, 0.5, 0.9, 1.0))
      assert(sk.quantile(q) == exactDisc(sorted, q), s"q=$q")
  }

  test("compaction preserves total weight and bounds the buffer") {
    val k = 16
    val sk = new QuantileSketchAgg.Sketch(k)
    (1 to 10000).foreach(i => sk.add(i.toDouble))
    assert(sk.n == 10000L)
    val totalW = sk.levels.zipWithIndex
      .map { case (l, i) => l.length.toLong << i }.sum
    assert(totalW == 10000L, "odd-leftover rule must preserve weight")
    sk.levels.foreach(l => assert(l.length <= k))
    assert(sk.levels.length <= 33, "levels grow as log2(n/k)")
  }

  test("rank guarantee 2(L+1)n/k holds on sorted input and across merge orders") {
    val k = 64
    val n = 50000
    val vals = (1 to n).map(_.toDouble)
    // worst-ish cases: sorted, reverse-sorted, and a lopsided merge tree
    def fromSeq(s: Seq[Double]): QuantileSketchAgg.Sketch = {
      val sk = new QuantileSketchAgg.Sketch(k)
      s.foreach(sk.add)
      sk
    }
    val variants = Seq(
      fromSeq(vals),
      fromSeq(vals.reverse), {
        // 100 shard sketches merged left-to-right (deep lopsided tree)
        val shards = vals.grouped(500).map(fromSeq).toSeq
        val acc = shards.head
        shards.tail.foreach(acc.mergeIn)
        acc
      })
    val sorted = vals
    for (sk <- variants; q <- Seq(0.01, 0.25, 0.5, 0.75, 0.99)) {
      assert(sk.n == n.toLong)
      val bound = 2L * (sk.levels.length + 1) * n / k + 1
      val err = rankErr(sorted, sk.quantile(q), q)
      assert(err <= bound, s"q=$q err=$err bound=$bound")
    }
  }

  test("serialization round-trips the levels structure exactly") {
    val sk = new QuantileSketchAgg.Sketch(32)
    (1 to 5000).foreach(i => sk.add((i * 37 % 997).toDouble))
    val back = QuantileSketchAgg.fromBytes(QuantileSketchAgg.toBytes(sk), 32)
    assert(back.n == sk.n)
    assert(back.levels.map(_.toSeq) == sk.levels.map(_.toSeq))
    for (q <- Seq(0.1, 0.5, 0.9)) assert(back.quantile(q) == sk.quantile(q))
  }

  test("sketchQuantiles: per-group estimates within the guarantee on Spark") {
    val rows = (1 to 20000).map(i => ("g" + (i % 3), (i * 7919 % 100003).toDouble))
    val df = rows.toDF("g", "v").repartition(8)
    val got = graft.operators.Percentiles
      .sketchQuantiles(df, "g", "v", Seq(0.5, 0.95), k = 128)
      .collect()
    assert(got.length == 6)
    got.foreach { r =>
      val g = r.getAs[String]("g")
      val sorted = rows.filter(_._1 == g).map(_._2).sorted
      val bound = 2L * (r.getAs[Int]("n_levels") + 1) * sorted.size / 128 + 1
      val err = rankErr(sorted, r.getAs[Double]("est"), r.getAs[Double]("p"))
      assert(r.getAs[Long]("n") == sorted.size.toLong)
      assert(err <= bound, s"g=$g p=${r.getAs[Double]("p")} err=$err bound=$bound")
    }
  }
}
