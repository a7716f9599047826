package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

/** Distributed exact interpolated percentiles (SQL PERCENTILE_CONT).
  *
  * Spark's built-in `percentile` aggregate buffers every (value, count) of a
  * group on the single reducer that owns the group — with few groups (the
  * common "percentile per status flag" shape) that is a handful of reducers
  * swallowing the whole table, which cannot scale. This operator computes
  * bit-identical results with per-task memory bounded by the partition
  * size, in three fully-parallel passes:
  *
  *  1. (key, value) -> count: a hash aggregate (map-side partial combine),
  *     collapsing duplicate values. Output is the distinct-value table.
  *  2. Range-partition + sort that table by (key, value); collect ONLY the
  *     per-(partition, key) subtotals to the driver (O(partitions + groups)
  *     rows — the same order as the final result itself) and turn them into
  *     running rank offsets, broadcast back.
  *  3. One scan of the sorted table: with its partition's offset, each
  *     distinct value knows its global rank interval [lo, hi] within its
  *     group; a row is emitted ONLY if that interval contains a rank some
  *     requested percentile needs (floor/ceil of 1 + p*(n-1)) — at most
  *     2 * |ps| rows per group survive.
  *
  * The boundary rows then interpolate with exactly the arithmetic of
  * Spark's `Percentile.getPercentile` (`(hi - pos)*vLo + (pos - lo)*vHi`),
  * which the q50 oracle shows is bit-identical to DuckDB's quantile_cont on
  * raw-double inputs.
  *
  * Output: one row per (key, percentile): (keyCol, p, value).
  */
object Percentiles {

  def percentileCont(df: DataFrame, keyCol: String, valueCol: String,
                     ps: Seq[Double]): DataFrame = {
    val spark = df.sparkSession
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0))

    // Pass 1: distinct-value counts (nulls ignored, like the built-in).
    val counts = df
      .select(col(keyCol).as("__k"), col(valueCol).cast("double").as("__v"))
      .filter(col("__v").isNotNull)
      .groupBy(col("__k"), col("__v"))
      .agg(count(lit(1)).as("__c"))

    val nPart = spark.sessionState.conf.numShufflePartitions
    val sorted = counts
      .repartitionByRange(nPart, col("__k"), col("__v"))
      .sortWithinPartitions(col("__k"), col("__v"))
      .persist()

    // Pass 2: per-(partition, key) subtotals — O(partitions + groups).
    val partials: Array[(Int, Any, Long)] = sorted.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val sub = mutable.LinkedHashMap.empty[Any, Long]
        it.foreach { r =>
          val k = r.get(0)
          sub.update(k, sub.getOrElse(k, 0L) + r.getLong(2))
        }
        sub.iterator.map { case (k, c) => (pid, k, c) }
      }.collect()

    // Driver-side prefix sums: rank offset of each (partition, key), total n
    // per key, and the target ranks each percentile needs.
    val offsets = mutable.HashMap.empty[(Int, Any), Long]
    val totals = mutable.HashMap.empty[Any, Long]
    partials.sortBy(_._1).foreach { case (pid, k, c) =>
      val sofar = totals.getOrElse(k, 0L)
      offsets.update((pid, k), sofar)
      totals.update(k, sofar + c)
    }
    val targetRanks: Map[Any, Array[Long]] = totals.iterator.map { case (k, n) =>
      val ranks = ps.flatMap { p =>
        val pos = 1.0 + p * (n - 1).toDouble
        Seq(math.floor(pos).toLong, math.ceil(pos).toLong)
      }.distinct.sorted.toArray
      k -> ranks
    }.toMap
    val bOffsets = spark.sparkContext.broadcast(offsets.toMap)
    val bTargets = spark.sparkContext.broadcast(targetRanks)

    // Pass 3: emit only rank-boundary values.
    val boundarySchema = StructType(Seq(
      StructField("__rank", LongType, nullable = false),
      StructField("__bv", DoubleType, nullable = false)))
    val keyField = sorted.schema.fields(0).copy(name = "__k")
    val boundaries = spark.createDataFrame(
      sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
        val offs = bOffsets.value
        val targets = bTargets.value
        var curKey: Any = null
        var cum = 0L
        var started = false
        it.flatMap { r =>
          val k = r.get(0)
          if (!started || k != curKey) {
            curKey = k; started = true
            cum = offs.getOrElse((pid, k), 0L)
          }
          val c = r.getLong(2)
          val lo = cum + 1
          val hi = cum + c
          cum = hi
          val ranks = targets.getOrElse(k, Array.empty[Long])
          // ranks is sorted and tiny (<= 2|ps|): linear scan is fine.
          ranks.iterator.filter(rk => rk >= lo && rk <= hi)
            .map(rk => Row(k, rk, r.getDouble(1)))
        }
      },
      StructType(keyField +: boundarySchema.fields))

    // Distributed interpolation: targets as a (broadcastable) DataFrame.
    val targetRows = targetRanks.iterator.flatMap { case (k, _) =>
      val n = totals(k)
      ps.map { p =>
        val pos = 1.0 + p * (n - 1).toDouble
        Row(k, p, pos, math.floor(pos).toLong, math.ceil(pos).toLong)
      }
    }.toSeq
    val targetsDf = spark.createDataFrame(
      spark.sparkContext.parallelize(targetRows, 1),
      StructType(Seq(keyField,
        StructField("p", DoubleType, nullable = false),
        StructField("__pos", DoubleType, nullable = false),
        StructField("__rlo", LongType, nullable = false),
        StructField("__rhi", LongType, nullable = false))))

    boundaries.join(broadcast(targetsDf), Seq("__k"))
      .filter(col("__rank") === col("__rlo") || col("__rank") === col("__rhi"))
      .groupBy(col("__k"), col("p"), col("__pos"), col("__rlo"), col("__rhi"))
      .agg(
        max(when(col("__rank") === col("__rlo"), col("__bv"))).as("__vlo"),
        max(when(col("__rank") === col("__rhi"), col("__bv"))).as("__vhi"))
      .select(col("__k").as(keyCol), col("p"),
        when(col("__rlo") === col("__rhi"), col("__vlo"))
          .otherwise(
            (col("__rhi") - col("__pos")) * col("__vlo") +
              (col("__pos") - col("__rlo")) * col("__vhi"))
          .as("value"))
  }

  /** Wide form: one row per key, one column per requested percentile. */
  def percentileContWide(df: DataFrame, keyCol: String, valueCol: String,
                         ps: Seq[(Double, String)]): DataFrame =
    percentileCont(df, keyCol, valueCol, ps.map(_._1))
      .groupBy(col(keyCol))
      .agg(
        max(when(col("p") === ps.head._1, col("value"))).as(ps.head._2),
        ps.tail.map { case (p, name) =>
          max(when(col("p") === p, col("value"))).as(name)
        }: _*)
}
