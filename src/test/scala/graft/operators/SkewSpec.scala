package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Skew handling at the two levels SCALING.md describes: AQE's runtime
  * skew-join split (the default path) and explicit salting (the
  * deterministic fallback).
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits a skewed join partition at runtime") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // one hot key (~50k rows) vs a spread of small keys
      val big = spark.range(50000).select(lit(1L).as("k"), col("id").as("payload"))
        .union(spark.range(2000).select((col("id") % 100 + 2).as("k"), col("id")))
      val small = spark.range(200).select(col("id").as("k"), (col("id") * 10).as("w"))
      val joined = big.join(small, "k")
      // execute through the DataFrame's own QueryExecution (collect does;
      // count()/write would build a fresh one) so the AdaptiveSparkPlan we
      // inspect is the instance that finalized
      assert(joined.collect().length == 52000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"expected AQE skew-split markers in final plan:\n$finalPlan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
