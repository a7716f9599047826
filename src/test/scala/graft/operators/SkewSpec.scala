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

  test("boilerplateStats: one phrase planted in every document (hot tid)") {
    // The op's own target case: a phrase occurring in ~all documents is
    // the hottest possible tid key. The phrase document-frequency must
    // be an aggregate + join-back (map-side partials collapse the hot
    // key; AQE splits the join), never a window over the tid partition.
    val docs = (0L until 2000L)
      .map(i => (i, s"common phrase shared by all docs u${i}a u${i}b u${i}c u${i}d"))
      .toDF("doc_id", "text")
    val out = Dedup.boilerplateStats(docs, "doc_id", "text", k = 5, minDocs = 1000)
    val windows = out.queryExecution.executedPlan.toString
    assert(!windows.contains("Window"),
      s"hot-key phrase frequency must not plan a window:\n$windows")
    val rows = out.collect()
    assert(rows.length == 2000)
    // 10 tokens -> 6 five-grams per doc; exactly 2 of them ("common
    // phrase shared by all" / "phrase shared by all docs") occur in all
    // 2000 documents, the other 4 contain unique tokens
    rows.foreach { r =>
      assert(r.getAs[Long]("n_phrases") == 6L)
      assert(r.getAs[Long]("n_boiler") == 2L)
      assert(math.abs(r.getAs[Double]("boiler_frac") - 2.0 / 6.0) < 1e-15)
    }
  }
}
