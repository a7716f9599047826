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

  // --- Joins.saltedJoin: plan-time salting for the mega-key regime ---

  private def saltFixture() = {
    // one mega-key (id 7, 5k rows) + spread keys + null keys + exact
    // duplicate left rows (the one case whose spread degrades, result
    // multiset still exact)
    val left = spark.range(5000).select(lit(7L).as("k"), (col("id") % 3).as("lv"))
      .union(spark.range(300).select((col("id") % 50).as("k"), col("id").as("lv")))
      .union(spark.range(5).select(lit(null).cast("long").as("k"), col("id").as("lv")))
    val right = spark.range(40).select(col("id").as("k"), (col("id") * 100).as("rv"))
      .union(spark.range(3).select(lit(null).cast("long").as("k"), col("id").as("rv")))
    (left, right)
  }

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("saltedJoin: result-identical to the plain join for every supported type") {
    val (left, right) = saltFixture()
    for (jt <- Seq("inner", "left", "left_semi", "left_anti")) {
      val plain = left.join(right, Seq("k"), jt)
      val salted = Joins.saltedJoin(left, right, Seq("k"), salts = 8, joinType = jt)
      assert(salted.columns.toSeq == plain.columns.toSeq, s"schema drift for $jt")
      assert(sortedRows(salted) == sortedRows(plain), s"row drift for $jt")
    }
    intercept[IllegalArgumentException] {
      Joins.saltedJoin(left, right, Seq("k"), 8, joinType = "full_outer")
    }
  }

  test("saltedJoin: the shuffle key includes the salt (no broadcast fallback)") {
    val prev = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val (left, right) = saltFixture()
      val salted = Joins.saltedJoin(left, right, Seq("k"), salts = 8)
      val plan = salted.queryExecution.executedPlan.toString
      assert(plan.contains("__salt"),
        s"expected the salt in the join/shuffle keys:\n$plan")
      assert(!salted.columns.contains("__salt"), "salt must not leak to output")
      // mega-key spread: with 8 salts the 5k-row key lands in >1 partition
      // of the left shuffle by construction (distinct salt values observed)
      val l = left.withColumn("__salt",
        pmod(xxhash64(struct(left.columns.map(col): _*)), lit(8)))
      val spread = l.filter(col("k") === 7L).select("__salt").distinct().count()
      assert(spread > 1, s"mega-key rows all landed on one salt ($spread)")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
