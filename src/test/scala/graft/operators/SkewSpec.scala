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

  test("advisor: hand histogram — skew ratio, salt factor, null ledger") {
    // key "a": 6 rows, "b": 1, "c": 1, null: 2 -> n=8, ndv=3, max=6
    // mean = 8 div 3 = 2; skew_ppm = 6*3*1e6 div 8 = 2_250_000
    // salts = ceil(6*3/8) = (18+7) div 8 = 3
    val df = (Seq.fill(6)("a") ++ Seq("b", "c") ++ Seq.fill(2)(null))
      .map(Tuple1(_)).toDF("k")
    val r = Skew.advisor(df, Seq("k")).collect()(0)
    assert(r.getAs[String]("key") == "k")
    assert(r.getAs[Long]("n_rows") == 8L && r.getAs[Long]("n_null") == 2L)
    assert(r.getAs[Long]("ndv") == 3L && r.getAs[Long]("max_count") == 6L)
    assert(r.getAs[Long]("mean_count") == 2L)
    assert(r.getAs[Long]("skew_ppm") == 2250000L)
    assert(r.getAs[Long]("recommended_salts") == 3L)
  }

  test("advisor: uniform keys recommend no salting; all-null key degenerates") {
    val uniform = (1L to 40L).map(i => i % 8).map(Tuple1(_)).toDF("k")
    val u = Skew.advisor(uniform, Seq("k")).collect()(0)
    assert(u.getAs[Long]("skew_ppm") == 1000000L)
    assert(u.getAs[Long]("recommended_salts") == 1L)
    val nulls = Seq.fill(3)(Tuple1(null: java.lang.Long)).toDF("k")
    val n = Skew.advisor(nulls, Seq("k")).collect()(0)
    assert(n.getAs[Long]("n_rows") == 0L && n.getAs[Long]("n_null") == 3L)
    assert(n.getAs[Long]("ndv") == 0L)
    assert(Option(n.getAs[Any]("skew_ppm")).isEmpty)
    assert(Option(n.getAs[Any]("mean_count")).isEmpty)
  }

  test("joinSizeAudit: exact output size equals the actually-run join") {
    val left = Seq(1L, 1L, 1L, 2L, 2L, 3L, 9L).map(Tuple1(_)).toDF("lk")
    val right = (Seq(1L, 1L, 2L, 3L, 3L, 3L, 8L)
      .map(java.lang.Long.valueOf) :+ null.asInstanceOf[java.lang.Long])
      .map(Tuple1(_)).toDF("rk")
    val r = Skew.joinSizeAudit(left, "lk", right, "rk", "t").collect()(0)
    val actual = left.join(right, col("lk") === col("rk")).count()
    assert(r.getAs[Long]("out_rows") == actual) // 3*2 + 2*1 + 1*3 = 11
    assert(r.getAs[Long]("out_rows") == 11L)
    assert(r.getAs[Long]("n_left") == 7L && r.getAs[Long]("n_right") == 7L)
    assert(r.getAs[Long]("matched_keys") == 3L)
    assert(r.getAs[Long]("max_key_rows") == 6L) // key 1: 3*2
    assert(r.getAs[Long]("max_key_share_ppm") == 545454L)
  }

  test("joinSizeAudit: disjoint keys predict an empty join") {
    val a = Seq(1L, 2L).map(Tuple1(_)).toDF("k")
    val b = Seq(3L, 4L).map(Tuple1(_)).toDF("k")
    val r = Skew.joinSizeAudit(a, "k", b, "k", "empty").collect()(0)
    assert(r.getAs[Long]("out_rows") == 0L)
    assert(r.getAs[Long]("matched_keys") == 0L)
    assert(Option(r.getAs[Any]("max_key_share_ppm")).isEmpty)
  }

  test("advisor: recommended factor levels the hot key to at most the mean") {
    // hot key 1000 rows among 9 keys of ~100: factor should satisfy
    // max/factor <= ceil(mean)
    val rows = Seq.fill(1000)(1L) ++ (2L to 10L).flatMap(k => Seq.fill(100)(k))
    val r = Skew.advisor(rows.map(Tuple1(_)).toDF("k"), Seq("k")).collect()(0)
    val f = r.getAs[Long]("recommended_salts")
    val mean = r.getAs[Long]("mean_count")
    assert(f > 1)
    assert(1000L / f <= mean + 1,
      s"factor $f leaves the hot key above the mean $mean")
  }
}
