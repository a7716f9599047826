package graft.operators

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("native Shingles kernel matches the HOF reference bitwise") {
    import graft.functions.TextFunctions
    val rng = new scala.util.Random(17)
    val rows = (0 until 50).map { i =>
      val n = rng.nextInt(8) // 0..7 tokens, crossing every n<k edge
      val base = Seq.fill(n)(rng.alphanumeric.take(1 + rng.nextInt(4)).mkString)
      // plant empty-string tokens (concat_ws keeps them, unlike nulls)
      (i.toLong, if (n > 2) base.updated(1, "") else base)
    }
    val df = rows.toDF("id", "toks")
    for (k <- Seq(1, 2, 3, 5)) {
      val native = df.select(org.apache.spark.sql.functions.col("id"),
          TextFunctions.shinglesOfTokens(
            org.apache.spark.sql.functions.col("toks"), k).as("s"))
        .orderBy("id").collect().map(_.getSeq[String](1)).toSeq
      val hof = df.select(org.apache.spark.sql.functions.col("id"),
          TextFunctions.shinglesOfTokensViaHof(
            org.apache.spark.sql.functions.col("toks"), k).as("s"))
        .orderBy("id").collect().map(_.getSeq[String](1)).toSeq
      assert(native == hof, s"k=$k")
    }
  }

  test("asof join picks nearest prior right row per key") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "a"),
      (1L, ts("2024-01-01 12:00:00"), "b"),
      (2L, ts("2024-01-01 10:30:00"), "c")
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), 100L),
      (1L, ts("2024-01-01 11:00:00"), 200L),
      (2L, ts("2024-01-01 11:00:00"), 300L) // after left → no match
    ).toDF("k", "rt", "payload")
    val out = Joins.asof(left, right, Seq("k"), "t", "rt", Seq("payload"))
      .orderBy("k", "t").collect()
    assert(out(0).getAs[Long]("asof_payload") == 100L) // 10:00 → 09:00
    assert(out(1).getAs[Long]("asof_payload") == 200L) // 12:00 → 11:00
    assert(out(2).isNullAt(out(2).fieldIndex("asof_payload"))) // no prior
  }

  test("asof join matches right row at exactly-equal timestamp") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "x")).toDF("k", "t", "tag")
    val right = Seq((1L, ts("2024-01-01 10:00:00"), 7L)).toDF("k", "rt", "p")
    val out = Joins.asof(left, right, Seq("k"), "t", "rt", Seq("p")).collect()
    assert(out(0).getAs[Long]("asof_p") == 7L)
  }

  test("range join pairs rows within [lo, hi) only") {
    val l = Seq((1L, ts("2024-01-01 10:00:00"))).toDF("k", "t")
    val r = Seq(
      (1L, ts("2024-01-01 10:00:00"), "at0"),
      (1L, ts("2024-01-01 10:04:59"), "in"),
      (1L, ts("2024-01-01 10:05:00"), "boundary"), // hi is exclusive
      (1L, ts("2024-01-01 09:59:59"), "before")
    ).toDF("k", "rt", "tag")
    val out = Joins.rangeJoin(l, r, Seq("k"), "t", "rt",
        expr("INTERVAL '0' SECOND"), expr("INTERVAL '5' MINUTE"))
      .select(col("tag")).as[String].collect().toSet
    assert(out == Set("at0", "in"))
  }

  test("custom AsofJoinExec matches the composed as-of join on real events") {
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val signups = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id"), col("ts").as("sts"))
      .agg(max(col("event_id")).as("signup_event_id"))
    val composed = Joins.asof(purchases, signups, Seq("user_id"), "ts", "sts",
        Seq("signup_event_id"))
      .select(col("event_id"), col("asof_signup_event_id"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val custom = Joins.asofMerge(purchases, signups, Seq("user_id"), "ts", "sts")
      .select(col("event_id"), col("asof_signup_event_id"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(custom == composed)
    assert(custom.nonEmpty && custom.values.exists(_ >= 0))
  }

  test("custom AsofJoinExec: equal-ts match, no-prior null, key isolation") {
    val l = Seq(
      (1L, ts("2024-01-01 10:00:00"), "A"),
      (1L, ts("2024-01-01 12:00:00"), "B"),
      (2L, ts("2024-01-01 10:30:00"), "C"),
      (3L, ts("2024-01-01 09:00:00"), "D")
    ).toDF("k", "t", "tag")
    val r = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L), // equal ts: matches A
      (1L, ts("2024-01-01 11:00:00"), 200L), // matches B
      (2L, ts("2024-01-01 11:00:00"), 300L), // after C: no match
      (4L, ts("2024-01-01 08:00:00"), 400L)  // key not on left
    ).toDF("k", "rt", "payload")
    val out = Joins.asofMerge(l, r, Seq("k"), "t", "rt")
    assert(out.queryExecution.executedPlan.toString.contains("AsofJoin"))
    val byTag = out.collect().map(row => row.getAs[String]("tag") ->
      (if (row.isNullAt(row.fieldIndex("asof_payload"))) -1L
       else row.getAs[Long]("asof_payload"))).toMap
    assert(byTag == Map("A" -> 100L, "B" -> 200L, "C" -> -1L, "D" -> -1L))
  }

  test("custom AsofJoinExec: null left timestamp yields null match, not epoch-0") {
    val l = Seq(
      (1L, Some(ts("2024-01-01 12:00:00")), "with_ts"),
      (1L, Option.empty[java.sql.Timestamp], "null_ts")
    ).toDF("k", "t", "tag")
    // right row at epoch start: a null left ts read as 0 would match it
    val r = Seq((1L, ts("1969-12-31 00:00:00"), 100L)).toDF("k", "rt", "payload")
    val out = Joins.asofMerge(l, r, Seq("k"), "t", "rt")
    val byTag = out.collect().map(row => row.getAs[String]("tag") ->
      row.isNullAt(row.fieldIndex("asof_payload"))).toMap
    assert(byTag == Map("with_ts" -> false, "null_ts" -> true))
  }

  test("custom RangeJoinExec matches the composed range join on real events") {
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts"))
    val all = ev.select(col("event_id").as("e2_id"), col("user_id"), col("ts").as("ts2"))
    val composed = Joins.rangeJoin(errors, all, Seq("user_id"), "ts", "ts2",
        expr("INTERVAL '0' SECOND"), expr("INTERVAL '5' MINUTE"))
      .select(col("l.event_id"), col("r.e2_id"))
      .as[(Long, Long)].collect().toSet
    val merged = Joins.rangeJoinMerge(errors, all, Seq("user_id"), "ts", "ts2",
        loMicros = 0L, hiMicros = 5L * 60 * 1000000)
      .select(col("event_id"), col("e2_id"))
      .as[(Long, Long)].collect().toSet
    assert(merged == composed, s"diff: ${(merged diff composed) ++ (composed diff merged)}")
    assert(merged.nonEmpty)
  }

  test("custom RangeJoinExec: boundary semantics and plan node") {
    val l = Seq((1L, ts("2024-01-01 10:00:00"), "L1")).toDF("k", "t", "ltag")
    val r = Seq(
      (1L, ts("2024-01-01 10:00:00"), "at0"),
      (1L, ts("2024-01-01 10:04:59"), "in"),
      (1L, ts("2024-01-01 10:05:00"), "atHi"),   // hi exclusive
      (1L, ts("2024-01-01 09:59:59"), "before"),
      (2L, ts("2024-01-01 10:00:00"), "otherKey")
    ).toDF("k", "rt", "rtag")
    val out = Joins.rangeJoinMerge(l, r, Seq("k"), "t", "rt",
      0L, 5L * 60 * 1000000)
    assert(out.queryExecution.executedPlan.toString.contains("RangeJoin"),
      "custom operator must be planned") // nodeName prints without "Exec"
    val tags = out.select("rtag").as[String].collect().toSet
    assert(tags == Set("at0", "in"))
  }

  test("custom RangeJoinExec handles empty groups, nulls, and self-join") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 10:03:00")),
      (2L, ts("2024-01-01 11:00:00")),
      (3L, ts("2024-01-01 12:00:00"))
    ).toDF("k", "t")
    val withNull = ev.union(Seq((0L, null.asInstanceOf[Timestamp])).toDF("k", "t"))
    // self range join: events within 5 minutes after each event, same key
    val out = Joins.rangeJoinMerge(withNull, withNull.withColumnRenamed("t", "t2")
        .withColumn("tag", lit("r")), Seq("k"), "t", "t2",
      0L, 5L * 60 * 1000000)
      .select(col("k"), col("t"), col("t2")).collect()
    // key 1: (10:00→10:00), (10:00→10:03), (10:03→10:03); keys 2,3 self only
    assert(out.length == 5)
  }

  test("keepFirst is deterministic under reordered input") {
    val rows = Seq((1L, 5L, "late"), (1L, 1L, "first"), (2L, 3L, "only"))
    val a = Dedup.keepFirst(rows.toDF("k", "seq", "v"), Seq("k"), Seq(col("seq").asc))
    val b = Dedup.keepFirst(rows.reverse.toDF("k", "seq", "v"), Seq("k"), Seq(col("seq").asc))
    val expect = Set((1L, "first"), (2L, "only"))
    assert(a.select("k", "v").as[(Long, String)].collect().toSet == expect)
    assert(b.select("k", "v").as[(Long, String)].collect().toSet == expect)
  }

  test("trailing count/sum decomposition equals the built-in RANGE frame") {
    import org.apache.spark.sql.expressions.{Window => W}
    // Adversarial fixture: ties at the exact threshold (us' == us - W is IN
    // the frame), duplicate timestamps (RANGE peers), an empty previous
    // bucket, bucket-boundary rows, and two keys.
    val W1 = 100L
    val rows = Seq(
      ("a", 1L, 0L, 1.0), ("a", 2L, 50L, 2.0), ("a", 3L, 100L, 3.0),
      ("a", 4L, 100L, 4.0), // duplicate ts: frame peer of row 3
      ("a", 5L, 150L, 5.0), // frame starts at 50 inclusive
      ("a", 6L, 199L, 6.0),
      ("a", 7L, 450L, 7.0), // bucket with empty predecessor
      ("b", 8L, 120L, 8.0), ("b", 9L, 220L, 9.0) // exact-threshold tie at 120
    ).toDF("k", "id", "us", "v")
    val got = Windows.trailingCountSum(rows, Seq("k"), "id", "us",
        col("v").cast("decimal(18,2)"), W1)
      .select(col("id"), col("n_trailing"), col("sum_trailing"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val frame = W.partitionBy(col("k")).orderBy(col("us"))
      .rangeBetween(-W1, 0)
    val want = rows.select(col("id"),
        count(lit(1)).over(frame).as("n"),
        sum(col("v").cast("decimal(18,2)")).over(frame).cast("double").as("s"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == want, s"got $got want $want")
    assert(want(9L) == ((2L, 17.0)), "us'=120 == 220-100 must be inside the frame")
  }

  test("session window: exact-gap successor extends; beyond-gap splits") {
    // gap = 10 min; +10:00 exactly abuts → same session; +10:00.001 → new
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1.0),
      (1L, ts("2024-01-01 00:10:00"), 1.0), // abuts: merged
      (1L, ts("2024-01-01 00:30:00"), 1.0)  // 20 min gap: new session
    ).toDF("user_id", "ts", "value")
    val out = Windows.session(df, "ts", "10 minutes", Seq("user_id"),
        Seq(count(lit(1)).as("n")))
      .orderBy("session_start").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("n") == 2L)
    assert(out(0).getAs[Timestamp]("session_end") == ts("2024-01-01 00:20:00"))
    assert(out(1).getAs[Long]("n") == 1L)
  }

  test("topK per group returns k rows with deterministic tiebreak") {
    val df = Seq(("a", 10, 1), ("a", 10, 2), ("a", 5, 3), ("b", 1, 4))
      .toDF("g", "score", "id")
    val out = TopK.perGroup(df, Seq("g"),
        Seq(col("score").desc, col("id").asc), 2)
      .select("g", "id").as[(String, Int)].collect().toSet
    assert(out == Set(("a", 1), ("a", 2), ("b", 4)))
  }

  test("map column functions: build, lookup, keys, entries round-trip") {
    val df = Seq((1L, Seq(("a", 10L), ("b", 20L)))).toDF("id", "kv")
      .select(col("id"),
        map_from_entries(transform(col("kv"),
          e => struct(e.getField("_1"), e.getField("_2")))).as("m"))
    val row = df.select(
      element_at(col("m"), "b").as("b_val"),
      sort_array(map_keys(col("m"))).as("keys"),
      map_contains_key(col("m"), "a").as("has_a"),
      size(map_entries(col("m"))).as("n")).collect()(0)
    assert(row.getAs[Long]("b_val") == 20L)
    assert(row.getAs[scala.collection.Seq[String]]("keys").toSeq == Seq("a", "b"))
    assert(row.getAs[Boolean]("has_a"))
    assert(row.getAs[Int]("n") == 2)
  }

  test("bloom prefilter: no false negatives, exact after join, empty build drops all") {
    val big = spark.range(0, 10000).select(col("id").as("k"), (col("id") % 7).as("v"))
    val small = spark.range(0, 10000).filter(col("id") % 100 === 0)
      .select(col("id").as("sk"))
    val pre = Joins.bloomPrefilter(big, col("k"), small, col("sk"),
      expectedItems = 1000L, numBits = 8000L)
    // No false negatives: every true match survives the prefilter.
    assert(pre.join(small, col("k") === col("sk")).count() == 100L)
    // Prefilter+join is result-identical to the plain join.
    val plain = big.join(small, col("k") === col("sk"))
    assert(pre.join(small, col("k") === col("sk"))
      .exceptAll(plain).isEmpty && plain.exceptAll(
        pre.join(small, col("k") === col("sk"))).isEmpty)
    // The bloom actually prunes: non-matching keys mostly gone (fpp ~2%).
    val kept = pre.count()
    assert(kept >= 100L && kept < 1000L, s"bloom kept $kept of 10000")
    // Empty build side → null filter → every probe row dropped.
    assert(Joins.bloomPrefilter(big, col("k"),
      small.filter(lit(false)), col("sk")).count() == 0L)
    // Lazy (scalar-subquery) form: same pruning, nothing runs at build.
    val lazyPre = Joins.bloomPrefilterLazy(big, col("k"), small, col("sk"),
      expectedItems = 1000L, numBits = 8000L)
    assert(lazyPre.queryExecution.analyzed != null) // plan builds eagerly-free
    assert(lazyPre.join(small, col("k") === col("sk")).count() == 100L)
    val lazyKept = lazyPre.count()
    assert(lazyKept >= 100L && lazyKept < 1000L, s"lazy bloom kept $lazyKept")
  }

  test("z-order layout: point predicates on the second dim prune partitions") {
    import graft.functions.Layout
    // 4096x4096 scrambled grid, 16 range partitions. An x-only layout
    // leaves every partition covering the full y range (y predicates
    // prune nothing); z-order tiles cover ~1/4 of y each.
    val df = spark.range(1 << 12).select(
      (col("id") * 2654435761L % 4096).as("x"),
      ((col("id") * 40503L + 7) % 4096).as("y"))
    def partitionsCovering(d: org.apache.spark.sql.DataFrame, yVal: Long): Long =
      d.withColumn("part", spark_partition_id())
        .groupBy("part").agg(min("y").as("lo"), max("y").as("hi"))
        .filter(col("lo") <= yVal && col("hi") >= yVal).count()
    val byX = df.repartitionByRange(16, col("x"))
    val byZ = df.repartitionByRange(16, Layout.interleaveBits(col("x"), col("y"), 12))
    assert(partitionsCovering(byX, 2000L) == 16L, "x-slabs never prune on y")
    val zCover = partitionsCovering(byZ, 2000L)
    assert(zCover <= 8L, s"z tiles should bound y; $zCover of 16 cover y=2000")
    // 3-column Morton key stays within long range and is monotone-safe.
    val z3 = df.select(Layout.interleaveBitsN(
      Seq(col("x"), col("y"), (col("x") + col("y")) % 4096), 12).as("z"))
    assert(z3.agg(min("z"), max("z")).collect()(0).getLong(0) >= 0L)
  }

  test("multimodal decode stub runs partition-wise over typed records") {
    import Multimodal._
    val ds = spark.createDataset(Seq(
      MediaRecord(1L, "image", Array.fill[Byte](100)(1)),
      MediaRecord(2L, "video", Array.fill[Byte](65)(2))))
    val out = decode(ds).collect().map(m => m.media_id -> m).toMap
    assert(out(1L).byte_len == 100L && out(1L).width == 100L && out(1L).n_frames == 11L)
    assert(out(2L).height == (65L * 7) % 480)
  }

  test("gapSensitivity: hand sweep — sessions, mean events, within-session time per threshold") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_micros}
    // user A: events at 0, 2min, 30min (gaps 2min, 28min)
    // user B: events at 0, 50min (gap 50min)
    val min = 60000000L
    val rows = Seq(("A", 0L, 1L), ("A", 2 * min, 2L), ("A", 30 * min, 3L),
      ("B", 0L, 4L), ("B", 50 * min, 5L))
      .toDF("u", "us", "eid")
      .withColumn("ts", timestamp_micros(col("us")))
    val out = Windows.gapSensitivity(rows, "u", "ts", "eid",
        gapMinutes = Seq(5L, 40L, 80L))
      .collect().map(r => r.getAs[Long]("gap_minutes") ->
        ((r.getAs[Long]("n_sessions"), r.getAs[Long]("mean_events_milli"),
          r.getAs[Long]("mean_dur_micros")))).toMap
    // T=5min: crossings 28min + 50min -> 2 + 2 = 4 sessions;
    // within = 2min; mean events = 5000/4 = 1250
    assert(out(5L) == ((4L, 1250L, 2 * min / 4)))
    // T=40min: crossing 50min only -> 3 sessions; within = 30min
    assert(out(40L) == ((3L, 1666L, 30 * min / 3)))
    // T=80min: no crossings -> 2 sessions; within = 80min total
    assert(out(80L) == ((2L, 2500L, 80 * min / 2)))
  }

  test("gapSensitivity: empty corpus yields zero sessions and null means, not a crash") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_micros}
    val empty = Seq.empty[(String, Long, Long)].toDF("u", "us", "eid")
      .withColumn("ts", timestamp_micros(col("us")))
    val out = Windows.gapSensitivity(empty, "u", "ts", "eid",
      gapMinutes = Seq(5L, 40L)).collect()
    assert(out.length == 2)
    out.foreach { r =>
      // a bare getAs[Long] would unbox NULL to 0 and pin nothing —
      // assert non-null THEN zero (the r10 review catch)
      assert(!r.isNullAt(r.fieldIndex("n_sessions")), "n_sessions null")
      assert(r.getAs[Long]("n_sessions") == 0L)
      assert(r.isNullAt(r.fieldIndex("mean_events_milli")))
      assert(r.isNullAt(r.fieldIndex("mean_dur_micros")))
    }
  }
}
