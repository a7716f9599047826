package graft.operators

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AttributionSpec extends SparkSpec {
  import spark.implicits._

  private val H = 3600L * 1000L // one hour in millis
  private def ts(h: Long) = new Timestamp(1700000000000L + h * H)

  private def run(rows: Seq[(Long, Timestamp, Long, String, Double)]) =
    Attribution.multiTouch(
        rows.toDF("user_id", "ts", "event_id", "event_type", "value"),
        "user_id", "ts", "event_id", "event_type", "value",
        Seq("click", "view"), "purchase", windowMicros = 24L * 3600L * 1000000L)
      .collect().map(r => (r.getAs[String]("channel"),
        r.getAs[String]("model")) ->
        ((r.getAs[Long]("conversions_ppm"),
          r.getAs[Long]("revenue_milli_cents"),
          r.getAs[Long]("n_touches")))).toMap

  test("linear and U-shaped splits: exact ppm, remainder to the earliest") {
    // user 1: click@1, view@2, click@3 -> purchase@4 ($10.00)
    val out = run(Seq(
      (1L, ts(1), 1L, "click", 0.0), (1L, ts(2), 2L, "view", 0.0),
      (1L, ts(3), 3L, "click", 0.0), (1L, ts(4), 4L, "purchase", 10.0)))
    // linear: 333333 each, remainder 1 to the earliest (click@1)
    assert(out(("click", "linear"))._1 == 333334L + 333333L)
    assert(out(("view", "linear"))._1 == 333333L)
    // U-shaped: first 400000 (click), middle 200000 (view), last 400000 (click)
    assert(out(("click", "position"))._1 == 800000L)
    assert(out(("view", "position"))._1 == 200000L)
    // revenue milli-cents: 1000 cents * ppm / 1000 = ppm
    assert(out(("click", "linear"))._2 == 666667L)
    assert(out(("view", "linear"))._2 == 333333L)
    // every model's credit sums to exactly one conversion
    Seq("linear", "position").foreach { m =>
      val tot = out.collect { case ((_, `m`), v) => v._1 }.sum
      assert(tot == 1000000L, s"$m sums to $tot")
    }
  }

  test("journey reset: a touch credits its NEXT conversion only") {
    val out = run(Seq(
      (1L, ts(1), 1L, "click", 0.0), (1L, ts(2), 2L, "purchase", 1.0),
      (1L, ts(3), 3L, "view", 0.0), (1L, ts(4), 4L, "purchase", 2.0)))
    // click -> purchase@2 (whole credit); view -> purchase@4
    assert(out(("click", "linear"))._1 == 1000000L)
    assert(out(("view", "linear"))._1 == 1000000L)
    assert(out(("click", "linear"))._2 == 100000L)  // $1.00 = 100 cents
    assert(out(("view", "linear"))._2 == 200000L)
    assert(!out.contains(("direct", "linear")))
  }

  test("window, direct, and uncredited-tail rules") {
    val out = run(Seq(
      // touch 30h before its conversion: outside the 24h window
      (1L, ts(0), 1L, "click", 0.0), (1L, ts(30), 2L, "purchase", 1.0),
      // user 2: conversion with no touches at all
      (2L, ts(5), 3L, "purchase", 2.0),
      // user 3: touch AFTER the only purchase -> credits nothing
      (3L, ts(1), 4L, "purchase", 4.0), (3L, ts(2), 5L, "view", 0.0)))
    // all three conversions are direct under both models
    assert(out(("direct", "linear"))._1 == 3000000L)
    assert(out(("direct", "position"))._1 == 3000000L)
    assert(out(("direct", "linear"))._2 == 700000L) // 700 cents total
    assert(!out.contains(("click", "linear")))
    assert(!out.contains(("view", "linear")))
  }

  test("exact-ts collisions collapse: max event_id touch wins, values sum") {
    val out = run(Seq(
      (1L, ts(1), 7L, "click", 0.0), (1L, ts(1), 9L, "view", 0.0),
      (1L, ts(2), 10L, "purchase", 1.0), (1L, ts(2), 11L, "purchase", 2.0)))
    // one touch (view, id 9 > 7), one conversion worth $3.00
    assert(out(("view", "linear")) == ((1000000L, 300000L, 1L)))
    assert(!out.contains(("click", "linear")))
  }

  test("two-touch U-shape splits 50/50; n_touches counts credited touches") {
    val out = run(Seq(
      (1L, ts(1), 1L, "click", 0.0), (1L, ts(2), 2L, "view", 0.0),
      (1L, ts(3), 3L, "purchase", 1.0)))
    assert(out(("click", "position"))._1 == 500000L)
    assert(out(("view", "position"))._1 == 500000L)
    assert(out(("click", "linear"))._3 == 1L)
    assert(out(("view", "linear"))._3 == 1L)
  }
}
