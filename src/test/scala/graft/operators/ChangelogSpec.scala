package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChangelogSpec extends SparkSpec {
  import spark.implicits._

  private val log = Seq(
    // key a: insert, update, update — live at v=30
    ("a", 100L, 1L, "U", 10L), ("a", 200L, 2L, "U", 20L),
    ("a", 300L, 3L, "U", 30L),
    // key b: insert then delete — tombstone
    ("b", 100L, 4L, "U", 40L), ("b", 200L, 5L, "D", 0L),
    // key c: delete then REINSERT (the order matters: reinsert is newer)
    ("c", 100L, 6L, "U", 60L), ("c", 200L, 7L, "D", 0L),
    ("c", 300L, 8L, "U", 66L),
    // key d: same-ts changes disambiguated by seq
    ("d", 100L, 9L, "U", 90L), ("d", 100L, 10L, "U", 91L))

  private def snap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getAs[String]("k") ->
      ((r.getAs[Long]("v"), r.getAs[Long]("last_ts"), r.getAs[Long]("last_seq"),
        r.getAs[Boolean]("live"), r.getAs[Long]("n_changes")))).toMap

  test("latest-wins snapshot: upserts, tombstones, same-ts seq tie-break") {
    val out = snap(Changelog.compact(log.toDF("k", "ts", "seq", "op", "v"),
      "k", "ts", "seq", "op", Seq("v")))
    assert(out("a") == ((30L, 300L, 3L, true, 3L)))
    assert(out("b") == ((0L, 200L, 5L, false, 2L)))
    assert(out("c") == ((66L, 300L, 8L, true, 3L)))
    assert(out("d") == ((91L, 100L, 10L, true, 2L)))
  }

  test("incremental == whole-log, including delete-then-reinsert counts") {
    val (first, second) = log.partition(_._2 <= 200L)
    val whole = snap(Changelog.compact(log.toDF("k", "ts", "seq", "op", "v"),
      "k", "ts", "seq", "op", Seq("v")))
    val base = Changelog.compact(first.toDF("k", "ts", "seq", "op", "v"),
      "k", "ts", "seq", "op", Seq("v"))
    val inc = snap(Changelog.compactIncremental(base,
      second.toDF("k", "ts", "seq", "op", "v"),
      "k", "ts", "seq", "op", Seq("v")))
    assert(inc == whole)
  }

  test("stale delta rows cannot regress the snapshot (but still count)") {
    val base = Changelog.compact(
      Seq(("a", 500L, 9L, "U", 99L)).toDF("k", "ts", "seq", "op", "v"),
      "k", "ts", "seq", "op", Seq("v"))
    val out = snap(Changelog.compactIncremental(base,
      Seq(("a", 100L, 1L, "U", 11L), ("a", 200L, 2L, "D", 0L))
        .toDF("k", "ts", "seq", "op", "v"),
      "k", "ts", "seq", "op", Seq("v")))
    assert(out("a") == ((99L, 500L, 9L, true, 3L)))
  }

  test("scd2: intervals chain, deletes close without emitting, versions stable") {
    val out = Changelog.scd2(log.toDF("k", "ts", "seq", "op", "v"),
        "k", "ts", "seq", "op", Seq("v"))
      .collect().map(r => (r.getAs[String]("k"), r.getAs[Long]("version")) ->
        ((r.getAs[Long]("v"), r.getAs[Long]("valid_from"),
          Option(r.getAs[Any]("valid_to")).map(_.asInstanceOf[Long]),
          r.getAs[Boolean]("is_current")))).toMap
    // a: three chained versions, last open
    assert(out(("a", 1L)) == ((10L, 100L, Some(200L), false)))
    assert(out(("a", 2L)) == ((20L, 200L, Some(300L), false)))
    assert(out(("a", 3L)) == ((30L, 300L, None, true)))
    // b: one version CLOSED by the delete at ts 200; no current row
    assert(out(("b", 1L)) == ((40L, 100L, Some(200L), false)))
    assert(!out.contains(("b", 2L)))
    // c: delete-then-reinsert — version numbers count the delete (2)
    assert(out(("c", 1L)) == ((60L, 100L, Some(200L), false)))
    assert(out(("c", 3L)) == ((66L, 300L, None, true)))
    // d: same-ts versions ordered by seq
    assert(out(("d", 1L)) == ((90L, 100L, Some(100L), false)))
    assert(out(("d", 2L)) == ((91L, 100L, None, true)))
  }

  test("scd2: current rows equal the compact snapshot's live rows") {
    val df = log.toDF("k", "ts", "seq", "op", "v")
    val current = Changelog.scd2(df, "k", "ts", "seq", "op", Seq("v"))
      .filter(col("is_current"))
      .select("k", "v").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val live = Changelog.compact(df, "k", "ts", "seq", "op", Seq("v"))
      .filter(col("live"))
      .select("k", "v").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(current == live)
  }

  test("plan shape: one aggregate, no window, no join") {
    val plan = Changelog.compact(log.toDF("k", "ts", "seq", "op", "v"),
      "k", "ts", "seq", "op", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("Join"), plan)
  }
}
