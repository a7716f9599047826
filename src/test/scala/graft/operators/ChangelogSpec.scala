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

  test("plan shape: one aggregate, no window, no join") {
    val plan = Changelog.compact(log.toDF("k", "ts", "seq", "op", "v"),
      "k", "ts", "seq", "op", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("Join"), plan)
  }
}
