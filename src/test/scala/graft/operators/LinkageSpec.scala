package graft.operators

import graft.SparkSpec
import graft.operators.Linkage.LinkRule
import org.apache.spark.sql.functions._

class LinkageSpec extends SparkSpec {
  import spark.implicits._

  private def registries() = {
    val a = Seq(
      (1L, "anna", 10, 100L),
      (2L, "bob", 10, 500L),
      (3L, "carl", 20, 100L),
      (4L, null.asInstanceOf[String], 10, 100L))
      .toDF("a_id", "a_name", "a_blk", "a_bal")
    val b = Seq(
      (7L, "annA", 10, 120L),  // name within 1 edit of anna, bal close
      (8L, "robert", 10, 510L), // bal close to bob only
      (9L, "carl", 30, 100L))   // same name but different block
      .toDF("b_id", "b_name", "b_blk", "b_bal")
    (a, b)
  }

  private val rules = Seq(
    LinkRule("name", Linkage.levWithin(col("a_name"), col("b_name"), 1), 2000L, -500L),
    LinkRule("bal", abs(col("a_bal") - col("b_bal")) <= 50L, 1000L, -200L))

  test("fellegiSunter: hand-computed scores, classes, and blocking") {
    val (a, b) = registries()
    val out = Linkage.fellegiSunter(a, b, Seq("a_blk" -> "b_blk"),
      Seq("a_id", "b_id"), rules, tLo = 500L, tHi = 2500L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getBoolean(2), r.getBoolean(3), r.getLong(4), r.getString(5)))).toMap
    // (1,7): name agree + bal agree = 3000 -> match
    assert(out((1L, 7L)) == ((true, true, 3000L, "match")))
    // (2,8): bal agree only = -500+1000 = 500 -> possible
    assert(out((2L, 8L)) == ((false, true, 500L, "possible")))
    // (4,7): null name disagrees (-500) but bal agrees (+1000) -> possible
    assert(out((4L, 7L)) == ((false, true, 500L, "possible")))
    // (3,9) never paired: different block, despite identical name
    assert(!out.contains((3L, 9L)))
    // everything below tLo is cut
    assert(out.keySet == Set((1L, 7L), (2L, 8L), (4L, 7L)))
  }

  test("fellegiSunter: null fields disagree; keepNonMatches audits the block") {
    val (a, b) = registries()
    val all = Linkage.fellegiSunter(a, b, Seq("a_blk" -> "b_blk"),
      Seq("a_id", "b_id"), rules, 500L, 2500L, keepNonMatches = true)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getBoolean(2), r.getLong(4), r.getString(5)))).toMap
    // null name: levWithin is null -> coalesced to disagreement, never a
    // null score (the bal agreement still lifts the pair to possible)
    assert(all((4L, 7L)) == ((false, 500L, "possible")))
    // null name + far balance = both disagree -> non_match, score exact
    assert(all((4L, 8L)) == ((false, -700L, "non_match")))
    // full block audit: 3 a-rows x 2 b-rows in block 10
    assert(all.size == 6)
    intercept[IllegalArgumentException] {
      Linkage.fellegiSunter(a, b, Seq.empty, Seq("a_id"), rules, 0L, 0L)
    }
    // shared column names would make every rule reference ambiguous
    val e2 = intercept[IllegalArgumentException] {
      Linkage.fellegiSunter(a, a, Seq("a_blk" -> "a_blk"), Seq("a_id"),
        rules, 0L, 0L)
    }
    assert(e2.getMessage.contains("disjoint"))
    intercept[IllegalArgumentException] {
      LinkRule("bad", lit(true), -100L, 100L) // agree weight below disagree
    }
  }

  test("multi-pass blocking recovers matches a single pass misses, no dup pairs") {
    val a = Seq((1L, "anna", 10, 7L), (2L, "bob", 20, 8L))
      .toDF("a_id", "a_name", "a_blk", "a_blk2")
    val b = Seq((7L, "annA", 99, 7L), (8L, "bob", 20, 8L))
      .toDF("b_id", "b_name", "b_blk", "b_blk2")
    // pass 1 (a_blk): only (2,8) pairs; pass 2 (a_blk2): (1,7) AND (2,8)
    val out = Linkage.fellegiSunterMultiBlock(a, b,
        Seq(Seq("a_blk" -> "b_blk"), Seq("a_blk2" -> "b_blk2")),
        Seq("a_id", "b_id"),
        Seq(Linkage.LinkRule("name",
          Linkage.levWithin(col("a_name"), col("b_name"), 1), 2000L, -500L)),
        tLo = 1000L, tHi = 1500L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // (1,7) found only by pass 2; (2,8) found by both but emitted once
    assert(out.sorted.toSeq == Seq((1L, 7L), (2L, 8L)))
  }
}
