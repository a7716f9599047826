package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** k-anonymity release gating: the anonymity-set guarantee on RELEASED
  * keys, the leftover semantics that makes it real, and the full
  * 3-column generalization ladder.
  */
class PrivacySpec extends SparkSpec {
  import spark.implicits._

  test("every released key is shared by >= k released rows (the k-anonymity guarantee)") {
    val d = (1 to 12).map(i => (i.toLong, "a", "x")) ++  // (a,x): 12
      (13 to 15).map(i => (i.toLong, "a", "y")) ++       // (a,y): 3
      (16 to 27).map(i => (i.toLong, "b", if (i % 2 == 0) "x" else "y")) // b: 6+6
    val out = Privacy.kAnonymize(d.toDF("id", "q1", "q2"), Seq("q1", "q2"), k = 5L)
    val byKey = out.filter(col("anon_level") < 2)
      .groupBy(col("released_key")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byKey.values.forall(_ >= 5L), s"undersized anonymity set: $byKey")
    // and the reported group size IS the released-set size
    val sizes = out.filter(col("anon_level") < 2)
      .select(col("released_key"), col("anon_group_size")).distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes == byKey, s"reported $sizes vs actual $byKey")
  }

  test("leftover semantics: a coarse group that only reaches k with RELEASED rows stays suppressed") {
    // (a,x) has 10 >= k=10 -> released at level 0. (a,y) has 3; the 'a'
    // LEFTOVER mass is 3 < 10, so (a,y) suppresses — even though ALL 'a'
    // rows total 13 >= 10. Counting released level-0 rows into the
    // coarser key would publish an 'a/*' key covering only 3 rows.
    val d = (1 to 10).map(i => (i.toLong, "a", "x")) ++
      (11 to 13).map(i => (i.toLong, "a", "y"))
    val out = Privacy.kAnonymize(d.toDF("id", "q1", "q2"), Seq("q1", "q2"), k = 10L)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("anon_level"), r.getAs[String]("released_key")))).toMap
    (1L to 10L).foreach(i => assert(out(i) == ((0L, "a/x"))))
    (11L to 13L).foreach(i => assert(out(i) == ((2L, "*/*")), s"doc $i: ${out(i)}"))
    // suppressed rows carry a null group size
    val sup = Privacy.kAnonymize(d.toDF("id", "q1", "q2"), Seq("q1", "q2"), k = 10L)
      .filter(col("anon_level") === 2)
    assert(sup.filter(col("anon_group_size").isNotNull).count() == 0)
  }

  test("NULL quasi-identifiers are their own category, never dropped") {
    // a missing value still identifies: 5 null-lang rows form a group
    // that reaches k and releases with "null" in the key; the lone
    // (b, de) row suppresses — and EVERY input row appears in the output
    // (the naive column-list join-back would silently drop null-QI rows)
    val d = (1 to 5).map(i => (i.toLong, "a", null: String)) ++
      Seq((6L, "b", "de"))
    val out = Privacy.kAnonymize(d.toDF("id", "q1", "q2"), Seq("q1", "q2"), k = 5L)
    assert(out.count() == 6, "one output row per input row, nulls included")
    val got = out.collect().map(r => r.getAs[Long]("id") ->
      ((r.getAs[Long]("anon_level"), r.getAs[String]("released_key")))).toMap
    (1L to 5L).foreach(i => assert(got(i) == ((0L, "a/null")), s"doc $i: ${got(i)}"))
    assert(got(6L) == ((2L, "*/*")))
  }

  test("3-column ladder: levels climb one generalization at a time") {
    // QI = (region, site, lang), k = 4:
    //  - (r1, s1, en): 4 rows -> level 0, key r1/s1/en
    //  - (r1, s1, de) 2 + (r1, s2, fr) 2 -> site-level leftovers: s1 has
    //    2 (<4), s2 has 2 (<4) -> roll to region: r1 leftover 4 -> level
    //    2, key r1/*/*
    //  - (r2, s9, zh): 3 alone -> all ladder levels fail -> suppressed
    val d =
      (1 to 4).map(i => (i.toLong, "r1", "s1", "en")) ++
      Seq((5L, "r1", "s1", "de"), (6L, "r1", "s1", "de"),
        (7L, "r1", "s2", "fr"), (8L, "r1", "s2", "fr"),
        (9L, "r2", "s9", "zh"), (10L, "r2", "s9", "zh"), (11L, "r2", "s9", "zh"))
    val out = Privacy.kAnonymize(
        d.toDF("id", "region", "site", "lang"),
        Seq("region", "site", "lang"), k = 4L)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("anon_level"), r.getAs[String]("released_key")))).toMap
    (1L to 4L).foreach(i => assert(out(i) == ((0L, "r1/s1/en"))))
    (5L to 8L).foreach(i => assert(out(i) == ((2L, "r1/*/*")), s"doc $i: ${out(i)}"))
    (9L to 11L).foreach(i => assert(out(i) == ((3L, "*/*/*")), s"doc $i: ${out(i)}"))
  }
}
