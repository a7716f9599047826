package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** EditDistance.pairs — FastSS deletion-neighborhood join.
  *
  * The oracle queries (q165/q166) prove completeness against DuckDB's
  * cross join on the driver's tables; this spec pins the same property
  * on adversarial in-process dictionaries (short strings, duplicates,
  * nulls, empties, unicode) against an in-process brute force, and pins
  * the plan shape: candidates form only through the variant equi-join —
  * no cartesian, no broadcast nested loop.
  */
class EditDistanceSpec extends SparkSpec {
  import spark.implicits._

  /** Reference unit-cost Levenshtein (full DP, no banding). */
  private def lev(a: String, b: String): Int = {
    val (n, m) = (a.length, b.length)
    val dp = Array.tabulate(n + 1)(i => i)
    var j = 1
    while (j <= m) {
      var prev = dp(0); dp(0) = j
      var i = 1
      while (i <= n) {
        val t = dp(i)
        dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
          prev + (if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1))
        prev = t
        i += 1
      }
      j += 1
    }
    dp(n)
  }

  private def brute(strs: Seq[String], tau: Int): Set[(String, String, Long)] = {
    val d = strs.filter(_ != null).distinct
    (for {
      a <- d; b <- d if a < b
      dist = lev(a, b) if dist <= tau
    } yield (a, b, dist.toLong)).toSet
  }

  private val dict: Seq[String] = Seq(
    "gear", "gears", "fear", "year", "years", "ear", "e", "", null,
    "gear", // duplicate — must not duplicate pairs
    "red bolt", "red bolts", "rod bolt", "old bolt",
    "naïve", "naive", "navie", // unicode + transposition (= 2 substitutions)
    "a", "b", "ab", "ba", "abc")

  test("tau=1 matches brute force on the adversarial dictionary") {
    val got = EditDistance.pairs(dict.toDF("s"), "s", tau = 1)
      .as[(String, String, Long)].collect().toSet
    assert(got === brute(dict, 1))
  }

  test("tau=2 matches brute force on the adversarial dictionary") {
    val got = EditDistance.pairs(dict.toDF("s"), "s", tau = 2)
      .as[(String, String, Long)].collect().toSet
    assert(got === brute(dict, 2))
  }

  test("tau=2 matches brute force on a seeded random dictionary") {
    val rnd = new scala.util.Random(42)
    val strs = Seq.fill(300)(
      (0 until (3 + rnd.nextInt(8))).map(_ => ('a' + rnd.nextInt(3)).toChar)
        .mkString) // 3-letter alphabet: dense near-pair space
    val got = EditDistance.pairs(strs.toDF("s"), "s", tau = 2)
      .as[(String, String, Long)].collect().toSet
    assert(got === brute(strs, 2))
    assert(got.nonEmpty) // the fixture must actually exercise the join
  }

  test("no cartesian or broadcast-nested-loop in the candidate plan") {
    val plan = EditDistance.pairs(dict.toDF("s"), "s", tau = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("all-null and empty inputs yield empty output, not an error") {
    assert(EditDistance.pairs(Seq[String](null, null).toDF("s"), "s", 1)
      .count() === 0L)
    assert(EditDistance.pairs(spark.emptyDataset[String].toDF("s"), "s", 2)
      .count() === 0L)
  }

  test("tau outside {1, 2} fails loudly") {
    intercept[IllegalArgumentException] {
      EditDistance.pairs(dict.toDF("s"), "s", tau = 3)
    }
  }

  test("pairsIncremental: batch-involved pairs only, equal to the filtered full join") {
    val rnd = new scala.util.Random(11)
    val strs = Seq.fill(200)(
      (0 until (3 + rnd.nextInt(6))).map(_ => ('a' + rnd.nextInt(3)).toChar)
        .mkString).distinct
    val (batch, history) = strs.partition(s => s.hashCode % 4 == 0)
    val inc = EditDistance.pairsIncremental(
        batch.toDF("s"), history.toDF("s"), "s", tau = 1)
      .as[(String, String, Long)].collect().toSet
    val bset = batch.toSet
    val full: Set[(String, String, Long)] =
      EditDistance.pairs(strs.toDF("s"), "s", tau = 1)
        .as[(String, String, Long)].collect().toSet
    val expected = full.filter(t => bset.contains(t._1) || bset.contains(t._2))
    assert(inc === expected)
    assert(inc.nonEmpty)
    // the fixture must exercise the batch-batch case too
    assert(inc.exists(t => bset.contains(t._1) && bset.contains(t._2)))
  }

  test("native LevenshteinWithin matches Spark's threshold levenshtein") {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val rnd = new scala.util.Random(7)
    val alpha = "abcdeé日ß" // multi-byte code points included
    val strs = Seq("", "a", "é", "日本語") ++ Seq.fill(400)(
      (0 until rnd.nextInt(12)).map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
    val pairs = strs.zip(rnd.shuffle(strs)).toDF("a", "b")
    for (tau <- Seq(0, 1, 2, 3, 5)) {
      val nativeCol = ColumnBridge.column(
        graft.functions.expressions.LevenshteinWithin(
          ColumnBridge.expression(col("a")), ColumnBridge.expression(col("b")), tau))
      val mism = pairs
        .select(nativeCol.as("n"), levenshtein(col("a"), col("b"), tau).as("s"))
        .where(col("n") =!= col("s")).count()
      assert(mism === 0L, s"tau=$tau")
    }
  }

  test("native DeletionVariants matches the HOF reference as a set") {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val strs = (dict.filter(_ != null) ++ Seq("日本語abc", "ééé")).toDF("s")
    for (tau <- Seq(1, 2)) {
      val nativeCol = ColumnBridge.column(
        graft.functions.expressions.DeletionVariants(
          ColumnBridge.expression(col("s")), tau))
      val mism = strs
        .select(array_sort(nativeCol).as("n"),
          array_sort(EditDistance.deletionVariantsHof("s", tau)).as("h"))
        .where(col("n") =!= col("h")).count()
      assert(mism === 0L, s"tau=$tau")
    }
  }
}
