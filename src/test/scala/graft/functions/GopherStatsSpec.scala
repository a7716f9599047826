package graft.functions

import graft.SparkSpec
import graft.functions.expressions.{CleanTokens, GopherStats}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** The kernel's contract is exact parity with the HOF chain q144's
  * DuckDB oracle replays: split(text, " ", -1) for n_words,
  * numChars - (n_words - 1) for char_sum, a stopword filter for n_stop
  * and array_distinct cardinality for n_types. Pinned against a direct
  * Scala split reference (edges + fuzz), against Spark's own HOF
  * evaluation on the sf0.001 corpus, and via SQL registration.
  */
class GopherStatsSpec extends SparkSpec {

  private val Stops = Seq("the", "a", "of", "to", "in")
  private val stopBytes = CleanTokens.toBytes(Stops)

  private def kernel(t: String): (Long, Long, Long, Long) = {
    val r = GopherStats.compute(UTF8String.fromString(t), stopBytes)
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  private def reference(t: String): (Long, Long, Long, Long) = {
    val words = t.split(" ", -1)
    val nWords = words.length.toLong
    val charSum = t.codePointCount(0, t.length).toLong - (nWords - 1)
    val nStop = words.count(Stops.contains).toLong
    val nTypes = words.distinct.length.toLong
    (nWords, charSum, nStop, nTypes)
  }

  test("edge cases match the split reference") {
    val cases = Seq(
      "", " ", "  ", "word", "the", "the the", "the a of to in",
      "a  b", " leading", "trailing ", " both ", "x y x y x",
      "the quick the quick the", "a-a a_a a.a", "único über雪 的 a",
      "one", "repeated repeated repeated repeated",
      "the  a   of    to     in", "tab\tis one token", "", "a b c d e f g")
    cases.foreach { t =>
      assert(kernel(t) == reference(t), s"input: ${t.take(60)}")
    }
  }

  test("fuzz: 20k random token soups match the split reference") {
    val rnd = new scala.util.Random(2244)
    val atoms = Array("the", "a", "of", "to", "in", "spark", "data", "x",
      "yy", "zzz", "", " ", "  ", "über", "的")
    (1 to 20000).foreach { _ =>
      val t = (0 until rnd.nextInt(30)).map(_ => atoms(rnd.nextInt(atoms.length))).mkString(" ")
      assert(kernel(t) == reference(t), s"input: ${t.take(80)}")
    }
  }

  test("corpus parity: kernel equals the HOF chain on sf0.001 documents") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val words = split(col("text"), " ")
    val hof = docs.select(col("doc_id"),
      size(words).cast("long").as("n_words"),
      (length(col("text")) - (size(words).cast("long") - 1)).cast("long").as("char_sum"),
      size(filter(words, w => Stops.map(sw => w === sw).reduce(_ || _)))
        .cast("long").as("n_stop"),
      size(array_distinct(words)).cast("long").as("n_types"))
    val nat = docs.select(col("doc_id"),
      TextFunctions.gopherStats(col("text"), Stops).as("g"))
      .select(col("doc_id"), col("g.n_words").as("n_words"),
        col("g.char_sum").as("char_sum"), col("g.n_stop").as("n_stop"),
        col("g.n_types").as("n_types"))
    assert(hof.exceptAll(nat).isEmpty && nat.exceptAll(hof).isEmpty,
      "native GopherStats diverges from the HOF chain on the corpus")
  }

  test("sql registration: gopher_stats works end-to-end") {
    val r = spark.sql(
      "SELECT gopher_stats('the quick the fox', array('the', 'a')) AS g")
      .selectExpr("g.n_words", "g.char_sum", "g.n_stop", "g.n_types")
      .collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      (4L, 14L, 2L, 3L))
  }
}
