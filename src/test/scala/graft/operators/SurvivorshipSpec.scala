package graft.operators

import graft.SparkSpec

class SurvivorshipSpec extends SparkSpec {
  import spark.implicits._

  test("goldenRecord: plurality per attribute, ties to the smallest value") {
    val df = Seq(
      (1L, "en", "web"), (1L, "en", "books"), (1L, "de", "web"),
      (2L, "fr", "web"), (2L, "it", "web")) // lang tie 1-1 -> "fr"
      .toDF("e", "lang", "source")
    val out = Survivorship.goldenRecord(df, "e", Seq("lang", "source"))
      .collect().map(r => r.getAs[Long]("e") -> r).toMap
    val r1 = out(1L)
    assert(r1.getAs[Long]("n_records") == 3L)
    assert(r1.getAs[String]("lang") == "en")
    assert(r1.getAs[Long]("lang_n_values") == 2L)
    assert(r1.getAs[String]("source") == "web")
    assert(r1.getAs[Long]("source_n_values") == 2L)
    val r2 = out(2L)
    assert(r2.getAs[String]("lang") == "fr") // tie breaks low
    assert(r2.getAs[Long]("lang_n_values") == 2L)
    assert(r2.getAs[Long]("source_n_values") == 1L)
  }

  test("goldenRecord: null attributes are skipped; all-null stays null") {
    val df = Seq(
      (1L, "en", null), (1L, null, null), (1L, "en", null))
      .asInstanceOf[Seq[(Long, String, String)]]
      .toDF("e", "lang", "source")
    val r = Survivorship.goldenRecord(df, "e", Seq("lang", "source"))
      .collect()(0)
    assert(r.getAs[Long]("n_records") == 3L) // null-attr rows still counted
    assert(r.getAs[String]("lang") == "en")
    assert(r.getAs[Long]("lang_n_values") == 1L)
    assert(r.getAs[String]("source") == null)
    assert(Option(r.getAs[Any]("source_n_values")).isEmpty)
  }

  test("goldenRecord: null entities dropped; non-string attrs stringify") {
    val df = Seq(
      (java.lang.Long.valueOf(1L), 7),
      (java.lang.Long.valueOf(1L), 7),
      (java.lang.Long.valueOf(1L), 9),
      (null.asInstanceOf[java.lang.Long], 5))
      .toDF("e", "score")
    val out = Survivorship.goldenRecord(df, "e", Seq("score")).collect()
    assert(out.length == 1)
    assert(out(0).getAs[String]("score") == "7")
    assert(out(0).getAs[Long]("score_n_values") == 2L)
  }

  test("fingerprintClusters: permutation/case/punctuation collapse, word change splits") {
    val docs = Seq(
      (1L, "Hello, World!"),
      (2L, "world ... HELLO"),   // permutation + case + punctuation
      (3L, "hello hello world"), // duplicate token collapses
      (4L, "hello there world"), // real extra word -> different key
      (5L, "unique text here"))
      .toDF("id", "t")
    val out = Survivorship.fingerprintClusters(docs, "id", "t").collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("n_records") == 3L)
    assert(out(0).getAs[Long]("n_variants") == 3L)
    assert(out(0).getAs[Long]("canonical_id") == 1L)
  }

  test("fingerprintClusters: exact duplicates count records but one variant") {
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "b a")).toDF("id", "t")
    val out = Survivorship.fingerprintClusters(docs, "id", "t").collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("n_records") == 3L)
    assert(out(0).getAs[Long]("n_variants") == 2L)
  }

  test("goldenRecord: degenerate arguments rejected") {
    val df = Seq((1L, "a")).toDF("e", "v")
    intercept[IllegalArgumentException] {
      Survivorship.goldenRecord(df, "e", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Survivorship.goldenRecord(df, "e", Seq("e"))
    }
  }
}
