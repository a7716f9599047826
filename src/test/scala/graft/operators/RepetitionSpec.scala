package graft.operators

import graft.SparkSpec

class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  test("duplicate lines are counted beyond the first occurrence") {
    // lineTokens=2: doc 0 has lines "a b","a b","c d" -> 3 lines, 1 dup.
    // chars: dup 3, total 9 -> dup_char_frac = 3/9.
    val docs = Seq(
      (0L, "a b a b c d"),
      (1L, "e f g h")
    ).toDF("doc_id", "text")
    val out = Repetition.lineStats(docs, "doc_id", "text", lineTokens = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out(0L) == ((3L, 1L, 1.0 / 3.0, 3.0 / 9.0)), s"doc 0: ${out(0L)}")
    assert(out(1L) == ((2L, 0L, 0.0, 0.0)), s"doc 1: ${out(1L)}")
  }

  test("remainder window forms a short final line") {
    // lineTokens=3 over 4 tokens -> lines "a b c", "d" (2 lines, 0 dups).
    val docs = Seq((0L, "a b c d")).toDF("doc_id", "text")
    val row = Repetition.lineStats(docs, "doc_id", "text", lineTokens = 3)
      .collect()(0)
    assert(row.getLong(1) == 2L && row.getLong(2) == 0L)
  }

  test("fully repetitive document approaches dup fraction 1") {
    val docs = Seq((0L, Seq.fill(8)("x y").mkString(" "))).toDF("doc_id", "text")
    val row = Repetition.lineStats(docs, "doc_id", "text", lineTokens = 2)
      .collect()(0)
    // 8 identical "x y" lines -> 7 duplicates.
    assert(row.getLong(1) == 8L && row.getLong(2) == 7L)
    assert(row.getDouble(3) == 7.0 / 8.0 && row.getDouble(4) == 7.0 / 8.0)
  }
}
