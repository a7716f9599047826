package graft.operators

import graft.SparkSpec

class SpanCorruptSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference implementation of the documented semantics. */
  private def reference(id: Long, text: String, pct: Int): (String, String, Long, Long) = {
    val toks = text.split(" ", -1)
    val masked = toks.indices.map(i => (id * 1000003L + (i + 1) * 7919L) % 100 < pct)
    val in = new StringBuilder
    val tg = new StringBuilder
    var spans = 0L
    var prev = false
    for (i <- toks.indices) {
      if (masked(i)) {
        if (!prev) {
          spans += 1
          val s = s"<extra_id_${spans - 1}>"
          if (in.nonEmpty) in.append(' '); in.append(s)
          if (tg.nonEmpty) tg.append(' '); tg.append(s + " " + toks(i))
        } else {
          tg.append(' '); tg.append(toks(i))
        }
      } else {
        if (in.nonEmpty) in.append(' '); in.append(toks(i))
      }
      prev = masked(i)
    }
    (in.toString, tg.toString, masked.count(identity).toLong, spans)
  }

  test("corruption matches the independent reference on varied docs") {
    val docs = (0L to 40L).map(i =>
      (i, (1 to 30).map(j => s"t${(i * 7 + j) % 11}").mkString(" ")))
      .toDF("doc_id", "text")
    val got = SpanCorrupt.corrupt(docs, "doc_id", "text", maskPct = 15)
      .collect().map(r => r.getLong(0) ->
        (r.getString(4), r.getString(5), r.getLong(2), r.getLong(3))).toMap
    docs.collect().foreach { r =>
      val (id, text) = (r.getLong(0), r.getString(1))
      assert(got(id) == reference(id, text, 15), s"doc $id mismatch")
    }
  }

  test("unmasked and masked tokens partition the document") {
    val docs = Seq((3L, "a b c d e f g h i j k l m n o p"))
      .toDF("doc_id", "text")
    val row = SpanCorrupt.corrupt(docs, "doc_id", "text", maskPct = 50)
      .collect()(0)
    val sentinel = "<extra_id_\\d+>".r
    val inToks = row.getString(4).split(" ").filterNot(t => sentinel.matches(t))
    val tgToks = row.getString(5).split(" ").filterNot(t => sentinel.matches(t))
      .filter(_.nonEmpty)
    assert(row.getLong(1) == 16L)
    assert(inToks.length + tgToks.length == 16,
      s"in=${inToks.toSeq} tg=${tgToks.toSeq}")
    assert((inToks ++ tgToks).sorted.toSeq ==
      "a b c d e f g h i j k l m n o p".split(" ").sorted.toSeq)
  }

  test("maskPct 0 passes text through; maskPct 100 masks one full span") {
    val docs = Seq((1L, "x y z")).toDF("doc_id", "text")
    val none = SpanCorrupt.corrupt(docs, "doc_id", "text", maskPct = 0).collect()(0)
    assert(none.getString(4) == "x y z" && none.getString(5) == "" &&
      none.getLong(3) == 0L)
    val all = SpanCorrupt.corrupt(docs, "doc_id", "text", maskPct = 100).collect()(0)
    assert(all.getString(4) == "<extra_id_0>" &&
      all.getString(5) == "<extra_id_0> x y z" && all.getLong(3) == 1L)
  }
}
