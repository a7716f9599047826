package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  // "apple" and "kiwi" both have df=2 (docs 2 and 5) so their idf is
  // identical — the saturation test isolates the tf term.
  private val corpus = Seq(
    (1L, "apricot banana cherry date elderberry fig"),
    (2L, "apple apple apple kiwi lime mango"),
    (3L, "banana banana nut oat pea quince"),
    (4L, "rice soy tea ugli vanilla wheat"),
    (5L, "apple banana apple banana nut fig oat pea tea soy lime kiwi")
  ).toDF("doc_id", "text")

  private def top(q: String, k: Int = 5) = {
    val queries = Seq((100L, q)).toDF("query_id", "qtext")
    Retrieval.bm25TopK(corpus, queries, "doc_id", "text", "query_id", "qtext", k = k)
      .orderBy(col("rank"))
      .select("doc_id", "score_micro").as[(Long, Long)].collect()
  }

  test("docs matching both query terms outrank single-term docs") {
    val got = top("apple banana")
    // docs 1, 2, 3, 5 all match something; doc 4 matches nothing
    assert(!got.map(_._1).contains(4L))
    assert(got.head._1 == 5L, // the only doc with both terms
      s"the two-term match must rank first, got ${got.toSeq}")
    assert(got.map(_._2).forall(_ > 0))
    // ranking is strictly by (score desc, doc_id asc)
    val scores = got.map(_._2)
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("term saturation: tf=3 does not triple the single-occurrence score") {
    val one = top("kiwi").toMap // docs 2 and 5 contain kiwi once each
    assert(one.keySet == Set(2L, 5L))
    val rich = top("apple").toMap // doc 2 has tf=3; df matches kiwi's
    // doc 2's apple score grows sub-linearly vs its own kiwi (tf=1,
    // same doc, same df=2, hence identical idf): less than 3x despite 3x tf
    assert(rich(2L) < 3 * one(2L),
      s"saturation must damp tf: ${rich(2L)} vs ${one(2L)}")
    assert(rich(2L) > one(2L), "more occurrences still score higher")
  }

  test("length normalization: same tf in a shorter doc scores higher") {
    val got = top("nut").toMap // doc 3 (6 tokens) and doc 5 (12 tokens), tf=1 each
    assert(got.keySet == Set(3L, 5L))
    assert(got(3L) > got(5L), s"shorter doc must win: $got")
  }

  test("k caps the result and empty-match queries return nothing") {
    assert(top("apple banana", k = 2).length == 2)
    assert(top("zzz").isEmpty)
  }
}
