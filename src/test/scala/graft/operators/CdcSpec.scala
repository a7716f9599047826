package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Content-defined chunking: tokens are conserved, chunk ids are
  * contiguous from 0, and — the point of CDC — a front-of-document
  * insertion leaves the later chunks' hashes intact.
  */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog while " +
    "rain falls softly on the quiet village roofs tonight and nobody minds"

  test("chunks tile the document exactly with contiguous ids") {
    val docs = Seq((0L, base)).toDF("doc_id", "text")
    val out = Dedup.cdcChunks(docs, "doc_id", "text", w = 3, divisor = 4L)
      .orderBy("chunk_idx").collect()
    val nTok = base.split(" ").length
    assert(out.map(_.getAs[Long]("n_tokens")).sum == nTok)
    assert(out.map(_.getAs[Long]("chunk_idx")).toSeq == out.indices.map(_.toLong))
    assert(out.length > 1, "divisor 4 on ~22 tokens must cut at least once")
  }

  test("a front insertion preserves later chunk hashes (unlike fixed stride)") {
    val docs = Seq((0L, base), (1L, "inserted " + base)).toDF("doc_id", "text")
    val chunks = Dedup.cdcChunks(docs, "doc_id", "text", w = 3, divisor = 4L)
      .select(col("doc_id"), col("chunk_hash")).collect()
    val a = chunks.filter(_.getLong(0) == 0L).map(_.getLong(1)).toSet
    val b = chunks.filter(_.getLong(0) == 1L).map(_.getLong(1)).toSet
    // content-decided boundaries re-synchronize after the edit
    assert((a intersect b).nonEmpty,
      s"CDC must share suffix chunks after an insertion: a=$a b=$b")
  }

  test("short documents form a single chunk 0") {
    val docs = Seq((0L, "a b")).toDF("doc_id", "text") // fewer than w tokens
    val out = Dedup.cdcChunks(docs, "doc_id", "text", w = 3, divisor = 4L).collect()
    assert(out.length == 1 && out.head.getAs[Long]("chunk_idx") == 0L
      && out.head.getAs[Long]("n_tokens") == 2L)
  }

  test("cdcNearDupPairs finds the insertion-edited near-dup, not the stranger") {
    val docs = Seq(
      (0L, base),
      (1L, "inserted " + base), // shares all post-boundary chunks with 0
      (2L, "completely different words about unrelated topics entirely " +
        "spark query engine optimizer shuffles partitions and executors run")
    ).toDF("doc_id", "text")
    val pairs = Dedup.cdcNearDupPairs(docs, "doc_id", "text",
        w = 3, divisor = 4L, maxDf = 10L, minJacPpm = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(5)))
    assert(pairs.map(p => (p._1, p._2)).toSeq == Seq((0L, 1L)),
      s"only the edited pair should surface: ${pairs.toSeq}")
    assert(pairs.head._3 >= 500000L,
      s"insertion-robust chunks should give high Jaccard: ${pairs.head._3}")
  }

  test("cdcChunkHashesCol matches cdcChunks hash-for-hash in order") {
    val texts = Seq(
      (0L, base),
      (1L, "inserted " + base),
      (2L, "a b"),            // shorter than w
      (3L, "solo"),
      (4L, "x x x x x x x x x x x x")
    ).toDF("doc_id", "text")
    val narrow = texts
      .select(col("doc_id"),
        Dedup.cdcChunkHashesCol(col("text"), w = 3, divisor = 4L).as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val relational = Dedup.cdcChunks(texts, "doc_id", "text", w = 3, divisor = 4L)
      .orderBy("doc_id", "chunk_idx")
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getAs[Long]("chunk_hash")).toSeq).toMap
    texts.collect().map(_.getLong(0)).foreach { id =>
      assert(narrow(id) == relational(id), s"doc $id: ${narrow(id)} vs ${relational(id)}")
    }
  }

  test("cdcNearDupPairsIncremental never pairs history with history") {
    val hist = Seq((0L, base), (1L, "inserted " + base)).toDF("doc_id", "text")
    val batch = Seq((10L, "prefix " + base)).toDF("doc_id", "text")
    val pairs = Dedup.cdcNearDupPairsIncremental(hist, batch,
        "doc_id", "text", w = 3, divisor = 4L, maxDf = 10L, minJacPpm = 1L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(6)))
    // history docs 0 and 1 are near-dups of each other, but only the
    // batch doc may appear on the left; every pair flags the other side.
    assert(pairs.nonEmpty && pairs.forall(_._1 == 10L), s"got ${pairs.toSeq}")
    assert(pairs.map(p => (p._2, p._3)).toSet == Set((0L, true), (1L, true)),
      s"batch doc must pair with both history near-dups: ${pairs.toSeq}")
  }

  test("cdcNearDupPairs excludes chunks above maxDf from signal and set size") {
    // The shared chunk "x y z" appears in all 4 docs -> df 4 > maxDf 3;
    // docs 0/1 additionally share a rare tail.
    val docs = Seq(
      (0L, "x y z p q r s t u"),
      (1L, "x y z p q r s t u"),
      (2L, "x y z m n o j k l"),
      (3L, "x y z g h i d e f")
    ).toDF("doc_id", "text")
    val pairs = Dedup.cdcNearDupPairs(docs, "doc_id", "text",
        w = 3, divisor = 2L, maxDf = 3L, minJacPpm = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.forall(p => p == ((0L, 1L))),
      s"the boilerplate head must not pair 2/3 with anyone: ${pairs.toSeq}")
  }

  test("native kernel == relational formulation == per-token HOF fold") {
    // all three paths, including the retired formulations kept as parity
    // references, on edge-heavy inputs: empty text, empty tokens (double
    // spaces), trailing space, multi-byte UTF-8, boundary-at-last-token
    val texts = (Seq(
      (0L, base), (1L, "inserted " + base), (2L, ""), (3L, "a  b  c d"),
      (4L, "trailing space "), (5L, "héllo wörld κόσμος tokens here okay"),
      (6L, "solo")) ++
      (7L until 30L).map(i => i -> (1 to 40).map(j =>
        s"w${(i * 31 + j * 7) % 13}").mkString(" ")))
      .toDF("doc_id", "text")
    for ((w, div) <- Seq((3, 4L), (3, 8L), (1, 2L), (5, 4L))) {
      val native = Dedup.cdcChunks(texts, "doc_id", "text", w, div)
        .orderBy("doc_id", "chunk_idx").collect()
        .map(r => (r.getLong(0), r.getAs[Long]("chunk_idx"),
          r.getAs[Long]("n_tokens"), r.getAs[Long]("chunk_hash"))).toSeq
      val relational = Dedup.cdcChunksRelational(texts, "doc_id", "text", w, div)
        .orderBy("doc_id", "chunk_idx").collect()
        .map(r => (r.getLong(0), r.getAs[Long]("chunk_idx"),
          r.getAs[Long]("n_tokens"), r.getAs[Long]("chunk_hash"))).toSeq
      assert(native == relational, s"w=$w div=$div")
      val hofHashes = texts.select(col("doc_id"),
          Dedup.cdcChunkHashesColViaHof(col("text"), w, div).as("hs"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val nativeHashes = texts.select(col("doc_id"),
          Dedup.cdcChunkHashesCol(col("text"), w, div).as("hs"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(nativeHashes == hofHashes, s"w=$w div=$div")
    }
  }
}
