package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Null inputs must degrade gracefully in the round-4 text/vector ops —
  * zero-stat rows or dropped rows, never exceptions or poisoned
  * aggregates (the corpus tables have no nulls, but library callers'
  * tables will).
  */
class NullSafetySpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq((0L, Some("a b c d e f")), (1L, None))
    .toDF("doc_id", "text")

  test("boilerplateStats: null text yields a zero-stats row") {
    val out = Dedup.boilerplateStats(docs, "doc_id", "text", k = 3, minDocs = 2)
      .orderBy("doc_id").collect()
    assert(out.length == 2)
    assert(out(1).getAs[Long]("n_phrases") == 0L)
    assert(out(1).getAs[Double]("boiler_frac") == 0.0)
  }

  test("bigramScores: null text yields a zero-score row") {
    val out = LmScore.bigramScores(docs, docs.filter(col("doc_id") === 0L),
        "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.length == 2)
    assert(out(1).getAs[Long]("n_bigrams") == 0L)
    assert(out(1).getAs[Long]("avg_score") == 0L)
  }

  test("stupidBackoffScores: null text yields a zero-score row") {
    val out = LmScore.stupidBackoffScores(docs,
        docs.filter(col("doc_id") === 0L), "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.length == 2)
    assert(out(1).getAs[Long]("n_trigrams") == 0L)
    assert(out(1).getAs[Long]("n_oov") == 0L)
    assert(out(1).getAs[Long]("avg_score") == 0L)
  }

  test("signProject: a null vector projects to null, not an exception") {
    val vecs = Seq((0L, Some(Seq(1.0f, 2.0f))), (1L, None)).toDF("id", "vec")
    val out = Projection.signProject(vecs, "id", "vec", dim = 2, dOut = 3)
      .orderBy("id").collect()
    assert(out.length == 2)
    assert(!out(0).isNullAt(1) && out(0).getSeq[Long](1).size == 3)
    assert(out(1).isNullAt(1))
  }

  test("semanticDedupProjected: null vectors join into a null cell, survivors intact") {
    val vecs = Seq((0L, Some(Seq(1.0f, 1.0f))), (1L, Some(Seq(1.0f, 1.0f))),
      (2L, None)).toDF("id", "vec")
    val out = Clustering.semanticDedupProjected(vecs, "id", "vec",
        dim = 2, dOut = 2, k = 2, iters = 1, threshold = 0.99)
      .orderBy("id").collect()
    // id 1 is an exact dup of 0 -> dropped; the null row's cosine is
    // null (never >= threshold) so it survives with a null cell
    assert(out.map(_.getLong(0)).toSeq == Seq(0L, 2L))
  }

  test("waterFillCaps: null-sized domains are dropped, waterline unpoisoned") {
    val per = Seq(("a", Some(5L)), ("b", None), ("c", Some(100L)))
      .toDF("src", "n")
    val out = Budget.waterFillCaps(per, "src", "n", budget = 30L)
      .orderBy("src").collect()
    // b contributes nothing; [5, 100] at B=30 -> cap (30-5)/1 = 25
    assert(out.map(_.getString(0)).toSeq == Seq("a", "c"))
    assert(out.map(_.getAs[Long]("allocated")).toSeq == Seq(5L, 25L))
  }

  test("cdcChunks: null text drops the document, others unaffected") {
    val out = Dedup.cdcChunks(docs, "doc_id", "text", w = 3, divisor = 4L)
      .collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Long]("doc_id") == 0L))
  }

  test("vocab coverage: null text contributes no tokens") {
    val out = Vocab.coverage(docs, "doc_id", "text", topN = 100).collect()
    assert(out.length == 6) // a..f from doc 0 only
    assert(out.map(_.getAs[Long]("cnt")).sum == 6L)
  }

  test("kmeansFixed: a null vector gets a null cell, not an exception") {
    val vecs = Seq((0L, Some(Seq(0.0f, 0.0f))), (1L, Some(Seq(1.0f, 1.0f))),
      (2L, None)).toDF("id", "vec")
    val out = Clustering.kmeansFixed(vecs, "id", "vec", k = 2, iters = 1)
      .orderBy("id").collect()
    assert(out.length == 3)
    assert(!out(0).isNullAt(1) && !out(1).isNullAt(1))
    assert(out(2).isNullAt(1))
  }

  test("lineStats: null text drops the document, others unaffected") {
    val out = Repetition.lineStats(docs, "doc_id", "text", lineTokens = 2)
      .collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(0L))
    assert(out.head.getAs[Long]("n_lines") == 3L)
  }

  test("spanCorrupt: null text drops the document, others unaffected") {
    val out = SpanCorrupt.corrupt(docs, "doc_id", "text", maskPct = 15)
      .collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(0L))
    assert(out.head.getAs[Long]("n_tokens") == 6L)
  }

  test("cdcNearDupPairs: null text produces no pairs, no exception") {
    val three = Seq((0L, Some("a b c d e f")), (1L, Some("a b c d e f")),
      (2L, None)).toDF("doc_id", "text")
    val pairs = Dedup.cdcNearDupPairs(three, "doc_id", "text",
        w = 3, divisor = 2L, maxDf = 5L, minJacPpm = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((0L, 1L)))
  }

  test("domainWeights: a domain of null texts takes the max-loss path") {
    val d = Seq((0L, Some("a b a b"), "ref"), (1L, None, "broken"))
      .toDF("doc_id", "text", "source")
    val out = Doremi.domainWeights(d, d.filter(col("source") === "ref"),
        "doc_id", "text", "source", iters = 1)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // null text -> zero bigrams -> loss 0 via the greatest(nb, 1) guard
    assert(out("broken") == 0L && out("ref") == 0L)
  }

  test("packWhole: null token counts class as zero-length, not an exception") {
    val d = Seq((0L, Some(40L)), (1L, None), (2L, Some(10L)))
      .toDF("doc_id", "n")
    val got = graft.operators.Packing.packWhole(d, "doc_id", "n", 64L, m = 4)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("size_class")).toMap
    // null coalesces to 0 tokens -> tail class, weight 0, deterministic
    assert(got.keySet == Set(0L, 1L, 2L))
    assert(got(1L) == 4L)
  }

  test("paddingReport: null token counts land in bucket_len 1, not a NULL bucket") {
    val d = Seq(Some(5L), None, Some(1L), None).toDF("n")
    val got = graft.operators.Packing.paddingReport(d, "n", batchSize = 2L)
      .collect().map(r => r.getAs[Long]("bucket_len") ->
        r.getAs[Long]("n_docs")).toMap
    // nulls coalesce to 0 tokens -> bucket 1 with the 1-token doc
    assert(got == Map(1L -> 3L, 8L -> 1L))
  }

  test("weightedSample: negative ids hash onto [0,P) — monotone in weight") {
    val d = Seq((-5L, 100L, "g"), (-6L, 1L, "g"), (7L, 1L, "g"))
      .toDF("id", "w", "grp")
    val got = graft.operators.Sampling.weightedSample(
        d, Seq("grp"), "id", "w", k = 3)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("priority"))
      .toMap
    // pmod keeps every priority non-negative even for negative ids, and
    // the heavy negative id draws a smaller priority than the light one
    assert(got.values.forall(_ >= 0L), s"negative priority leaked: $got")
    assert(got(-5L) < got(-6L))
  }

  test("semanticContamination: corpus rows with null vectors report 0 hits") {
    val bench = Seq((100L, Seq(1.0f, 0.0f))).toDF("id", "vec")
    val corpus = Seq((0L, Some(Seq(0.9f, 0.1f))), (1L, None))
      .toDF("id", "vec")
    val got = graft.operators.Clustering.semanticContamination(
        corpus, bench, "id", "vec", k = 1, iters = 1, threshold = 0.5)
      .collect().map(r => r.getAs[Long]("id") ->
        r.getAs[Long]("n_bench_hits")).toMap
    assert(got(0L) == 1L && got(1L) == 0L)
  }

  test("crossSignalPairs: null text and null vectors drop silently") {
    val base = (1 to 60).map(i => s"tok${i % 17}w").mkString(" ")
    val docs = Seq((0L, Some(base + " t0")), (1L, Some(base + " t1")),
      (2L, None)).toDF("doc_id", "text")
    val e = Seq((0L, Some(Seq(1.0f, 0.0f))), (1L, None),
      (2L, Some(Seq(0.0f, 1.0f)))).toDF("doc_id", "embedding")
    val got = graft.operators.Similarity.crossSignalPairs(docs, e, "doc_id",
        "text", "embedding", kCells = 2, cosThreshold = 0.8)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        r.getAs[String]("verdict"), r.isNullAt(r.fieldIndex("cos"))))
    // the text pair (0,1) survives; its cos is null (doc 1 has no
    // usable vector) and the verdict stays text_only
    val p01 = got.find(_._1 == ((0L, 1L)))
    assert(p01.exists(x => x._2 == "text_only" && x._3))
  }
}
