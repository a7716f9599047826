package graft.operators

import graft.SparkSpec
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

/** IVF+PQ composition: residual-encoded PQ inside coarse-quantizer cells
  * (IVFADC), shortlist + exact rerank. Correctness is recall vs exact L2
  * (quantization is engine-specific, so no SQL oracle — same policy as PQ
  * and k-means IVF); scale shape is plan-asserted (cell equi-join, no
  * cartesian, probe side broadcast).
  */
class IvfPqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
  private lazy val queries = emb.filter(col("vec_id") < 5)
  private lazy val corpus = emb.filter(col("vec_id") >= 5)
  // Deterministic coarse quantizer: every 50th vector (10 cells at sf0.001).
  private lazy val cents = emb.filter(col("vec_id") % 50 === 0)
    .select(col("vec_id").cast("long").as("cell"), col("embedding").as("cv"))

  private def exactTopK(k: Int): Set[(Long, Long)] = {
    val q = broadcast(queries.select(col("vec_id").as("query_id"), col("embedding").as("qv")))
    val scored = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
      .crossJoin(q)
      .select(col("query_id"), col("neighbor_id"),
        VectorFunctions.l2DistanceSq(col("qv"), col("cv")).as("d"))
    TopK.perGroupAgg(scored, Seq("query_id"), -col("d"), col("neighbor_id"), k)
      .select("query_id", "id").as[(Long, Long)].collect().toSet
  }

  test("IVFADC shortlist + exact rerank reaches recall >= 0.9@10") {
    val model = IvfPq.fit(corpus, "embedding", cents, m = 16, nCodes = 32)
    assert(model.cents.length == 10 && model.pq.dsub == 4)
    val encoded = IvfPq.encode(corpus, "vec_id", "embedding", model)
    val exact = exactTopK(10)

    // Pure IVFADC (no original vectors touched): residual tables + probes.
    val adc = IvfPq.topK(encoded, queries, "vec_id", "embedding",
        model, k = 10, nprobe = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recallAdc = (adc intersect exact).size.toDouble / exact.size
    assert(recallAdc >= 0.4, s"IVFADC recall@10 was $recallAdc")

    // Production shape: 10x over-fetch shortlist -> exact rerank.
    val reranked = IvfPq.topKReranked(encoded, corpus, queries,
        "vec_id", "embedding", model, k = 10, nprobe = 8, shortlistK = 100)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (reranked intersect exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"shortlist+rerank recall@10 was $recall")
  }

  test("bounded-query-set contract: oversized query frames fail fast, not OOM") {
    val model = IvfPq.fit(corpus, "embedding", cents, m = 16, nCodes = 32)
    val encoded = IvfPq.encode(corpus, "vec_id", "embedding", model)
    // driver-side probe tables are per-query — the guard caps the
    // collect at bound+1 rows (one action, nothing past the bound ever
    // reaches the driver) and fails naming the bound
    val ex = intercept[IllegalArgumentException] {
      IvfPq.topK(encoded, queries, "vec_id", "embedding",
        model, k = 2, nprobe = 2, maxQueryRows = 3L)
    }
    assert(ex.getMessage.contains("driver-side") && ex.getMessage.contains("3"))
    // within the bound, results are identical to the default path
    val bounded = IvfPq.topK(encoded, queries, "vec_id", "embedding",
        model, k = 2, nprobe = 2, maxQueryRows = 5L)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val default = IvfPq.topK(encoded, queries, "vec_id", "embedding",
        model, k = 2, nprobe = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(bounded == default)
  }

  test("residual encoding beats raw-vector PQ at equal bit budget") {
    // The point of IVFADC: per-cell residuals are tighter than the raw
    // distribution, so the same m x nCodes budget quantizes finer.
    val model = IvfPq.fit(corpus, "embedding", cents, m = 16, nCodes = 32)
    val encoded = IvfPq.encode(corpus, "vec_id", "embedding", model)
    val exact = exactTopK(10)
    val adcIvf = IvfPq.topK(encoded, queries, "vec_id", "embedding",
        model, k = 10, nprobe = 10) // all cells probed: isolate quantization
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val flat = Pq.fit(corpus, "embedding", m = 16, nCodes = 32)
    val flatEncoded = corpus.select(col("vec_id"), col("embedding"),
      Pq.encodeCol(col("embedding"), flat).as("pq_codes"))
    val adcFlat = Pq.topK(flatEncoded, queries, "vec_id", "embedding", "pq_codes",
        flat, k = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val rIvf = (adcIvf intersect exact).size.toDouble / exact.size
    val rFlat = (adcFlat intersect exact).size.toDouble / exact.size
    assert(rIvf >= rFlat - 0.05,
      s"residual ADC recall $rIvf should not trail flat PQ recall $rFlat")
  }

  test("plan: candidate scoring is a cell equi-join — no cartesian, probes broadcast") {
    val model = IvfPq.fit(corpus, "embedding", cents, m = 16, nCodes = 32)
    val encoded = IvfPq.encode(corpus, "vec_id", "embedding", model)
    val plan = IvfPq.topK(encoded, queries, "vec_id", "embedding",
        model, k = 10, nprobe = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
    assert(plan.contains("Broadcast"), s"probe side must broadcast:\n$plan")
  }

  test("tuning grid: recall and scanned fraction grow with nprobe; top config >= 0.9") {
    val model = IvfPq.fit(corpus, "embedding", cents, m = 16, nCodes = 32)
    val encoded = IvfPq.encode(corpus, "vec_id", "embedding", model)
    val grid = Seq((1, 20), (4, 50), (8, 100))
    val rows = IvfPq.tuningGrid(encoded, corpus, queries,
        "vec_id", "embedding", model, k = 10, grid)
      .orderBy("nprobe").collect()
    assert(rows.length == 3)
    val recalls = rows.map(_.getAs[Double]("recall"))
    val scanned = rows.map(_.getAs[Double]("scanned_frac"))
    // The tradeoff curve: more probes -> more corpus scanned, more recall.
    assert(scanned.sliding(2).forall(p => p(0) < p(1)), scanned.toSeq.toString)
    assert(scanned.forall(f => f > 0 && f <= 1.0))
    assert(recalls.sliding(2).forall(p => p(0) <= p(1)), recalls.toSeq.toString)
    assert(recalls.last >= 0.9, s"recall@10 at (8,100) was ${recalls.last}")
  }

  test("encode is narrow: no shuffle, codes within bounds, cells valid") {
    val model = IvfPq.fit(corpus, "embedding", cents, m = 16, nCodes = 32)
    val encoded = IvfPq.encode(corpus, "vec_id", "embedding", model)
    val plan = encoded.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"encode must be a projection:\n$plan")
    val rows = encoded.collect()
    assert(rows.length == corpus.count())
    rows.foreach { r =>
      val cell = r.getAs[Long]("cell")
      assert(cell >= 0 && cell < 10)
      val codes = r.getSeq[Int](r.fieldIndex("pq_codes"))
      assert(codes.length == 16 && codes.forall(c => c >= 0 && c < 32))
    }
  }
}
