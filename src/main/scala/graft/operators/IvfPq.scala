package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IVF+PQ — the production ANN composition (Jegou et al., "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011, §IV "IVFADC"):
  * an inverted-file coarse quantizer restricts each query to `nprobe`
  * cells, and inside every cell vectors are stored only as PQ codes of
  * their RESIDUAL (v − centroid(cell)). Residual encoding matters: within
  * a cell the residual distribution is far tighter than the raw corpus
  * distribution, so the same bit budget quantizes much finer.
  *
  * Scale shape (all the component arguments compose):
  *  - the coarse quantizer is nlist-sized → a driver/broadcast literal;
  *    cell assignment is the narrow native argmin kernel
  *    ([[graft.functions.expressions.NearestCentroid]]) — no shuffle;
  *  - PQ codebooks are m × nCodes × dsub doubles → broadcast literal;
  *    residual encoding is a narrow projection (`zip_with` subtract, then
  *    the per-subspace argmin) — no shuffle;
  *  - query scoring: per (query, probed cell) an EXACT distance table of
  *    the query residual against the codebooks is built driver-side
  *    (nQueries × nprobe × m × nCodes doubles — tiny by construction) and
  *    broadcast; the candidate join is an EQUI-JOIN on the cell id
  *    (unlike flat PQ's corpus × queries cross join, the corpus side
  *    touched per query shrinks to ~nprobe/nlist), scored by a static sum
  *    of `element_at` lookups (codegen'd, no lambda, no UDF), ranked by
  *    the k-bounded [[TopK.perGroupAgg]] aggregate;
  *  - exact reranking joins only the shortlist back to original vectors.
  *
  * Approximate by nature — recall-tested against exact L2 (like PQ and
  * k-means IVF); the plan shape (no cartesian, broadcast probe side) is
  * asserted in the spec.
  */
object IvfPq {

  /** cents MUST be cell-sorted 0..nlist-1 (the contract of
    * [[graft.operators.Similarity]]'s centroid literals); pq codebooks
    * quantize residuals v − cents(cell).
    */
  case class IvfPqModel(cents: Seq[(Long, Seq[Double])], pq: Pq.PqModel)

  private def centArray(cents: Seq[(Long, Seq[Double])]): Column =
    typedLit(cents.map(_._2))

  /** Narrow nearest-cell assignment (native argmin over the centroid
    * literal; ties to the lowest cell id).
    */
  private def cellCol(v: Column, cents: Seq[(Long, Seq[Double])]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.expressions.NearestCentroid(
      ColumnBridge.expression(v), ColumnBridge.expression(typedLit(cents))))
  }

  /** v − centroid(cell), in double precision (narrow). */
  private def residualCol(v: Column, cell: Column,
                          cents: Seq[(Long, Seq[Double])]): Column =
    zip_with(toDouble(v), element_at(centArray(cents), (cell + 1).cast("int")),
      (x, c) => x - c)

  /** Train: assign every (sampled) corpus vector to its cell, then fit PQ
    * codebooks on the RESIDUALS. The coarse quantizer comes in as a
    * (cell, cv) DataFrame — trained offline (k-means) or provided, same
    * as [[Similarity.ivfTopKFixed]].
    */
  def fit(corpus: DataFrame, vecCol: String, centroids: DataFrame,
          m: Int, nCodes: Int, seed: Long = 42L,
          sampleFraction: Double = 1.0): IvfPqModel = {
    // Re-index cells positionally (0..nlist-1 in ascending original cell
    // order): every downstream lookup — centroid subtraction, probe-table
    // build — indexes the centroid seq by cell id directly.
    val cents: Seq[(Long, Seq[Double])] = centroids
      .select(col("cell").cast("long"), toDouble(col("cv")))
      .orderBy(col("cell"))
      .collect().zipWithIndex
      .map { case (r, i) => (i.toLong, r.getSeq[Double](1)) }.toSeq
    val cell = cellCol(col(vecCol), cents)
    val residuals = corpus
      .select(residualCol(col(vecCol), cell, cents).as("__res"))
    val pq = Pq.fit(residuals, "__res", m, nCodes, seed, sampleFraction)
    IvfPqModel(cents, pq)
  }

  /** Encoded corpus: (idCol, cell, codes) — 8-ish bytes per vector plus
    * the cell id; original vectors are not needed for scoring.
    */
  def encode(corpus: DataFrame, idCol: String, vecCol: String,
             model: IvfPqModel): DataFrame = {
    corpus
      .select(col(idCol), col(vecCol),
        cellCol(col(vecCol), model.cents).as("cell"))
      .select(col(idCol), col("cell"),
        Pq.encodeCol(residualCol(col(vecCol), col("cell"), model.cents),
          model.pq).as("pq_codes"))
  }

  /** Approximate top-k by IVFADC: probe `nprobe` cells per query, score
    * PQ codes against per-(query, cell) residual distance tables.
    *
    * BOUNDED-QUERY-SET CONTRACT (enforced, not assumed — the q173
    * broadcast-guard house rule): probe selection and the residual
    * distance tables are built DRIVER-side, nQueries × nprobe × m ×
    * nCodes doubles, so the query frame must be small. The collect is
    * capped at `maxQueryRows + 1` rows in ONE action and FAILS (naming
    * the bound; the true size is never materialized) when the cap is
    * exceeded — the honest outcome versus silently OOM-ing the driver;
    * chunk the query set (probe tables are per-query independent, so
    * chunked unions are exact) or raise the bound knowingly. A future
    * large-query path would assign probes distributedly instead; no
    * current caller needs it.
    *
    * @return (query_id, rank, neighbor_id, adist) — approximate squared
    *         L2 ascending, ties by neighbor id.
    */
  def topK(encoded: DataFrame, queries: DataFrame,
           idCol: String, vecCol: String,
           model: IvfPqModel, k: Int, nprobe: Int,
           maxQueryRows: Long = 100000L): DataFrame = {
    val spark = encoded.sparkSession
    import spark.implicits._
    val m = model.pq.m
    val nCodes = model.pq.nCodes
    val dsub = model.pq.dsub

    // Driver-side probe + table build: for each query, its nprobe nearest
    // cells; for each probed cell, the exact sub-distance table of the
    // query RESIDUAL (q − centroid) against every codebook entry.
    // The guard and the collect are ONE action: limit(bound+1) caps what
    // can ever reach the driver (a separate count() would both
    // double-execute the query lineage and race a nondeterministic
    // frame), and one excess row proves the violation with its size
    // never materializing.
    val limN = (math.min(maxQueryRows, Int.MaxValue - 2L) + 1L).toInt
    val collected = queries
      .select(col(idCol).cast("long"), toDouble(col(vecCol)))
      .limit(limN)
      .collect()
    require(collected.length <= maxQueryRows,
      s"IvfPq.topK builds per-query probe tables driver-side: query frame " +
        s"exceeds $maxQueryRows rows. Chunk the query set or raise the " +
        s"bound explicitly.")
    val qRows: Seq[(Long, Seq[Double])] =
      collected.map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    val probeRows: Seq[(Long, Long, Seq[Double])] = qRows.flatMap { case (qid, qv) =>
      val byDist = model.cents.map { case (cellId, cv) =>
        var d = 0.0
        var j = 0
        while (j < cv.length) { val t = qv(j) - cv(j); d += t * t; j += 1 }
        (cellId, d)
      }.sortBy(c => (c._2, c._1)).take(nprobe)
      byDist.map { case (cellId, _) =>
        val cv = model.cents(cellId.toInt)._2
        val table = for {
          i <- 0 until m
          c <- 0 until nCodes
        } yield {
          var d = 0.0
          var j = 0
          while (j < dsub) {
            val r = (qv(i * dsub + j) - cv(i * dsub + j)) -
              model.pq.codebooks(i)(c)(j)
            d += r * r
            j += 1
          }
          d
        }
        (qid, cellId, table: Seq[Double])
      }
    }
    val probeDf = broadcast(probeRows.toDF("query_id", "cell", "__table"))

    // Equi-join on the cell id: only probed cells' codes are scored. The
    // distance is a static sum of m codegen'd lookups (as in Pq.topK).
    val adist = (0 until m).map { i =>
      element_at(col("__table"),
        lit(i * nCodes + 1) + element_at(col("pq_codes"), i + 1))
    }.reduce(_ + _)
    val scored = encoded
      .select(col(idCol).as("neighbor_id"), col("cell"), col("pq_codes"))
      .join(probeDf, "cell")
      .select(col("query_id"), col("neighbor_id"), adist.as("adist"))
    TopK.perGroupAgg(scored, Seq("query_id"), -col("adist"), col("neighbor_id"), k)
      .select(col("query_id"), col("rn").as("rank"),
        col("id").as("neighbor_id"), (-col("value")).as("adist"))
  }

  /** Production shape: IVFADC shortlist (`shortlistK` over-fetch) → exact
    * L2 rerank of only the shortlisted pairs against original vectors.
    */
  def topKReranked(encoded: DataFrame, corpus: DataFrame, queries: DataFrame,
                   idCol: String, vecCol: String,
                   model: IvfPqModel, k: Int, nprobe: Int,
                   shortlistK: Int,
                   maxQueryRows: Long = 100000L): DataFrame = {
    val shortlist = topK(encoded, queries, idCol, vecCol, model, shortlistK,
        nprobe, maxQueryRows)
      .select(col("query_id"), col("neighbor_id"))
    val scored = shortlist
      .join(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv")),
        "neighbor_id")
      .join(broadcast(queries.select(col(idCol).cast("long").as("query_id"),
        col(vecCol).as("qv"))), "query_id")
      .select(col("query_id"), col("neighbor_id"),
        l2DistanceSq(col("qv"), col("cv")).as("d"))
    TopK.perGroupAgg(scored, Seq("query_id"), -col("d"), col("neighbor_id"), k)
      .select(col("query_id"), col("rn").as("rank"),
        col("id").as("neighbor_id"), (-col("value")).as("d"))
  }

  /** Recall/cost tuning surface: for each (nprobe, shortlistK) config,
    * recall@k of shortlist+rerank against exact L2, the scanned-candidate
    * fraction (mean fraction of the corpus the cell equi-join touches per
    * query — the DETERMINISTIC latency proxy: at fixed hardware, IVFADC
    * latency is linear in scanned codes), and measured wall seconds
    * (environment-dependent, informational). A sizing tool, run once per
    * deployment at a representative sample — ground truth is one
    * brute-force pass, then one job per grid config over the SAME encoded
    * frame.
    */
  def tuningGrid(encoded: DataFrame, corpus: DataFrame, queries: DataFrame,
                 idCol: String, vecCol: String, model: IvfPqModel, k: Int,
                 grid: Seq[(Int, Int)]): DataFrame = {
    val spark = encoded.sparkSession
    import spark.implicits._
    def l2(a: Seq[Double], b: Seq[Double]): Double = {
      var d = 0.0; var j = 0
      while (j < a.length) { val t = a(j) - b(j); d += t * t; j += 1 }
      d
    }
    val q = broadcast(queries.select(col(idCol).cast("long").as("query_id"),
      col(vecCol).as("qv")))
    val exact = TopK.perGroupAgg(
        corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
          .crossJoin(q)
          .select(col("query_id"), col("neighbor_id"),
            l2DistanceSq(col("qv"), col("cv")).as("d")),
        Seq("query_id"), -col("d"), col("neighbor_id"), k)
      .select(col("query_id"), col("id")).as[(Long, Long)].collect().toSet
    val cellSizes: Map[Long, Long] = encoded.groupBy(col("cell")).count()
      .as[(Long, Long)].collect().toMap
    val corpusN = cellSizes.values.sum.toDouble
    val qRows = queries.select(col(idCol).cast("long"), toDouble(col(vecCol)))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    val rows = grid.map { case (nprobe, shortlistK) =>
      val t0 = System.nanoTime()
      val got = topKReranked(encoded, corpus, queries, idCol, vecCol,
          model, k, nprobe, shortlistK)
        .select(col("query_id"), col("neighbor_id"))
        .as[(Long, Long)].collect().toSet
      val secs = (System.nanoTime() - t0) / 1e9
      val recall = (got intersect exact).size.toDouble / exact.size
      val scanned = qRows.map { case (_, qv) =>
        model.cents.map { case (cid, cv) => (cid, l2(qv, cv)) }
          .sortBy(c => (c._2, c._1)).take(nprobe)
          .map(c => cellSizes.getOrElse(c._1, 0L)).sum
      }.sum / (qRows.size * corpusN)
      (nprobe, shortlistK, recall, scanned, secs)
    }
    rows.toDF("nprobe", "shortlist_k", "recall", "scanned_frac", "seconds")
  }
}
