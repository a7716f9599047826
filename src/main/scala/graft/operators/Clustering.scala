package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic Lloyd k-means over embedding columns — the clustering
  * primitive behind SemDeDup-style semantic dedup and corpus curriculum
  * bucketing. `/root/reference` has no analytics surface; this extends
  * the training-data-pipeline inventory (SURVEY.md §2 Part B).
  *
  * Everything is FIXED-POINT: vectors are scaled to longs once
  * (`floor(x·scale + 0.5)`, the engine-portable round-half-up), distances
  * are integer L2, centroid updates are integer sums with a
  * floor-divide mean. No float accumulates across rows, so results are
  * identical under any partitioning/reduction order and the DuckDB
  * oracle replays every iteration bit-for-bit. Seeds are the k smallest
  * ids (deterministic, no RNG) — k-means++ trades determinism for
  * quality and belongs to a sampled driver-side fit, not the
  * oracle-checked path.
  *
  * Scale shape per iteration: the ASSIGNMENT is completely NARROW — the
  * centroid table (k×dims longs) is collapsed to one array row and
  * broadcast; each vector folds over it in-row (no n×k join, no
  * shuffle). The UPDATE is one groupBy(cell, dim) over exploded longs —
  * map-side combinable, k×dims output rows. With iters unrolled, a full
  * run is `iters` narrow passes + `iters-1` bounded aggregates, exactly
  * the MLlib shape but plan-expressed and collect-free.
  */
object Clustering {

  /** Scaled copy of the vector column: `floor(x·scale + 0.5)` per
    * element. Hot path: the native codegen'd
    * [[graft.functions.expressions.ScaleVector]] (the HOF transform was
    * interpreted per element on the quantization pass every fixed-point
    * embedding operator runs first).
    */
  def scaleVector(vecCol: Column, scale: Long): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.expressions.ScaleVector(
      ColumnBridge.expression(vecCol), scale))
  }

  /** HOF formulation of [[scaleVector]] — the interpreted parity
    * reference (spec-pinned equal to the native kernel), not the hot
    * path.
    */
  def scaleVectorViaHof(vecCol: Column, scale: Long): Column =
    transform(vecCol, x => floor(x.cast("double") * scale + lit(0.5)).cast("long"))

  /** Integer argmin over a broadcast centroid list — (dist, cell)
    * lexicographic, so ties break to the lowest cell id regardless of
    * list order. Hot path: the native codegen'd
    * [[graft.functions.expressions.NearestCellFixed]] (one call per row
    * instead of an interpreted nested-HOF fold).
    */
  private[operators] def bestCell(vecCol: Column, centsCol: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.expressions.NearestCellFixed(
      ColumnBridge.expression(vecCol), ColumnBridge.expression(centsCol)))
  }

  /** HOF formulation of [[bestCell]] — the interpreted parity reference
    * (spec-pinned equal to the native kernel on random inputs), not the
    * hot path.
    */
  private[operators] def bestCellViaHof(vecCol: Column, centsCol: Column): Column =
    aggregate(
      centsCol,
      struct(lit(Long.MaxValue).as("bd"), lit(Long.MaxValue).as("bc")),
      (acc, ct) => {
        val d = aggregate(
          zip_with(vecCol, ct.getField("cv"), (a, b) => (a - b) * (a - b)),
          lit(0L), (s, x) => s + x)
        val cell = ct.getField("cell")
        val better = d < acc.getField("bd") ||
          (d === acc.getField("bd") && cell < acc.getField("bc"))
        when(better, struct(d.as("bd"), cell.as("bc"))).otherwise(acc)
      }).getField("bc")

  private def scaledDf(df: DataFrame, idCol: String, vecCol: String,
                       scale: Long): DataFrame =
    df.select(col(idCol), scaleVector(col(vecCol), scale).as("__v"))

  /** One narrow assignment pass: (idCol, __v, cell) for every row. */
  private def assignScaled(scaled: DataFrame, idCol: String,
                           cent: DataFrame): DataFrame = {
    val centArr = cent.agg(collect_list(struct(col("cell"), col("cv"))).as("cents"))
    scaled.crossJoin(broadcast(centArr))
      .select(col(idCol), col("__v"), bestCell(col("__v"), col("cents")).as("cell"))
  }

  /** Narrow assignment that KEEPS the caller's columns: every `df` row
    * plus its `cell`, computed by the same broadcast-fold [[bestCell]]
    * pass as [[assignCells]]. Callers used to take the (id, cell) table
    * and equi-join it BACK to `df` by id to recover the vector they
    * started from — a full corpus shuffle join (two Exchanges) per
    * assignment that this removes outright (guide-§2.4 class). Null
    * vectors still map to a null cell, exactly like the join-back form
    * on an unfiltered frame.
    */
  private def assignKeep(df: DataFrame, cents: DataFrame, idCol: String,
                         vecCol: String, scale: Long): DataFrame = {
    val centArr = cents.agg(collect_list(struct(col("cell"), col("cv"))).as("cents"))
    df.crossJoin(broadcast(centArr))
      .withColumn("cell", bestCell(scaleVector(col(vecCol), scale), col("cents")))
      .drop("cents")
  }

  /** One integer centroid update from an assignment. */
  private def updateCent(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cell"), posexplode(col("__v")).as(Seq("dim", "x")))
      .groupBy(col("cell"), col("dim"))
      .agg(sum(col("x")).as("sm"), count(lit(1)).as("n"))
      .groupBy(col("cell"))
      .agg(array_sort(collect_list(struct(col("dim"),
        floor(col("sm").cast("double") / col("n")).cast("long").as("cx"))))
        .as("pairs"))
      .select(col("cell").cast("long").as("cell"),
        transform(col("pairs"), p => p.getField("cx")).as("cv"))

  /** The centroid table the `iters`-th assignment pass would use: seeds
    * (k smallest ids) refined by `iters - 1` integer updates over `df`.
    * Exposed so INCREMENTAL flows can train on history and assign fresh
    * batches without re-clustering.
    */
  def kmeansCentroids(df: DataFrame, idCol: String, vecCol: String,
                      k: Int, iters: Int = 2, scale: Long = 1000L): DataFrame = {
    require(k > 0 && iters > 0, s"need k > 0 and iters > 0, got k=$k iters=$iters")
    // TRAINING ignores null vectors: a null among the k smallest ids
    // would otherwise become a null seed centroid (NearestCellFixed
    // rejects null cv at runtime — found by the crossSignalPairs
    // null-safety spec). Assignment still maps null vectors to a null
    // cell (assignCells is a separate pass over the unfiltered frame).
    val scaled = scaledDf(df, idCol, vecCol, scale)
      .filter(col("__v").isNotNull)
    // Seeds: the k smallest ids (TakeOrdered on k rows, then a k-row window).
    var cent: DataFrame = scaled.orderBy(col(idCol)).limit(k)
      .select((row_number().over(Window.orderBy(col(idCol))) - 1)
        .cast("long").as("cell"), col("__v").as("cv"))
    for (_ <- 1 until iters)
      cent = updateCent(assignScaled(scaled, idCol, cent))
    cent
  }

  /** Assign every row of `df` to its nearest cell of a centroid table
    * from [[kmeansCentroids]]: (idCol, cell). Wholly narrow.
    */
  def assignCells(df: DataFrame, cents: DataFrame, idCol: String,
                  vecCol: String, scale: Long = 1000L): DataFrame =
    assignScaled(scaledDf(df, idCol, vecCol, scale), idCol, cents)
      .select(col(idCol), col("cell"))

  /** Run `iters` assignment passes (with `iters - 1` centroid updates in
    * between) and return the final assignment: (idCol, cell). Clusters
    * that lose all members are dropped by the update (standard Lloyd
    * behavior); cell ids are 0-based ranks of the seed ids.
    */
  def kmeansFixed(df: DataFrame, idCol: String, vecCol: String,
                  k: Int, iters: Int = 2, scale: Long = 1000L): DataFrame =
    assignCells(df, kmeansCentroids(df, idCol, vecCol, k, iters, scale),
      idCol, vecCol, scale)

  /** SemDeDup (Abbas et al. 2023, public arXiv): semantic dedup =
    * k-means cells, then exact pairwise cosine INSIDE each cell only,
    * dropping the larger id of every pair above `threshold` (the house
    * greedy keep-first, same semantics as
    * [[Similarity.dropNearDuplicatesByCosine]] with cells instead of
    * sign-buckets). Returns the kept rows as (idCol, cell).
    *
    * Scale: the pair space is Σ |cell|² — k must grow with n so the
    * expected cell size stays bounded (k ≈ n/1000 keeps cells ~1000 and
    * the pair join ~1000n rows); the cell equi-join shuffles ids+vectors
    * once and never goes cartesian across cells.
    */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
                    k: Int, iters: Int = 2, scale: Long = 1000L,
                    threshold: Double = 0.3): DataFrame = {
    val withCell = assignKeep(df,
      kmeansCentroids(df, idCol, vecCol, k, iters, scale), idCol, vecCol, scale)
    val l = withCell.select(col("cell"), col(idCol).as("id_a"), col(vecCol).as("va"))
    val r = withCell.select(col("cell"), col(idCol).as("id_b"), col(vecCol).as("vb"))
    val losers = l.join(r, "cell")
      .filter(col("id_a") < col("id_b"))
      .filter(graft.functions.VectorFunctions.cosine(col("va"), col("vb")) >= threshold)
      .select(col("id_b").as(idCol)).distinct()
    withCell.join(losers, Seq(idCol), "left_anti")
      .select(col(idCol), col("cell"))
  }

  /** SemDeDup with the clustering run in JL-PROJECTED space
    * ([[Projection.signProject]], Achlioptas 2001): cells come from
    * k-means over the dOut-dim sign projections (distance work shrinks
    * by dim/dOut — the point of B41 as a scale path), while the
    * pairwise verify inside each cell stays EXACT cosine over the
    * original vectors, so a projection-induced near-miss can only move
    * a pair to different cells (the same approximation class as the
    * IVF cell boundary in [[semanticDedup]] itself), never fake a
    * duplicate. Same keep-first contract and Σ|cell|² pair bound.
    */
  def semanticDedupProjected(df: DataFrame, idCol: String, vecCol: String,
                             dim: Int, dOut: Int, k: Int, iters: Int = 2,
                             projScale: Long = 1000L, seed: Long = 42L,
                             threshold: Double = 0.3): DataFrame = {
    val proj = Projection.signProject(df, idCol, vecCol, dim, dOut,
      projScale, seed)
    // already-long coordinates: scale=1 makes scaleVector the identity
    val cells = kmeansFixed(proj, idCol, "proj", k, iters, scale = 1L)
    val withCell = df.join(cells, idCol)
    val l = withCell.select(col("cell"), col(idCol).as("id_a"), col(vecCol).as("va"))
    val r = withCell.select(col("cell"), col(idCol).as("id_b"), col(vecCol).as("vb"))
    val losers = l.join(r, "cell")
      .filter(col("id_a") < col("id_b"))
      .filter(graft.functions.VectorFunctions.cosine(col("va"), col("vb")) >= threshold)
      .select(col("id_b").as(idCol)).distinct()
    withCell.join(losers, Seq(idCol), "left_anti")
      .select(col(idCol), col("cell"))
  }

  /** Cell-bounded kNN graph: for every row, its `kNeighbors` nearest
    * in-cell neighbors by cosine — the graph construction behind
    * SemDeDup-style cluster analysis, diversity sampling and
    * graph-based curriculum ordering. Same IVF approximation contract
    * as [[semanticDedup]]: candidate pairs exist only inside a k-means
    * cell, so the pair space is Σ |cell|² and never cartesian; `kCells`
    * grows with n to hold cell sizes ~constant.
    *
    * The per-source top-k cut is the k-bounded heap
    * ([[TopK.perGroupAgg]]), not a window — a mega-cell's pair list
    * collapses map-side instead of buffering in one task. Ties break
    * (cos DESC, dst ASC), total because ids are unique. NaN cosines
    * (a zero-norm endpoint) are excluded EXPLICITLY: the heap's raw
    * double compares would keep NaN insertion-order-dependently and
    * DuckDB ranks NaN first under DESC, so neither engine's implicit
    * behavior is portable.
    *
    * Output: (src, rn [1..kNeighbors], dst, cos).
    */
  def knnGraph(df: DataFrame, idCol: String, vecCol: String,
               kCells: Int, kNeighbors: Int, iters: Int = 2,
               scale: Long = 1000L): DataFrame = {
    val withCell = assignKeep(df,
      kmeansCentroids(df, idCol, vecCol, kCells, iters, scale),
      idCol, vecCol, scale)
    val l = withCell.select(col("cell"), col(idCol).as("src"), col(vecCol).as("va"))
    val r = withCell.select(col("cell"), col(idCol).as("dst"), col(vecCol).as("vb"))
    val pairs = l.join(r, "cell").filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"),
        graft.functions.VectorFunctions.cosine(col("va"), col("vb")).as("cos"))
      .filter(!isnan(col("cos")))
    TopK.perGroupAgg(pairs, Seq("src"), col("cos"), col("dst"), kNeighbors)
      .select(col("src"), col("rn").cast("long").as("rn"),
        col("id").as("dst"), col("value").as("cos"))
  }

  /** Hard-negative mining for contrastive/metric training (the
    * "hardest negatives" recipe of the retrieval literature, e.g.
    * Xiong et al. 2021, ANCE, arXiv): per anchor, the `kNegatives`
    * highest-cosine neighbors with a DIFFERENT label — semantically
    * close but wrongly-matching examples, the ones worth training on.
    *
    * Same scale shape as [[knnGraph]]: the pair space is k-means
    * cell-bounded (no cartesian; a hard negative outside the anchor's
    * cell is by construction not among the closest), the label filter
    * runs before the cosine kernel, and the per-anchor cut is the
    * k-bounded heap. Null-label rows participate on neither side.
    * Output: (src, rn, dst, cos).
    */
  def hardNegatives(df: DataFrame, idCol: String, vecCol: String,
                    labelCol: String, kCells: Int, kNegatives: Int,
                    iters: Int = 2, scale: Long = 1000L): DataFrame = {
    val withCell = assignKeep(df,
      kmeansCentroids(df, idCol, vecCol, kCells, iters, scale),
      idCol, vecCol, scale)
    val l = withCell.select(col("cell"), col(idCol).as("src"),
      col(vecCol).as("va"), col(labelCol).as("la"))
    val r = withCell.select(col("cell"), col(idCol).as("dst"),
      col(vecCol).as("vb"), col(labelCol).as("lb"))
    val pairs = l.join(r, "cell")
      .filter(col("src") =!= col("dst") &&
        col("la").isNotNull && col("lb").isNotNull && col("la") =!= col("lb"))
      .select(col("src"), col("dst"),
        graft.functions.VectorFunctions.cosine(col("va"), col("vb")).as("cos"))
      .filter(!isnan(col("cos")))
    TopK.perGroupAgg(pairs, Seq("src"), col("cos"), col("dst"), kNegatives)
      .select(col("src"), col("rn").cast("long").as("rn"),
        col("id").as("dst"), col("value").as("cos"))
  }

  /** kNN label-disagreement — the mislabel detector of the label-noise
    * literature (Bahri et al., "Deep k-NN for Noisy Labels", ICML 2020;
    * the kNN filter inside Confident Learning, Northcutt et al. 2021):
    * for each row, how many of its k nearest in-cell neighbors carry a
    * different label, and whether the neighborhood MAJORITY disagrees —
    * the standard prune/re-audit flag for curated classification data.
    *
    * Built on [[knnGraph]] (cell-bounded pairs, heap cut), plus two
    * label equi-joins and one combinable per-anchor aggregate — no
    * window, no extra corpus pass. Output:
    * (idCol, label, n_neighbors, n_disagree, flagged).
    */
  def labelDisagreement(df: DataFrame, idCol: String, vecCol: String,
                        labelCol: String, kCells: Int, kNeighbors: Int,
                        iters: Int = 2, scale: Long = 1000L): DataFrame = {
    val knn = knnGraph(df, idCol, vecCol, kCells, kNeighbors, iters, scale)
    val lab = df.select(col(idCol), col(labelCol))
    knn
      .join(lab.select(col(idCol).as("src"), col(labelCol).as("__la")), "src")
      .join(lab.select(col(idCol).as("dst"), col(labelCol).as("__lb")), "dst")
      .groupBy(col("src").as(idCol), col("__la").as("label"))
      .agg(count(lit(1)).as("n_neighbors"),
        sum(when(!(col("__lb") <=> col("__la")), 1L).otherwise(0L))
          .as("n_disagree"))
      .withColumn("flagged", col("n_disagree") * 2 > col("n_neighbors"))
  }

  /** SSL-prototypes diversity pruning (Sorscher et al. 2022, public
    * arXiv "Beyond neural scaling laws"): rank every row by its
    * integer L2 distance to its assigned k-means centroid and keep the
    * `keepPerCell` LEAST prototypical (most distant) per cell — the
    * "hard example" subset that beats random pruning at scale.
    *
    * Everything is fixed-point: distances are exact integer L2 in the
    * scaled space (deterministic under any partitioning; the double
    * kernel is exact here because the fold sums integers far below
    * 2^53), and the per-cell cut is the k-bounded heap — no window
    * over a potentially-mega cell. Output: (cell, rn, idCol, dist).
    */
  def prototypePruning(df: DataFrame, idCol: String, vecCol: String,
                       kCells: Int, keepPerCell: Int, iters: Int = 2,
                       scale: Long = 1000L): DataFrame = {
    import graft.functions.VectorFunctions.toDouble
    val cents = kmeansCentroids(df, idCol, vecCol, kCells, iters, scale)
    val assigned = assignScaled(scaledDf(df, idCol, vecCol, scale), idCol, cents)
    val withDist = assigned.join(broadcast(cents), "cell")
      .select(col("cell"), col(idCol),
        graft.functions.VectorFunctions.l2DistanceSq(
          toDouble(col("__v")), toDouble(col("cv"))).cast("long").as("dist"))
    TopK.perGroupAgg(withDist, Seq("cell"), col("dist"), col(idCol), keepPerCell)
      .select(col("cell"), col("rn").cast("long").as("rn"),
        col("id").as(idCol), col("value").cast("long").as("dist"))
  }

  /** Incremental SemDeDup — the daily-ingest form: centroids are trained
    * on HISTORY only (the existing model), both sides are assigned with
    * the narrow pass, and candidate pairs are restricted to the fresh
    * batch — fresh×history and fresh×fresh(smaller id); history×history
    * pairs are NEVER generated (the same contract as
    * `Dedup.lshCandidatePairsIncremental`). Returns the surviving fresh
    * rows as (idCol, cell).
    *
    * Scale: re-clustering the corpus per batch is O(corpus); this is
    * O(batch × cell-slice). The history side ships (cell, id, vec) once
    * through the cell equi-join against the batch-sized fresh side.
    */
  def semanticDedupIncremental(history: DataFrame, fresh: DataFrame,
                               idCol: String, vecCol: String,
                               k: Int, iters: Int = 2, scale: Long = 1000L,
                               threshold: Double = 0.3): DataFrame = {
    val cents = kmeansCentroids(history, idCol, vecCol, k, iters, scale)
    val hSide = assignKeep(history, cents, idCol, vecCol, scale)
      .select(col("cell"), col(idCol).as("id_a"), col(vecCol).as("va"))
    val fAss = assignKeep(fresh, cents, idCol, vecCol, scale)
    val fSide = fAss.select(col("cell"), col(idCol).as("id_b"), col(vecCol).as("vb"))
    val cos = graft.functions.VectorFunctions.cosine(col("va"), col("vb"))
    val vsHistory = hSide.join(fSide, "cell")
    val vsFresh = fAss.select(col("cell"), col(idCol).as("id_a"), col(vecCol).as("va"))
      .join(fSide, "cell").filter(col("id_a") < col("id_b"))
    val losers = vsHistory.unionByName(vsFresh)
      .filter(cos >= threshold)
      .select(col("id_b").as(idCol)).distinct()
    fAss.join(losers, Seq(idCol), "left_anti")
      .select(col(idCol), col("cell"))
  }

  /** SEMANTIC benchmark decontamination — the embedding-space
    * counterpart of the n-gram gate (`Dedup.contaminationStats`) and the
    * span gate (`Dedup.crossCorpusSpans`): flag corpus rows whose
    * embedding is near-duplicate (cosine >= `threshold`) to ANY held-out
    * benchmark vector — paraphrased eval leakage that shares no n-grams.
    *
    * Scale shape: k-means cells are fit on the BENCH side (bounded —
    * eval sets are thousands of rows, so the fit is cheap and the
    * centroid table broadcasts); both sides get the narrow broadcast-fold
    * assignment, and the compare join is bench-side-broadcast keyed on
    * the cell — the corpus never shuffles, and each corpus row is
    * compared only against the bench vectors of ITS cell (the IVF
    * approximation contract of [[semanticDedup]]: a cross-cell near-miss
    * is the documented recall trade, never a false positive). The
    * per-row hit count is a map-side-combinable aggregate.
    *
    * Output: one row per corpus row — (idCol, n_bench_hits, max_cos,
    * contaminated). `max_cos` (the strongest in-cell bench similarity;
    * null when the cell holds no bench vector, NaN-free because
    * zero-norm cosines never win a max against any real value — both
    * engines drop NaN from max) carries the per-row EVIDENCE the flag
    * thresholds, so a scale check stays discriminative even where the
    * flag saturates (a tight corpus is all-true at any fixed τ).
    */
  def semanticContamination(corpus: DataFrame, bench: DataFrame,
                            idCol: String, vecCol: String,
                            k: Int, iters: Int = 2, scale: Long = 1000L,
                            threshold: Double = 0.3): DataFrame = {
    val cents = kmeansCentroids(bench, idCol, vecCol, k, iters, scale)
    val bSide = assignKeep(bench, cents, idCol, vecCol, scale)
      .select(col("cell"), col(vecCol).as("__bv"))
    val cAss = assignKeep(corpus, cents, idCol, vecCol, scale)
      .select(col(idCol), col("cell"), col(vecCol))
    val cos = graft.functions.VectorFunctions.cosine(col(vecCol), col("__bv"))
    val hits = cAss
      .join(broadcast(bSide), "cell")
      // zero-norm cosines are NaN; Spark orders NaN above every double
      // while engines disagree on NaN in comparisons/max — exclude them
      // explicitly (the knnGraph portability rule)
      .filter(!isnan(cos))
      .groupBy(col(idCol))
      .agg(sum(when(cos >= threshold, 1L).otherwise(0L)).as("n_bench_hits"),
        max(cos).as("max_cos"))
    corpus.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bench_hits"), lit(0L)).as("n_bench_hits"),
        col("max_cos"),
        (coalesce(col("n_bench_hits"), lit(0L)) > 0L).as("contaminated"))
  }

  /** Greedy k-center (farthest-point) selection — Gonzalez 1985,
    * "Clustering to minimize the maximum intercluster distance"; the
    * 2-approximation of the k-center objective and the standard
    * coverage/coreset picker for data curation (select the k most
    * mutually distant exemplars, e.g. seeding diverse eval sets or
    * prototype-based pruning). Fixed-point integer distances, the
    * k-means house rules: seed = the SMALLEST id, each round adds the
    * point maximizing the min distance to the selected set, ties to the
    * smallest id — fully deterministic, so the DuckDB oracle replays
    * every round (q217).
    *
    * Scale shape: k driver-coordinated rounds (the BPE/k-means
    * iteration pattern), each ONE narrow corpus pass — the selected set
    * ships as a plan literal (≤ k scaled vectors), the per-row min
    * distance is the codegen'd [[graft.functions.expressions.MinCellDistFixed]]
    * kernel, and the round's winner comes back via a 1-row
    * max(struct(dist, -id, vec)) aggregate (combine-safe; no sort, no
    * window). Null vectors are ignored; ids must be non-negative (the
    * -id tiebreak trick; loudly checked).
    *
    * Output: (rank [1..k], idCol, d2_sel — the squared fixed-point
    * distance to the set when selected, null for the seed; the sequence
    * is the classic non-increasing coverage-radius curve). Fewer than k
    * rows come back when coverage completes early (k exceeds the number
    * of distinct vectors) — the degenerate rounds would only re-pick
    * existing centers at distance 0.
    */
  def kCenterSelect(df: DataFrame, idCol: String, vecCol: String, k: Int,
                    scale: Long = 1000L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = df.sparkSession
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val scaled = scaledDf(df, idCol, vecCol, scale)
      .filter(col("__v").isNotNull && col(idCol).isNotNull)
    // seed: smallest id (1-row TakeOrdered) — also the loud negative-id
    // check (the -id tiebreak needs non-negative ids)
    val seedRow = scaled.orderBy(col(idCol)).limit(1).collect()
    require(seedRow.nonEmpty, "kCenterSelect needs at least one non-null vector")
    require(seedRow(0).getAs[Number](0).longValue() >= 0L,
      s"kCenterSelect requires non-negative ids, found ${seedRow(0).get(0)}")
    val selected = scala.collection.mutable.ArrayBuffer[(Long, Long, Seq[Long], Option[Long])](
      (1L, seedRow(0).getAs[Number](0).longValue(), seedRow(0).getSeq[Long](1), None))
    var covered = false
    for (rank <- 2 to k if !covered) {
      val centsLit = array(selected.map { case (r, _, v, _) =>
        struct(lit(r).as("cell"), array(v.map(lit): _*).cast("array<long>").as("cv"))
      }.toSeq: _*)
      val mind = ColumnBridge.column(
        graft.functions.expressions.MinCellDistFixed(
          ColumnBridge.expression(col("__v")),
          ColumnBridge.expression(centsLit)))
      val win = scaled
        .select(struct(mind.as("d"), (-col(idCol).cast("long")).as("nid"),
          col("__v").as("v")).as("s"))
        .agg(max(col("s")).as("s"))
        .select(col("s.d"), (-col("s.nid")).as("id"), col("s.v"))
        .collect()(0)
      // coverage complete: every remaining point is AT a selected
      // center (fewer distinct vectors than k, or k > row count) — the
      // argmax would re-pick an already-selected id with d2 = 0, so
      // stop and return fewer than k rows rather than fake exemplars
      if (win.getLong(0) == 0L) covered = true
      else selected += ((rank.toLong, win.getLong(1), win.getSeq[Long](2),
        Some(win.getLong(0))))
    }
    import spark.implicits._
    selected.toSeq.map { case (r, id, _, d) => (r, id, d) }
      .toDF("rank", idCol, "d2_sel")
  }
}
