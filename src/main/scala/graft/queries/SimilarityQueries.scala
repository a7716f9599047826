package graft.queries

import graft.Tables
import graft.operators.{Clustering, Similarity}
import graft.functions.VectorFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity-search inventory over the embeddings table (SURVEY.md §2 B16):
  * exact brute-force cosine top-k (query side broadcast → corpus scanned
  * once, no corpus shuffle) and the LSH-bucketed approximate variant (the
  * 100 TB scale path: candidates shrink ~2^bits and the join is a bucket
  * equi-join). Cosine values are sequential double folds — DuckDB's
  * `list_dot_product` computes the identical fold, so hashes match exactly.
  */
object SimilarityQueries extends QueryGroup {

  private val CosSql =
    """list_dot_product(qv, cv) /
       (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))"""

  /** q284 oracle: MMR rounds unrolled as MATERIALIZED CTEs (the q278
    * rule) — per round, integer-milli score λ·rel − (1e6−λ)·maxsim,
    * argmax by (score DESC, id), the pick's cosine folded into every
    * survivor's running max.
    */
  private def mmrSql(k: Int, m: Int, lambdaPpm: Long): String = {
    val cosMP = "list_dot_product(m.cv, p.cv) / " +
      "(sqrt(list_dot_product(m.cv, m.cv)) * sqrt(list_dot_product(p.cv, p.cv)))"
    val oneMinus = 1000000L - lambdaPpm
    val rounds = (1 to k).map { r =>
      s"""p$r AS MATERIALIZED (
        SELECT cid, cv, rel, ms, $lambdaPpm * rel - $oneMinus * ms AS sc
        FROM m${r - 1} ORDER BY sc DESC, cid LIMIT 1),
      m$r AS MATERIALIZED (
        SELECT m.cid, m.cv, m.rel,
          greatest(m.ms, CAST(floor(($cosMP) * 1000) AS BIGINT)) AS ms
        FROM m${r - 1} m CROSS JOIN p$r p WHERE m.cid <> p.cid)"""
    }.mkString(",\n      ")
    val out = (1 to k).map { r =>
      s"""SELECT CAST($r AS BIGINT) AS rn, cid AS cand_id,
        rel AS rel_milli, ms AS maxsim_milli, sc AS mmr_score FROM p$r"""
    }.mkString("\n      UNION ALL ")
    s"""
      WITH q AS (
        SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
        WHERE vec_id = 0),
      c AS (
        SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
        FROM embeddings WHERE vec_id >= 20),
      scored AS (
        SELECT cid, cv, $CosSql AS cosine FROM c CROSS JOIN q),
      ranked AS (
        SELECT *, row_number() OVER (ORDER BY cosine DESC, cid ASC) AS rk
        FROM scored),
      m0 AS MATERIALIZED (
        SELECT cid, cv, CAST(floor(cosine * 1000) AS BIGINT) AS rel,
          CAST(0 AS BIGINT) AS ms
        FROM ranked WHERE rk <= $m),
      $rounds
      $out
      ORDER BY rn"""
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q217_kcenter_select" -> { (s, d) =>
      // Greedy k-center coverage selection (Gonzalez 1985): the 6 most
      // mutually distant exemplars in fixed-point L2, seeded at the
      // smallest id — the coreset/diverse-subset picker. k driver
      // rounds of ONE narrow pass each (selected set ships as a plan
      // literal, per-row min distance is the codegen'd MinCellDistFixed
      // kernel, winner via a 1-row combine-safe struct max); then one
      // assignment pass reports each center's basin size. The oracle
      // unrolls all six rounds.
      val emb = Tables.embeddings(s, d)
      val sel = graft.operators.Clustering.kCenterSelect(
        emb, "vec_id", "embedding", k = 6)
      val cents = sel.join(emb, "vec_id")
        .select(col("rank").as("cell"),
          graft.operators.Clustering.scaleVector(col("embedding"), 1000L).as("cv"))
      val counts = graft.operators.Clustering
        .assignCells(emb, cents, "vec_id", "embedding")
        .groupBy(col("cell").as("rank"))
        .agg(count(lit(1)).as("n_assigned"))
      sel.join(counts, "rank")
        .select(col("rank"), col("vec_id").cast("long").as("vec_id"),
          col("d2_sel"), col("n_assigned"))
        .orderBy(col("rank"))
    },

    "q167_isotropy_proj" -> { (s, d) =>
      // All-but-the-Top (Mu & Viswanath 2018): per-vector projection on
      // the corpus top principal component, all fixed-point — two
      // combinable corpus aggregates (per-dim sums, mean-centered
      // scatter), a driver-side power iteration over the d×d longs, one
      // narrow projection pass. The oracle replays every step: rounding,
      // truncating divisions, both iterations, the final fold.
      graft.operators.Isotropy.topComponentProjections(
          Tables.embeddings(s, d), "vec_id", "embedding",
          scale = 1000L, iters = 2, vScale = 1000000L)
        .select(col("vec_id").cast("long").as("vec_id"), col("proj"))
        .orderBy(col("vec_id"))
    },

    "q174_sign_projection" -> { (s, d) =>
      // Johnson–Lindenstrauss sign projection (Achlioptas 2001): 64-dim
      // embeddings down to 16 pseudo-random ±1 directions, all
      // fixed-point — the table-shrink step before pairwise dedup or
      // sketching at 100 TB. One narrow per-row fold over a literal
      // dOut×dim sign matrix (no shuffle, no join); the oracle replays
      // the sign hash symbolically, so an engine-side matrix drift
      // hash-fails. Exported exploded for the compare.
      graft.operators.Projection.signProject(Tables.embeddings(s, d),
          "vec_id", "embedding", dim = 64, dOut = 16)
        .select(col("vec_id"), posexplode(col("proj")).as(Seq("dim_out", "val")))
        .select(col("vec_id"), col("dim_out").cast("long").as("dim_out"),
          col("val"))
        .orderBy(col("vec_id"), col("dim_out"))
    },

    "q168_hard_negatives" -> { (s, d) =>
      // Contrastive-training hard negatives: per anchor, the 4
      // highest-cosine DIFFERENT-label neighbors inside its k-means
      // cell (q123's exact fixture). Cell-bounded pair space, label
      // filter below the cosine kernel, k-bounded heap cut.
      Clustering.hardNegatives(Tables.embeddings(s, d), "vec_id",
          "embedding", "label", kCells = 8, kNegatives = 4,
          iters = 2, scale = 1000L)
        .orderBy(col("src"), col("rn"))
    },

    "q169_label_noise" -> { (s, d) =>
      // kNN label-disagreement mislabel flags: among each vector's 5
      // nearest in-cell neighbors (q150's graph), how many carry a
      // different label, flagged when the majority disagrees. One
      // combinable aggregate over the kNN edges — no window.
      Clustering.labelDisagreement(Tables.embeddings(s, d), "vec_id",
          "embedding", "label", kCells = 8, kNeighbors = 5,
          iters = 2, scale = 1000L)
        .select(col("vec_id"), col("label").cast("long").as("label"),
          col("n_neighbors"), col("n_disagree"), col("flagged"))
        .orderBy(col("vec_id"))
    },

    "q205_hard_negatives_scaled" -> { (s, d) =>
      // q168 at kCells=80 — the production kCells ∝ n parameterization
      // (q203 contract), hash-verified by the k-parameterized oracle.
      Clustering.hardNegatives(Tables.embeddings(s, d), "vec_id",
          "embedding", "label", kCells = 80, kNegatives = 4,
          iters = 2, scale = 1000L)
        .orderBy(col("src"), col("rn"))
    },

    "q206_label_noise_scaled" -> { (s, d) =>
      // q169 at kCells=80 — same contract, same oracle machinery.
      Clustering.labelDisagreement(Tables.embeddings(s, d), "vec_id",
          "embedding", "label", kCells = 80, kNeighbors = 5,
          iters = 2, scale = 1000L)
        .select(col("vec_id"), col("label").cast("long").as("label"),
          col("n_neighbors"), col("n_disagree"), col("flagged"))
        .orderBy(col("vec_id"))
    },

    "q41_ann_bruteforce" -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val probes = emb.filter(col("vec_id") < 10)
      val corpus = emb.filter(col("vec_id") >= 10)
      Similarity.bruteForceTopK(corpus, probes, "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("neighbor_id"), col("cosine"))
        .orderBy(col("query_id"), col("rank"))
    },

    "q284_mmr_rerank" -> { (s, d) =>
      // Diversified retrieval (B111, Carbonell 1998 MMR): prefetch the
      // top-50 by pure cosine (the m ≈ 5k ANN-prefetch shape), then
      // rerank to 10 trading relevance against similarity to what is
      // already picked (λ=0.7) — pure top-k returns near-duplicates of
      // the best hit; MMR surfaces the distinct ones. Integer milli
      // contract, ties to the smallest id; the oracle unrolls all 10
      // rounds (q278 rule).
      val emb = Tables.embeddings(s, d)
      val queries = emb.filter(col("vec_id") === 0)
      val corpus = emb.filter(col("vec_id") >= 20)
      val prefetch = Similarity.bruteForceTopK(
          corpus, queries, "vec_id", "embedding", k = 50)
        .join(corpus.select(col("vec_id").as("neighbor_id"),
          col("embedding")), "neighbor_id")
        .select(col("neighbor_id").as("cand_id"), col("embedding"),
          floor(col("cosine") * 1000).cast("long").as("rel_milli"))
      Similarity.mmrSelect(prefetch, "cand_id", "embedding", "rel_milli",
          k = 10, lambdaPpm = 700000L)
        .select(col("rn"), col("id").as("cand_id"), col("rel_milli"),
          col("maxsim_milli"), col("mmr_score"))
        .orderBy(col("rn"))
    },

    "q283_retrieval_eval" -> { (s, d) =>
      // Ranked-retrieval quality readout (B110): exact-ppm MRR,
      // precision@10, recall@10, AP@10 per query over the brute-force
      // cosine ranking, relevance = label match — the eval harness the
      // ANN family (q41/q42/q66/q74) is tuned against (AUC q224 scores
      // a global ordering; this scores what a top-k list RANKS first).
      // All divisions truncating non-negative integers; ties in the
      // ranking break to the smaller neighbor id (the q41 contract).
      val emb = Tables.embeddings(s, d)
      val queries = emb.filter(col("vec_id") < 20)
      val corpus = emb.filter(col("vec_id") >= 20)
      val ranked = Similarity.bruteForceTopK(
          corpus, queries, "vec_id", "embedding", k = 10)
        .join(queries.select(col("vec_id").as("query_id"),
          col("label").as("__ql")), "query_id")
        .join(corpus.select(col("vec_id").as("neighbor_id"),
          col("label").as("__nl")), "neighbor_id")
        .select(col("query_id"), col("rank"),
          (col("__ql") === col("__nl")).as("rel"))
      val totals = queries
        .select(col("vec_id").as("query_id"), col("label").as("__ql"))
        .join(corpus.groupBy(col("label").as("__ql"))
          .agg(count(lit(1)).as("n_rel")), Seq("__ql"), "left")
        .select(col("query_id"), coalesce(col("n_rel"), lit(0L)).as("n_rel"))
      graft.operators.Evaluation.rankingReport(
          ranked, "query_id", "rank", "rel", totals, "n_rel", k = 10)
        .orderBy(col("query_id"))
    },

    "q42_ann_lsh" -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val queries = emb.filter(col("vec_id") < 10)
      val corpus = emb.filter(col("vec_id") >= 10)
      Similarity.lshTopK(corpus, queries, "vec_id", "embedding", k = 3, nBits = 8)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("neighbor_id"), col("cosine"))
        .orderBy(col("query_id"), col("rank"))
    },

    "q43_embedding_neardup" -> { (s, d) =>
      // Near-duplicate check over a linear pair set (consecutive ids),
      // flagging pairs above a cosine threshold.
      val emb = Tables.embeddings(s, d)
      val pairs = emb.select(col("vec_id").as("id_a"), (col("vec_id") + 1).as("id_b"))
        .join(emb.select(col("vec_id").as("id_b")), "id_b")
      Similarity.pairCosine(emb, "vec_id", "embedding", pairs)
        .select(col("id_a"), col("id_b"), col("cosine"),
          (col("cosine") > 0.3).as("near_dup"))
        .orderBy(col("id_a"))
    },

    "q66_ann_ivf" -> { (s, d) =>
      // IVF with a fixed coarse quantizer (every 50th vector): cell
      // assignment is a narrow argmin map, probes hit nprobe=2 cells —
      // the full inverted-file pipeline under an exact SQL oracle.
      val emb = Tables.embeddings(s, d)
      val cents = emb.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").cast("long").as("cell"), col("embedding").as("cv"))
      val queries = emb.filter(col("vec_id") < 10)
      val corpus = emb.filter(col("vec_id") >= 10)
      Similarity.ivfTopKFixed(corpus, queries, cents, "vec_id", "embedding",
          k = 3, nprobe = 2)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("neighbor_id"), col("cosine"))
        .orderBy(col("query_id"), col("rank"))
    },

    "q74_ivfpq_adc" -> { (s, d) =>
      // IVFADC under an exact SQL oracle: like q66's fixed quantizer, the
      // coarse cells AND the PQ codebooks are taken from data rows
      // (codebook c for subspace i = slice i of vector 3+c), so the whole
      // residual-encode → in-cell ADC pipeline is deterministic relational
      // algebra DuckDB replays bit-for-bit — every fold in the operator
      // (cell argmin, code argmin, table build, lookup sum) is sequential
      // left-to-right by construction. Quantization QUALITY is the recall
      // specs' concern (IvfPqSpec, trained codebooks); this pins the
      // MACHINERY.
      import graft.functions.VectorFunctions.toDouble
      val emb = Tables.embeddings(s, d)
      val queries = emb.filter(col("vec_id") < 3)
      val corpus = emb.filter(col("vec_id") >= 3)
      val m = 4; val nCodes = 8; val dsub = 16
      val cents: Seq[(Long, Seq[Double])] = emb.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id"), toDouble(col("embedding")))
        .orderBy(col("vec_id")).collect()
        .zipWithIndex.map { case (r, i) => (i.toLong, r.getSeq[Double](1)) }.toSeq
      val cbVecs: Seq[Seq[Double]] = emb
        .filter(col("vec_id") >= 3 && col("vec_id") < 3 + nCodes)
        .select(col("vec_id"), toDouble(col("embedding")))
        .orderBy(col("vec_id")).collect().map(_.getSeq[Double](1)).toSeq
      val codebooks = Array.tabulate(m, nCodes) { (i, c) =>
        cbVecs(c).slice(i * dsub, (i + 1) * dsub).toArray
      }
      val model = graft.operators.IvfPq.IvfPqModel(cents,
        graft.operators.Pq.PqModel(m, dsub, nCodes, codebooks))
      val encoded = graft.operators.IvfPq.encode(corpus, "vec_id", "embedding", model)
      graft.operators.IvfPq.topK(encoded, queries, "vec_id", "embedding",
          model, k = 5, nprobe = 2)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("neighbor_id"), col("adist"))
        .orderBy(col("query_id"), col("rank"))
    },

    "q80_cosine_dedup" -> { (s, d) =>
      // Embedding-level corpus dedup (greedy keep-first over bucketed
      // cosine candidates) — the dedup output a training run keeps, as
      // opposed to q43's pair scores.
      Similarity.dropNearDuplicatesByCosine(
          Tables.embeddings(s, d), "vec_id", "embedding",
          threshold = 0.3, nBits = 8)
        .select(col("vec_id"), col("label").cast("long").as("label"))
        .orderBy(col("vec_id"))
    },

    "q301_dbscan_census" -> { (s, d) =>
      // Grid-density DBSCAN-lite census (B128, Ester 1996 via the
      // STING/GriDBSCAN grid): core/border/noise labels from 3x3
      // cell-block counts over the first two embedding dims — the
      // density question (is this point in NO dense region?) k-means
      // can't ask. Relative 6%-of-corpus gate so "dense" stays dense
      // at every SF; bounded cell-table arithmetic, no point pairs;
      // per-label id_sum pins point-level labels.
      graft.operators.Density.gridDbscanCensus(
        Tables.embeddings(s, d), "vec_id", "embedding",
        gridDims = Seq(1, 2), scale = 1000L, cellWidth = 100L,
        densityPpm = 60000L)
        .orderBy(col("dbscan_label"))
    },

    "q303_dbscan_clusters" -> { (s, d) =>
      // Cluster ids for q301's core-dense region (B128 completion):
      // connected components of the core cells under the same 3x3
      // block adjacency, cluster_id = min encoded cell id, census of
      // cluster sizes + per-cluster id_sum. Everything after the
      // shared one-pass cell aggregate runs on the bounded core-cell
      // table; the corpus is never joined back.
      graft.operators.Density.clusterCensus(
        Tables.embeddings(s, d), "vec_id", "embedding",
        gridDims = Seq(1, 2), scale = 1000L, cellWidth = 100L,
        densityPpm = 60000L)
        .orderBy(col("cluster_id"))
    },

    "q123_kmeans" -> { (s, d) =>
      // Fixed-point Lloyd k-means (the SemDeDup clustering step): k=8
      // seeds = the lowest vec_ids, two assignment passes with one
      // integer centroid update between them. Assignment is NARROW (the
      // k×dims centroid table collapses to one broadcast array row);
      // the oracle replays both iterations in SQL over the same
      // scaled-long vectors, so sizes and id checksums match exactly.
      Clustering.kmeansFixed(Tables.embeddings(s, d), "vec_id", "embedding",
          k = 8, iters = 2, scale = 1000L)
        .groupBy(col("cell"))
        .agg(count(lit(1)).as("n"), sum(col("vec_id")).as("id_sum"))
        .orderBy(col("cell"))
    },

    "q124_semdedup" -> { (s, d) =>
      // SemDeDup end-to-end: k-means cells (q123's exact fixture), then
      // pairwise cosine INSIDE each cell only, greedy keep-first above
      // 0.3. The pair space is bounded by the cell sizes — k grows with n
      // at scale so cells stay ~constant and the join never goes
      // cartesian. Output = the kept corpus with its cell labels.
      Clustering.semanticDedup(Tables.embeddings(s, d), "vec_id", "embedding",
          k = 8, iters = 2, scale = 1000L, threshold = 0.3)
        .orderBy(col("vec_id"))
    },

    "q179_semdedup_projected" -> { (s, d) =>
      // SemDeDup with the CLUSTERING run in JL-projected space (q174's
      // 16-dim sign projections — distance work per assignment shrinks
      // 4x) and the in-cell verify still exact cosine on the original
      // 64-dim vectors: the B41 projection integrated as a scale path,
      // not a standalone transform. Keep-first semantics and the
      // Σ|cell|² pair bound are q124's; only the cell boundary moves,
      // and the oracle replays projection + both k-means iterations +
      // the exact verify bit-for-bit.
      Clustering.semanticDedupProjected(Tables.embeddings(s, d), "vec_id",
          "embedding", dim = 64, dOut = 16, k = 8, iters = 2,
          projScale = 1000L, seed = 42L, threshold = 0.3)
        .orderBy(col("vec_id"))
    },

    "q130_semdedup_incremental" -> { (s, d) =>
      // Daily-ingest semantic dedup: every 10th vector is "today's
      // batch" (q97's convention); centroids are trained on HISTORY
      // only, both sides get the narrow assignment, and pairs touch the
      // batch only — history x history never exists. Output = the fresh
      // vectors that survive against the corpus and each other.
      val emb = Tables.embeddings(s, d)
      Clustering.semanticDedupIncremental(
          emb.filter(col("vec_id") % 10 =!= 0),
          emb.filter(col("vec_id") % 10 === 0),
          "vec_id", "embedding", k = 8, iters = 2, scale = 1000L,
          threshold = 0.3)
        .orderBy(col("vec_id"))
    },

    "q188_semantic_decontamination" -> { (s, d) =>
      // SEMANTIC benchmark decontamination — the embedding-space member
      // of the decontamination family (q116 n-grams, q172 spans): flag
      // corpus vectors cosine-near ANY held-out bench vector (every 10th
      // id, q130's convention) — paraphrased eval leakage that shares no
      // n-grams. Cells are fit on the BOUNDED bench side, both sides get
      // the narrow assignment, and the compare join broadcasts the bench
      // — the corpus never shuffles; per-row hit counts are combinable.
      val emb = Tables.embeddings(s, d)
      Clustering.semanticContamination(
          emb.filter(col("vec_id") % 10 =!= 0),
          emb.filter(col("vec_id") % 10 === 0),
          "vec_id", "embedding", k = 8, iters = 2, scale = 1000L,
          threshold = 0.3)
        .orderBy(col("vec_id"))
    },

    "q197_cross_signal_clusters" -> { (s, d) =>
      // Cross-signal dedup clusters: connected components over the UNION
      // of q196's textual and semantic edges, so one cluster captures a
      // near-copy chain AND its paraphrases transitively (either signal
      // alone under-merges a leakage-safe split). Min-label/star CC,
      // sizes by aggregate + join-back — never a window over a cluster.
      // The cosine gate is TIGHTER than q196's report threshold (0.5 vs
      // 0.3): transitive closure percolates a loose threshold graph into
      // a mega-component (measured: tau=0.3 chained 41% of the sf0.1
      // corpus into ONE cluster) — the known failure mode that makes
      // SemDeDup-class pipelines keep clustering local; a closure gate
      // must be a dup-grade threshold.
      Similarity.crossSignalClusters(
          Tables.documents(s, d),
          Tables.embeddings(s, d)
            .select(col("vec_id").as("doc_id"), col("embedding")),
          "doc_id", "text", "embedding", cosThreshold = 0.5)
        .orderBy(col("doc_id"))
    },

    "q207_cross_signal_clusters_scaled" -> { (s, d) =>
      // q197 at the production cell parameterization AND with the
      // round-6 percolation guard ARMED (maxComponentSize): the full
      // cluster path — union edges at kCells=80, CC, sizes — runs
      // in-gate with the guard that production would carry, proving the
      // guard changes nothing when components stay under the bound
      // (the dup-grade tau=0.5 keeps them small by construction here).
      Similarity.crossSignalClusters(
          Tables.documents(s, d),
          Tables.embeddings(s, d)
            .select(col("vec_id").as("doc_id"), col("embedding")),
          "doc_id", "text", "embedding", kCells = 80, cosThreshold = 0.5,
          maxComponentSize = 1000L)
        .orderBy(col("doc_id"))
    },

    "q196_cross_signal" -> { (s, d) =>
      // Cross-signal dedup consistency: exact CDC-chunk Jaccard (q159's
      // machinery) vs in-cell embedding cosine (q124's pair space) over
      // the same corpus — text_only pairs flag embedding-pipeline
      // glitches / templated text, semantic_only pairs are the
      // paraphrases n-gram dedup structurally misses. Both exact scores
      // are backfilled over the BOUNDED pair set (the rare-chunk sets
      // and the k-means fit are each computed once). vec_id == doc_id
      // is the fixture's embedded-corpus side-table convention.
      Similarity.crossSignalPairs(
          Tables.documents(s, d),
          Tables.embeddings(s, d)
            .select(col("vec_id").as("doc_id"), col("embedding")),
          "doc_id", "text", "embedding")
        .orderBy(col("id_a"), col("id_b"))
    },

    "q307_cross_signal_evidence" -> { (s, d) =>
      // sf1 evidence twin for q196 (BASELINE §20: its kNN-replay
      // oracle is DuckDB-resource-limited at sf1 — Σ|cell|² pair
      // space): the SAME crossSignalPairs machinery over the 10%
      // mixedBucket doc/embedding slice (vec_id == doc_id, so one
      // bucket gate keeps the sides aligned; 10% is the smallest
      // power-of-ten slice where all three verdict branches are live
      // at sf1 — 2% decorrelates the near-dup families and leaves
      // text_only/both empty), collapsed to one
      // BIGINT-checksum row — verdict mix, jac total, per-row
      // floor-integerized cosine total, and an id-aligned pair
      // checksum. The q265/q266 red-row pattern.
      val docs = Tables.documents(s, d)
        .filter(graft.operators.Sampling.mixedBucket(col("doc_id")) < 100)
      val emb = Tables.embeddings(s, d)
        .filter(graft.operators.Sampling.mixedBucket(col("vec_id")) < 100)
        .select(col("vec_id").as("doc_id"), col("embedding"))
      Similarity.crossSignalPairs(docs, emb, "doc_id", "text", "embedding")
        .agg(
          count(lit(1)).as("n_pairs"),
          sum(when(col("verdict") === "both", 1L).otherwise(0L))
            .as("n_both"),
          sum(when(col("verdict") === "text_only", 1L).otherwise(0L))
            .as("n_text_only"),
          sum(when(col("verdict") === "semantic_only", 1L).otherwise(0L))
            .as("n_semantic_only"),
          sum(col("jac_ppm")).as("jac_sum"),
          sum(coalesce(floor(col("cos") * 1000000 + lit(0.5)).cast("long"),
            lit(0L))).as("cos_ppm_sum"),
          sum(pmod(pmod(col("id_a"), lit(1000003L)) * 31L +
            pmod(col("id_b"), lit(1000003L)), lit(1000003L)))
            .as("pair_checksum"))
        .select(col("n_pairs"),
          coalesce(col("n_both"), lit(0L)).as("n_both"),
          coalesce(col("n_text_only"), lit(0L)).as("n_text_only"),
          coalesce(col("n_semantic_only"), lit(0L)).as("n_semantic_only"),
          coalesce(col("jac_sum"), lit(0L)).as("jac_sum"),
          coalesce(col("cos_ppm_sum"), lit(0L)).as("cos_ppm_sum"),
          coalesce(col("pair_checksum"), lit(0L)).as("pair_checksum"))
    },

    "q204_cross_signal_scaled" -> { (s, d) =>
      // q196 at the PRODUCTION cell parameterization (kCells ∝ n, the
      // q203 contract applied to the composition): same cross-signal
      // semantics, semantic side at kCells=80 — oracle-checked so the
      // knob sits inside the gate for the composed operator too, not
      // just the bare kNN graph. The text (CDC Jaccard) side is
      // kCells-independent; only the kNN edge set changes.
      Similarity.crossSignalPairs(
          Tables.documents(s, d),
          Tables.embeddings(s, d)
            .select(col("vec_id").as("doc_id"), col("embedding")),
          "doc_id", "text", "embedding", kCells = 80)
        .orderBy(col("id_a"), col("id_b"))
    },

    "q150_knn_graph" -> { (s, d) =>
      // Cell-bounded kNN graph over the corpus embeddings (q123's exact
      // k-means fixture): 3 nearest in-cell neighbors by cosine per
      // vector. Pair space is cell-bounded (never cartesian) and the
      // per-source cut is the k-bounded heap — a mega-cell collapses
      // map-side instead of buffering in a window task.
      Clustering.knnGraph(Tables.embeddings(s, d), "vec_id", "embedding",
          kCells = 8, kNeighbors = 3, iters = 2, scale = 1000L)
        .orderBy(col("src"), col("rn"))
    },

    "q203_knn_graph_scaled" -> { (s, d) =>
      // q150's SCALE PATH under the same oracle machinery (the q199
      // pattern): identical kNN-graph semantics at the production
      // parameterization kCells ∝ n — in-cell pair space is quadratic
      // in cell SIZE, so holding kCells fixed while the corpus grows
      // (q150's oracle-pinned kCells=8) is the measured 21x-at-10x
      // fixture, and scaling kCells with n restores near-linear cost
      // (sf1: 24.4 s at kCells=8 vs ~9 s at kCells=80, BASELINE §8).
      // Oracle-checked at kCells=80 so the knob itself sits inside the
      // gate, not just in prose.
      Clustering.knnGraph(Tables.embeddings(s, d), "vec_id", "embedding",
          kCells = 80, kNeighbors = 3, iters = 2, scale = 1000L)
        .orderBy(col("src"), col("rn"))
    },

    "q151_proto_pruning" -> { (s, d) =>
      // SSL-prototypes diversity pruning (Sorscher et al. 2022): keep
      // the 10 LEAST prototypical (largest integer L2 to their assigned
      // centroid) vectors per k-means cell. All-integer distances, so
      // the oracle replays ranks bit-for-bit.
      Clustering.prototypePruning(Tables.embeddings(s, d), "vec_id",
          "embedding", kCells = 8, keepPerCell = 10, iters = 2,
          scale = 1000L)
        .orderBy(col("cell"), col("rn"))
    },

    "q125_int8_quant" -> { (s, d) =>
      // Int8 storage quantization: per-vector max-abs scale + integer
      // codes (the 4x embedding-table shrink an ANN ingest consumes).
      // Reported as the scale plus integer code checksums; every step is
      // per-row narrow arithmetic — no shuffle at any scale.
      val q = VectorFunctions.int8Quantize(col("embedding"))
      Tables.embeddings(s, d)
        .select(col("vec_id"), q.as("__q"))
        .select(col("vec_id"),
          col("__q").getField("qscale").as("qscale"),
          aggregate(col("__q").getField("q"), lit(0L), (a, x) => a + x).as("q_sum"),
          aggregate(col("__q").getField("q"), lit(0L), (a, x) => a + x * x).as("q_norm2"))
        .orderBy(col("vec_id"))
    },

    "q101_label_centroids" -> { (s, d) =>
      // Per-label centroids — the k-means update step — via the native
      // FIXED-POINT vector-sum aggregate (round(x·2^30) into long[dims]
      // buffers): integer sums are order-independent (float sums are not
      // even run-to-run stable under Spark's merge order), map-side
      // combinable, and ship ONE buffer per (group, partition) instead of
      // rows×dims exploded scalars. Fixed-point rather than DECIMAL
      // because engines round float→decimal differently (Spark via the
      // shortest string repr); round-half-away on the exact 2^30 product
      // is identical in both. Long-form output (label, dim, mean); the
      // posexplode+sum formulation is the spec-pinned parity reference.
      Tables.embeddings(s, d)
        .groupBy(col("label").cast("long").as("label"))
        .agg(VectorFunctions.vectorSumFixed(col("embedding"), 1L << 30).as("fx"))
        .select(col("label"), col("fx.n").as("n"),
          posexplode(col("fx.sums")).as(Seq("dim", "s")))
        .select(col("label"), col("dim").cast("long").as("dim"),
          ((col("s").cast("double") / 1073741824L) / col("n")).as("mean"))
        .orderBy(col("label"), col("dim"))
    },

    "q44_vector_stats" -> { (s, d) =>
      // Per-label centroid norms — aggregation over vector columns using
      // position-wise sums (exact integer count + sequential-fold norm).
      val emb = Tables.embeddings(s, d)
      emb.groupBy(col("label").cast("long").as("label"))
        .agg(count(lit(1)).as("n"),
          min(VectorFunctions.l2Norm(col("embedding"))).as("min_norm"),
          max(VectorFunctions.l2Norm(col("embedding"))).as("max_norm"))
        .orderBy(col("label"))
    })

  /** The 8-bit sign-bucket expression (matches VectorFunctions.signBucket
    * on the raw float column) — shared by the q42 and q80 oracles.
    */
  private val BucketSql: String = (0 until 8).map { j =>
    s"(CASE WHEN embedding[${j + 1}] > 0 THEN ${1 << j} ELSE 0 END)"
  }.mkString(" + ")

  /** Shared k-means oracle prefix (q123 + q124 + q130): two unrolled
    * Lloyd iterations — seeds + update TRAINED on the `va` view
    * (`trainWhere` over all rows; TRUE = classic whole-corpus fit), the
    * final assignment `i2` over ALL rows, which is exactly
    * Clustering.assignCells(all, kmeansCentroids(train)). `v` also
    * carries the raw doubles for cosine reuse.
    */
  private def kmeansCte(trainWhere: String, k: Int = 8): String = s"""
      WITH v AS (
        SELECT CAST(vec_id AS BIGINT) AS id,
          CAST(embedding AS DOUBLE[]) AS rv,
          list_transform(embedding,
            x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS sv
        FROM embeddings),
      va AS (SELECT * FROM v WHERE $trainWhere),
      c AS (
        SELECT cell, cv FROM (
          SELECT row_number() OVER (ORDER BY id) - 1 AS cell, sv AS cv FROM va) t
        WHERE cell < $k),
      a AS (
        SELECT id, sv, cell,
          row_number() OVER (PARTITION BY id ORDER BY
            list_sum(list_transform(generate_series(1, len(sv)),
              i -> (sv[i] - cv[i]) * (sv[i] - cv[i]))), cell) AS rn
        FROM va CROSS JOIN c),
      i1 AS (SELECT id, sv, cell FROM a WHERE rn = 1),
      g AS (
        SELECT cell, dim, CAST(sum(x) AS BIGINT) AS sm, CAST(count(*) AS BIGINT) AS n
        FROM (SELECT cell, CAST(generate_subscripts(sv, 1) AS BIGINT) AS dim,
                unnest(sv) AS x FROM i1) t
        GROUP BY cell, dim),
      ct AS (
        SELECT cell,
          list(CAST(floor(CAST(sm AS DOUBLE) / n) AS BIGINT) ORDER BY dim) AS cv
        FROM g GROUP BY cell),
      b AS (
        SELECT id, cell,
          row_number() OVER (PARTITION BY id ORDER BY
            list_sum(list_transform(generate_series(1, len(sv)),
              i -> (sv[i] - cv[i]) * (sv[i] - cv[i]))), cell) AS rn
        FROM v CROSS JOIN ct),
      i2 AS (SELECT id, cell FROM b WHERE rn = 1)"""

  private val KmeansCte = kmeansCte("TRUE")

  /** q168 / q205 oracle, parameterized by the cell count — the same SQL
    * at kCells=8 (the small-SF pin) and kCells=80 (the production
    * kCells ∝ n parameterization, the q203 contract).
    */
  private def hardNegativesOracle(k: Int): String = s"""${kmeansCte("TRUE", k)},
      lab AS (SELECT CAST(vec_id AS BIGINT) AS id, label FROM embeddings),
      pairs AS (
        SELECT ia.id AS src, ib.id AS dst,
          list_dot_product(va.rv, vb.rv)
            / (sqrt(list_dot_product(va.rv, va.rv))
               * sqrt(list_dot_product(vb.rv, vb.rv))) AS cos
        FROM i2 ia JOIN i2 ib ON ia.cell = ib.cell AND ia.id <> ib.id
        JOIN lab la2 ON la2.id = ia.id
        JOIN lab lb2 ON lb2.id = ib.id
        JOIN v va ON va.id = ia.id
        JOIN v vb ON vb.id = ib.id
        WHERE la2.label IS NOT NULL AND lb2.label IS NOT NULL
          AND la2.label <> lb2.label),
      ranked AS (
        SELECT src, dst, cos,
          row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rn
        FROM pairs WHERE NOT isnan(cos))
      SELECT src, CAST(rn AS BIGINT) AS rn, dst, cos
      FROM ranked WHERE rn <= 4 ORDER BY src, rn"""

  /** q169 / q206 oracle, parameterized by the cell count. */
  private def labelNoiseOracle(k: Int): String = s"""${kmeansCte("TRUE", k)},
      lab AS (SELECT CAST(vec_id AS BIGINT) AS id, label FROM embeddings),
      pairs AS (
        SELECT ia.id AS src, ib.id AS dst,
          list_dot_product(va.rv, vb.rv)
            / (sqrt(list_dot_product(va.rv, va.rv))
               * sqrt(list_dot_product(vb.rv, vb.rv))) AS cos
        FROM i2 ia JOIN i2 ib ON ia.cell = ib.cell AND ia.id <> ib.id
        JOIN v va ON va.id = ia.id
        JOIN v vb ON vb.id = ib.id),
      ranked AS (
        SELECT src, dst, cos,
          row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rn
        FROM pairs WHERE NOT isnan(cos))
      SELECT src AS vec_id, CAST(la2.label AS BIGINT) AS label,
        CAST(count(*) AS BIGINT) AS n_neighbors,
        CAST(sum(CASE WHEN lb2.label IS DISTINCT FROM la2.label
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_disagree,
        (2 * sum(CASE WHEN lb2.label IS DISTINCT FROM la2.label
                 THEN 1 ELSE 0 END) > count(*)) AS flagged
      FROM ranked
      JOIN lab la2 ON la2.id = src
      JOIN lab lb2 ON lb2.id = dst
      WHERE rn <= 5
      GROUP BY src, la2.label ORDER BY vec_id"""

  /** Shared q196/q197 oracle prefix: the CDC rare-chunk Jaccard table
    * (renamed copies of the q159 CTEs — the shared fragment clashes on
    * the kmeans CTE's `a`), the k-bounded kNN semantic pairs, and their
    * full-outer union `fo` — the cross-signal edge set.
    */
  private def CrossSignalCte(cosTau: String, k: Int = 8): String =
    s"""${kmeansCte("TRUE", k)},
      ctoks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
      cpp AS (
        SELECT doc_id, l, unnest(l) AS tok,
          CAST(generate_subscripts(l, 1) AS BIGINT) AS pos
        FROM ctoks),
      cff AS (
        SELECT doc_id, tok, pos,
          CASE WHEN pos >= 3 AND
            list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(string_split(
                l[pos - 2] || ' ' || l[pos - 1] || ' ' || l[pos], ''),
                x -> CAST(unicode(x) AS BIGINT))),
              (acc, c2) -> (acc * 31 + c2) % ${graft.operators.Dedup.M}) % 8 = 0
          THEN 1 ELSE 0 END AS bflag
        FROM cpp),
      cxx AS (
        SELECT doc_id, tok, pos,
          CAST(coalesce(sum(bflag) OVER (PARTITION BY doc_id ORDER BY pos
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
            AS chunk_idx
        FROM cff),
      caa AS (
        SELECT doc_id, chunk_idx, string_agg(tok, ' ' ORDER BY pos) AS chunk
        FROM cxx GROUP BY doc_id, chunk_idx),
      cch AS (
        SELECT doc_id,
          list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform(string_split(chunk, ''),
              x -> CAST(unicode(x) AS BIGINT))),
            (acc, c2) -> (acc * 31 + c2) % ${graft.operators.Dedup.M}) AS chunk_hash
        FROM caa),
      sets AS (SELECT DISTINCT doc_id, chunk_hash FROM cch),
      dfq2 AS (
        SELECT chunk_hash, CAST(count(*) AS BIGINT) AS nd
        FROM sets GROUP BY chunk_hash),
      perdoc AS (
        SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n
        FROM sets s JOIN dfq2 USING (chunk_hash)
        WHERE nd <= 10 GROUP BY s.doc_id),
      rare AS (
        SELECT s.doc_id, s.chunk_hash
        FROM sets s JOIN dfq2 USING (chunk_hash)
        WHERE nd > 1 AND nd <= 10),
      szs AS (
        SELECT ra.doc_id AS id_a, rb.doc_id AS id_b,
          CAST(count(*) AS BIGINT) AS sh
        FROM rare ra JOIN rare rb ON ra.chunk_hash = rb.chunk_hash
          AND ra.doc_id < rb.doc_id
        GROUP BY 1, 2),
      jall AS (
        SELECT szs.id_a, szs.id_b,
          (1000000 * sh) // (pa.n + pb.n - sh) AS jac_all
        FROM szs JOIN perdoc pa ON pa.doc_id = szs.id_a
                 JOIN perdoc pb ON pb.doc_id = szs.id_b),
      tp AS (SELECT id_a, id_b, jac_all FROM jall WHERE jac_all >= 300000),
      spc AS (
        SELECT ia.id AS src, ib.id AS dst,
          list_dot_product(va2.rv, vb2.rv)
            / (sqrt(list_dot_product(va2.rv, va2.rv))
               * sqrt(list_dot_product(vb2.rv, vb2.rv))) AS coss
        FROM i2 ia JOIN i2 ib ON ia.cell = ib.cell AND ia.id <> ib.id
        JOIN v va2 ON va2.id = ia.id
        JOIN v vb2 ON vb2.id = ib.id),
      srk AS (
        SELECT src, dst, coss FROM (
          SELECT src, dst, coss,
            row_number() OVER (PARTITION BY src ORDER BY coss DESC, dst) AS rn
          FROM spc WHERE NOT isnan(coss)) t
        WHERE rn <= 3),
      sp AS (
        SELECT DISTINCT least(src, dst) AS id_a, greatest(src, dst) AS id_b,
          coss
        FROM srk WHERE coss >= $cosTau),
      fo AS (
        SELECT coalesce(tp.id_a, sp.id_a) AS id_a,
          coalesce(tp.id_b, sp.id_b) AS id_b,
          tp.jac_all AS jac_t, sp.coss
        FROM tp FULL OUTER JOIN sp
          ON tp.id_a = sp.id_a AND tp.id_b = sp.id_b)"""

  /** q217 oracle: the six greedy rounds unrolled as chained CTEs (the
    * BPE-oracle pattern — the oracle replays every iteration, so a
    * drift in any round's argmax or tiebreak hash-fails).
    */
  private def kCenterSql(k: Int): String = {
    val d2 = (a: String, b: String) =>
      s"list_sum(list_transform(generate_series(1, len($a)), " +
        s"j -> ($a[j] - $b[j]) * ($a[j] - $b[j])))"
    val stages = (2 to k).map { r =>
      s"""s$r AS (
        SELECT id, sv, mind AS d2 FROM (
          SELECT v.id, v.sv, min(${d2("v.sv", "c.sv")}) AS mind
          FROM v CROSS JOIN c${r - 1} c GROUP BY v.id, v.sv) t
        ORDER BY mind DESC, id LIMIT 1),
      c$r AS (SELECT * FROM c${r - 1}
        UNION ALL SELECT CAST($r AS BIGINT), id, sv, d2 FROM s$r)"""
    }.mkString(",\n      ")
    s"""
      WITH v AS (
        SELECT CAST(vec_id AS BIGINT) AS id,
          list_transform(CAST(embedding AS DOUBLE[]),
            x -> CAST(floor(x * 1000 + 0.5) AS BIGINT)) AS sv
        FROM embeddings),
      s1 AS (SELECT id, sv, CAST(NULL AS BIGINT) AS d2
        FROM v ORDER BY id LIMIT 1),
      c1 AS (SELECT CAST(1 AS BIGINT) AS rank, id, sv, d2 FROM s1),
      $stages,
      assign AS (
        SELECT id, rank FROM (
          SELECT v.id, c.rank,
            row_number() OVER (PARTITION BY v.id
              ORDER BY ${d2("v.sv", "c.sv")}, c.rank) AS rn
          FROM v CROSS JOIN c$k c) t
        WHERE rn = 1),
      cnt AS (SELECT rank, CAST(count(*) AS BIGINT) AS n_assigned
        FROM assign GROUP BY 1)
      SELECT c.rank, c.id AS vec_id, CAST(c.d2 AS BIGINT) AS d2_sel,
        cnt.n_assigned
      FROM c$k c JOIN cnt USING (rank) ORDER BY c.rank"""
  }

  val oracle: Map[String, String] = Map(
    "q217_kcenter_select" -> kCenterSql(6),

    "q174_sign_projection" -> s"""
      WITH q AS (
        SELECT CAST(vec_id AS BIGINT) AS vec_id,
          list_transform(CAST(embedding AS DOUBLE[]),
            x -> CAST(floor(x * 1000 + 0.5) AS BIGINT)) AS qv
        FROM embeddings)
      SELECT vec_id, CAST(j AS BIGINT) AS dim_out,
        CAST(sum(qv[i + 1] * ${graft.operators.Projection.signSql("j * 64 + i + 42")}) AS BIGINT) AS val
      FROM q, unnest(generate_series(0, 15)) AS gj(j),
           unnest(generate_series(0, 63)) AS gi(i)
      GROUP BY 1, 2 ORDER BY vec_id, dim_out""",

    "q167_isotropy_proj" -> """
      WITH v AS (
        SELECT CAST(vec_id AS BIGINT) AS id,
          list_transform(embedding,
            x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS sv
        FROM embeddings),
      nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
      dimsums AS (
        SELECT dim, CAST(sum(x) AS BIGINT) AS s FROM (
          SELECT CAST(generate_subscripts(sv, 1) AS BIGINT) AS dim,
            unnest(sv) AS x
          FROM v) t
        GROUP BY 1),
      ml AS (SELECT list(s // (SELECT n FROM nn) ORDER BY dim) AS m
             FROM dimsums),
      cv AS (
        SELECT id, list_transform(generate_series(1, len(sv)),
          i -> sv[i] - m[i]) AS c
        FROM v, ml),
      ds AS (SELECT dim AS j FROM dimsums),
      mat AS (
        SELECT dj.j AS j, dk.j AS k, CAST(sum(c[dj.j] * c[dk.j]) AS BIGINT) AS m
        FROM cv, ds dj, ds dk GROUP BY 1, 2),
      w1 AS (SELECT j, CAST(sum(m) AS BIGINT) AS w FROM mat GROUP BY j),
      v1 AS (SELECT j, w // CAST(greatest(1,
               (SELECT max(abs(w)) FROM w1) // 1000000) AS BIGINT) AS v
             FROM w1),
      w2 AS (
        SELECT mat.j AS j, CAST(sum(mat.m * v1.v) AS BIGINT) AS w
        FROM mat JOIN v1 ON mat.k = v1.j GROUP BY 1),
      v2 AS (SELECT j, w // CAST(greatest(1,
               (SELECT max(abs(w)) FROM w2) // 1000000) AS BIGINT) AS v
             FROM w2)
      SELECT cv.id AS vec_id, CAST(sum(cv.c[v2.j] * v2.v) AS BIGINT) AS proj
      FROM cv, v2 GROUP BY 1 ORDER BY vec_id""",

    "q130_semdedup_incremental" -> s"""${kmeansCte("id % 10 <> 0")},
      f AS (SELECT id, cell FROM i2 WHERE id % 10 = 0),
      h AS (SELECT id, cell FROM i2 WHERE id % 10 <> 0),
      pairs AS (
        SELECT h.id AS id_a, f.id AS id_b, f.cell FROM h JOIN f USING (cell)
        UNION ALL
        SELECT fa.id AS id_a, fb.id AS id_b, fb.cell
        FROM f fa JOIN f fb ON fa.cell = fb.cell AND fa.id < fb.id),
      losers AS (
        SELECT DISTINCT p.id_b
        FROM pairs p
        JOIN v ia ON ia.id = p.id_a
        JOIN v ib ON ib.id = p.id_b
        WHERE list_dot_product(ia.rv, ib.rv)
          / (sqrt(list_dot_product(ia.rv, ia.rv))
             * sqrt(list_dot_product(ib.rv, ib.rv))) >= 0.3)
      SELECT id AS vec_id, cell FROM f
      WHERE id NOT IN (SELECT id_b FROM losers)
      ORDER BY vec_id""",

    "q188_semantic_decontamination" -> s"""${kmeansCte("id % 10 = 0")},
      bch AS (SELECT id, cell FROM i2 WHERE id % 10 = 0),
      cor AS (SELECT id, cell FROM i2 WHERE id % 10 <> 0),
      cosv AS (
        SELECT cor.id AS id,
          list_dot_product(vc.rv, vb.rv)
            / (sqrt(list_dot_product(vc.rv, vc.rv))
               * sqrt(list_dot_product(vb.rv, vb.rv))) AS cs
        FROM cor JOIN bch USING (cell)
        JOIN v vc ON vc.id = cor.id
        JOIN v vb ON vb.id = bch.id),
      hits AS (
        SELECT id,
          CAST(sum(CASE WHEN cs >= 0.3 THEN 1 ELSE 0 END) AS BIGINT) AS nh,
          max(cs) AS mc
        FROM cosv WHERE NOT isnan(cs) GROUP BY id)
      SELECT cor.id AS vec_id,
        CAST(coalesce(hits.nh, 0) AS BIGINT) AS n_bench_hits,
        hits.mc AS max_cos,
        coalesce(hits.nh, 0) > 0 AS contaminated
      FROM cor LEFT JOIN hits ON cor.id = hits.id
      ORDER BY vec_id""",

    "q196_cross_signal" -> s"""${CrossSignalCte("0.3")},
      bcf AS (
        SELECT fo.id_a, fo.id_b, fo.jac_t, fo.coss,
          list_dot_product(ea.rv, eb.rv)
            / (sqrt(list_dot_product(ea.rv, ea.rv))
               * sqrt(list_dot_product(eb.rv, eb.rv))) AS cosb
        FROM fo LEFT JOIN v ea ON ea.id = fo.id_a
                LEFT JOIN v eb ON eb.id = fo.id_b),
      fin AS (
        SELECT bcf.id_a, bcf.id_b,
          CAST(coalesce(bcf.jac_t, jall.jac_all, 0) AS BIGINT) AS jac_ppm,
          coalesce(bcf.coss,
            CASE WHEN NOT isnan(bcf.cosb) THEN bcf.cosb END) AS cos
        FROM bcf LEFT JOIN jall
          ON jall.id_a = bcf.id_a AND jall.id_b = bcf.id_b)
      SELECT id_a, id_b, jac_ppm, cos,
        CASE WHEN jac_ppm >= 300000 AND cos IS NOT NULL AND cos >= 0.3
               THEN 'both'
             WHEN jac_ppm >= 300000 THEN 'text_only'
             ELSE 'semantic_only' END AS verdict
      FROM fin ORDER BY id_a, id_b""",

    // the q196 chain verbatim over the 10% mixedBucket slice of BOTH
    // sides (every FROM documents/embeddings redirected to the slice
    // CTEs), collapsed to one checksum row — DuckDB replays it at sf1
    // where the full-corpus kNN oracle exhausts resources
    "q307_cross_signal_evidence" -> {
      val mbd = graft.operators.Sampling.mixedBucketSql("doc_id")
      val mbv = graft.operators.Sampling.mixedBucketSql("vec_id")
      (s"""${CrossSignalCte("0.3")},
      bcf AS (
        SELECT fo.id_a, fo.id_b, fo.jac_t, fo.coss,
          list_dot_product(ea.rv, eb.rv)
            / (sqrt(list_dot_product(ea.rv, ea.rv))
               * sqrt(list_dot_product(eb.rv, eb.rv))) AS cosb
        FROM fo LEFT JOIN v ea ON ea.id = fo.id_a
                LEFT JOIN v eb ON eb.id = fo.id_b),
      fin AS (
        SELECT bcf.id_a, bcf.id_b,
          CAST(coalesce(bcf.jac_t, jall.jac_all, 0) AS BIGINT) AS jac_ppm,
          coalesce(bcf.coss,
            CASE WHEN NOT isnan(bcf.cosb) THEN bcf.cosb END) AS cos
        FROM bcf LEFT JOIN jall
          ON jall.id_a = bcf.id_a AND jall.id_b = bcf.id_b),
      vr AS (
        SELECT id_a, id_b, jac_ppm, cos,
          CASE WHEN jac_ppm >= 300000 AND cos IS NOT NULL AND cos >= 0.3
                 THEN 'both'
               WHEN jac_ppm >= 300000 THEN 'text_only'
               ELSE 'semantic_only' END AS verdict
        FROM fin)
      SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        CAST(coalesce(sum(CASE WHEN verdict = 'both' THEN 1 ELSE 0 END),
          0) AS BIGINT) AS n_both,
        CAST(coalesce(sum(CASE WHEN verdict = 'text_only' THEN 1 ELSE 0
          END), 0) AS BIGINT) AS n_text_only,
        CAST(coalesce(sum(CASE WHEN verdict = 'semantic_only' THEN 1
          ELSE 0 END), 0) AS BIGINT) AS n_semantic_only,
        CAST(coalesce(sum(jac_ppm), 0) AS BIGINT) AS jac_sum,
        CAST(coalesce(sum(coalesce(
          CAST(floor(cos * 1000000 + 0.5) AS BIGINT), 0)), 0) AS BIGINT)
          AS cos_ppm_sum,
        CAST(coalesce(sum((((id_a % 1000003 + 1000003) % 1000003) * 31
          + ((id_b % 1000003 + 1000003) % 1000003)) % 1000003), 0)
          AS BIGINT) AS pair_checksum
      FROM vr""")
        .replace("FROM documents", "FROM docsl")
        .replace("FROM embeddings", "FROM embsl")
        .replaceFirst("WITH ",
          s"WITH docsl AS (SELECT * FROM documents WHERE $mbd < 100), " +
            s"embsl AS (SELECT * FROM embeddings WHERE $mbv < 100), ")
    },

    "q204_cross_signal_scaled" -> s"""${CrossSignalCte("0.3", 80)},
      bcf AS (
        SELECT fo.id_a, fo.id_b, fo.jac_t, fo.coss,
          list_dot_product(ea.rv, eb.rv)
            / (sqrt(list_dot_product(ea.rv, ea.rv))
               * sqrt(list_dot_product(eb.rv, eb.rv))) AS cosb
        FROM fo LEFT JOIN v ea ON ea.id = fo.id_a
                LEFT JOIN v eb ON eb.id = fo.id_b),
      fin AS (
        SELECT bcf.id_a, bcf.id_b,
          CAST(coalesce(bcf.jac_t, jall.jac_all, 0) AS BIGINT) AS jac_ppm,
          coalesce(bcf.coss,
            CASE WHEN NOT isnan(bcf.cosb) THEN bcf.cosb END) AS cos
        FROM bcf LEFT JOIN jall
          ON jall.id_a = bcf.id_a AND jall.id_b = bcf.id_b)
      SELECT id_a, id_b, jac_ppm, cos,
        CASE WHEN jac_ppm >= 300000 AND cos IS NOT NULL AND cos >= 0.3
               THEN 'both'
             WHEN jac_ppm >= 300000 THEN 'text_only'
             ELSE 'semantic_only' END AS verdict
      FROM fin ORDER BY id_a, id_b""",

    "q207_cross_signal_clusters_scaled" -> s"""${CrossSignalCte("0.5", 80)},
      und AS (
        SELECT id_a AS src, id_b AS dst FROM fo
        UNION ALL SELECT id_b, id_a FROM fo),
      reach AS (
        SELECT doc_id AS n, doc_id AS l FROM documents
        UNION
        SELECT u.dst, r.l FROM reach r JOIN und u ON u.src = r.n),
      cls AS (
        SELECT n AS doc_id, CAST(min(l) AS BIGINT) AS cluster_id
        FROM reach GROUP BY n),
      szs2 AS (
        SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
        FROM cls GROUP BY cluster_id)
      SELECT cls.doc_id, cls.cluster_id, szs2.cluster_size
      FROM cls JOIN szs2 USING (cluster_id)
      ORDER BY doc_id""".replaceFirst("WITH ", "WITH RECURSIVE "),

    "q197_cross_signal_clusters" -> s"""${CrossSignalCte("0.5")},
      und AS (
        SELECT id_a AS src, id_b AS dst FROM fo
        UNION ALL SELECT id_b, id_a FROM fo),
      reach AS (
        SELECT doc_id AS n, doc_id AS l FROM documents
        UNION
        SELECT u.dst, r.l FROM reach r JOIN und u ON u.src = r.n),
      cls AS (
        SELECT n AS doc_id, CAST(min(l) AS BIGINT) AS cluster_id
        FROM reach GROUP BY n),
      szs2 AS (
        SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
        FROM cls GROUP BY cluster_id)
      SELECT cls.doc_id, cls.cluster_id, szs2.cluster_size
      FROM cls JOIN szs2 USING (cluster_id)
      ORDER BY doc_id""".replaceFirst("WITH ", "WITH RECURSIVE "),


    "q301_dbscan_census" -> """
      WITH v AS (
        SELECT CAST(vec_id AS BIGINT) AS id,
          CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000 + 0.5)
            AS BIGINT) AS s0,
          CAST(floor(CAST(embedding[2] AS DOUBLE) * 1000 + 0.5)
            AS BIGINT) AS s1
        FROM embeddings
        WHERE vec_id IS NOT NULL AND embedding IS NOT NULL
          AND embedding[1] IS NOT NULL AND embedding[2] IS NOT NULL),
      p AS (
        SELECT id,
          (s0 - ((s0 % 100 + 100) % 100)) // 100 AS c0,
          (s1 - ((s1 % 100 + 100) % 100)) // 100 AS c1
        FROM v),
      n AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM p),
      cells AS (
        SELECT c0, c1, CAST(count(*) AS BIGINT) AS cn
        FROM p GROUP BY 1, 2),
      g AS (
        SELECT a.c0, a.c1, CAST(sum(b.cn) AS BIGINT) AS bn
        FROM cells a JOIN cells b
          ON abs(a.c0 - b.c0) <= 1 AND abs(a.c1 - b.c1) <= 1
        GROUP BY 1, 2),
      f AS (
        SELECT c.c0, c.c1, c.cn,
          (g.bn * 1000000 >= 60000 * (SELECT nn FROM n)) AS core
        FROM cells c JOIN g ON g.c0 = c.c0 AND g.c1 = c.c1),
      x AS (
        SELECT DISTINCT a.c0, a.c1 FROM f a JOIN f b
          ON abs(a.c0 - b.c0) <= 1 AND abs(a.c1 - b.c1) <= 1
          AND b.core),
      cl AS (
        SELECT f.c0, f.c1, f.cn,
          CASE WHEN f.core THEN 'core'
            WHEN x.c0 IS NOT NULL THEN 'border'
            ELSE 'noise' END AS lbl
        FROM f LEFT JOIN x ON x.c0 = f.c0 AND x.c1 = f.c1),
      cs AS (
        SELECT lbl, CAST(count(*) AS BIGINT) AS n_cells,
          CAST(sum(cn) AS BIGINT) AS n_points
        FROM cl GROUP BY 1),
      isum AS (
        SELECT cl.lbl AS lbl, CAST(sum(p.id) AS BIGINT) AS id_sum
        FROM p JOIN cl ON cl.c0 = p.c0 AND cl.c1 = p.c1 GROUP BY 1)
      SELECT cs.lbl AS dbscan_label, cs.n_cells, cs.n_points,
        CAST((cs.n_points * 1000000) // (SELECT nn FROM n) AS BIGINT)
          AS share_ppm,
        isum.id_sum
      FROM cs JOIN isum ON isum.lbl = cs.lbl
      ORDER BY dbscan_label""",

    // q301's quantize/flag CTEs verbatim, then min-label connected
    // components over the core cells (recursive reach, the q207 CC
    // idiom) with the same positional cell-id encode as the Spark side
    "q303_dbscan_clusters" -> """
      WITH v AS (
        SELECT CAST(vec_id AS BIGINT) AS id,
          CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000 + 0.5)
            AS BIGINT) AS s0,
          CAST(floor(CAST(embedding[2] AS DOUBLE) * 1000 + 0.5)
            AS BIGINT) AS s1
        FROM embeddings
        WHERE vec_id IS NOT NULL AND embedding IS NOT NULL
          AND embedding[1] IS NOT NULL AND embedding[2] IS NOT NULL),
      p AS (
        SELECT id,
          (s0 - ((s0 % 100 + 100) % 100)) // 100 AS c0,
          (s1 - ((s1 % 100 + 100) % 100)) // 100 AS c1
        FROM v),
      n AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM p),
      cells AS (
        SELECT c0, c1, CAST(count(*) AS BIGINT) AS cn
        FROM p GROUP BY 1, 2),
      g AS (
        SELECT a.c0, a.c1, CAST(sum(b.cn) AS BIGINT) AS bn
        FROM cells a JOIN cells b
          ON abs(a.c0 - b.c0) <= 1 AND abs(a.c1 - b.c1) <= 1
        GROUP BY 1, 2),
      f AS (
        SELECT c.c0, c.c1, c.cn,
          (g.bn * 1000000 >= 60000 * (SELECT nn FROM n)) AS core
        FROM cells c JOIN g ON g.c0 = c.c0 AND g.c1 = c.c1),
      cor AS (
        SELECT (c0 + 1000000) * 2000001 + (c1 + 1000000) AS cell,
          c0, c1, cn
        FROM f WHERE core),
      e AS (
        SELECT a.cell AS src, b.cell AS dst FROM cor a JOIN cor b
          ON abs(a.c0 - b.c0) <= 1 AND abs(a.c1 - b.c1) <= 1
          AND a.cell <> b.cell),
      reach AS (
        SELECT cell AS nd, cell AS l FROM cor
        UNION
        SELECT e.dst, r.l FROM reach r JOIN e ON e.src = r.nd),
      cls AS (
        SELECT nd AS cell, CAST(min(l) AS BIGINT) AS cluster_id
        FROM reach GROUP BY nd),
      cc AS (
        SELECT cls.cluster_id, CAST(count(*) AS BIGINT) AS n_cells,
          CAST(sum(cor.cn) AS BIGINT) AS n_points
        FROM cor JOIN cls USING (cell) GROUP BY 1),
      ci AS (
        SELECT cls.cluster_id, CAST(sum(p.id) AS BIGINT) AS id_sum
        FROM p JOIN cor ON cor.c0 = p.c0 AND cor.c1 = p.c1
        JOIN cls ON cls.cell = cor.cell GROUP BY 1)
      SELECT cc.cluster_id, cc.n_cells, cc.n_points,
        CAST((cc.n_points * 1000000) // (SELECT nn FROM n) AS BIGINT)
          AS share_ppm,
        ci.id_sum
      FROM cc JOIN ci USING (cluster_id)
      ORDER BY cluster_id""".replaceFirst("WITH ", "WITH RECURSIVE "),

    "q123_kmeans" -> s"""$KmeansCte
      SELECT cell, CAST(count(*) AS BIGINT) AS n, CAST(sum(id) AS BIGINT) AS id_sum
      FROM i2 GROUP BY cell ORDER BY cell""",

    "q179_semdedup_projected" -> s"""
      WITH e AS (
        SELECT CAST(vec_id AS BIGINT) AS id,
          CAST(embedding AS DOUBLE[]) AS rv,
          list_transform(CAST(embedding AS DOUBLE[]),
            x -> CAST(floor(x * 1000 + 0.5) AS BIGINT)) AS qv
        FROM embeddings),
      v AS (
        SELECT id, rv,
          list_transform(generate_series(0, 15), j ->
            CAST(list_sum(list_transform(generate_series(0, 63), i ->
              qv[i + 1] *
                ${graft.operators.Projection.signSql("j * 64 + i + 42")}))
              AS BIGINT)) AS sv
        FROM e),
      c AS (
        SELECT cell, cv FROM (
          SELECT row_number() OVER (ORDER BY id) - 1 AS cell, sv AS cv FROM v) t
        WHERE cell < 8),
      a AS (
        SELECT id, sv, cell,
          row_number() OVER (PARTITION BY id ORDER BY
            list_sum(list_transform(generate_series(1, len(sv)),
              i -> (sv[i] - cv[i]) * (sv[i] - cv[i]))), cell) AS rn
        FROM v CROSS JOIN c),
      i1 AS (SELECT id, sv, cell FROM a WHERE rn = 1),
      g AS (
        SELECT cell, dim, CAST(sum(x) AS BIGINT) AS sm, CAST(count(*) AS BIGINT) AS n
        FROM (SELECT cell, CAST(generate_subscripts(sv, 1) AS BIGINT) AS dim,
                unnest(sv) AS x FROM i1) t
        GROUP BY cell, dim),
      ct AS (
        SELECT cell,
          list(CAST(floor(CAST(sm AS DOUBLE) / n) AS BIGINT) ORDER BY dim) AS cv
        FROM g GROUP BY cell),
      b AS (
        SELECT id, cell,
          row_number() OVER (PARTITION BY id ORDER BY
            list_sum(list_transform(generate_series(1, len(sv)),
              i -> (sv[i] - cv[i]) * (sv[i] - cv[i]))), cell) AS rn
        FROM v CROSS JOIN ct),
      i2 AS (SELECT id, cell FROM b WHERE rn = 1),
      pairs AS (
        SELECT ia.id AS id_a, ib.id AS id_b
        FROM i2 ia JOIN i2 ib ON ia.cell = ib.cell AND ia.id < ib.id),
      losers AS (
        SELECT DISTINCT p.id_b
        FROM pairs p
        JOIN v va ON va.id = p.id_a
        JOIN v vb ON vb.id = p.id_b
        WHERE list_dot_product(va.rv, vb.rv)
          / (sqrt(list_dot_product(va.rv, va.rv))
             * sqrt(list_dot_product(vb.rv, vb.rv))) >= 0.3)
      SELECT id AS vec_id, cell FROM i2
      WHERE id NOT IN (SELECT id_b FROM losers)
      ORDER BY vec_id""",

    "q124_semdedup" -> s"""$KmeansCte,
      pairs AS (
        SELECT ia.id AS id_a, ib.id AS id_b
        FROM i2 ia JOIN i2 ib ON ia.cell = ib.cell AND ia.id < ib.id),
      losers AS (
        SELECT DISTINCT p.id_b
        FROM pairs p
        JOIN v va ON va.id = p.id_a
        JOIN v vb ON vb.id = p.id_b
        WHERE list_dot_product(va.rv, vb.rv)
          / (sqrt(list_dot_product(va.rv, va.rv))
             * sqrt(list_dot_product(vb.rv, vb.rv))) >= 0.3)
      SELECT id AS vec_id, cell FROM i2
      WHERE id NOT IN (SELECT id_b FROM losers)
      ORDER BY vec_id""",

    "q168_hard_negatives" -> hardNegativesOracle(8),
    "q205_hard_negatives_scaled" -> hardNegativesOracle(80),

    "q169_label_noise" -> labelNoiseOracle(8),
    "q206_label_noise_scaled" -> labelNoiseOracle(80),

    "q150_knn_graph" -> s"""$KmeansCte,
      pairs AS (
        SELECT ia.id AS src, ib.id AS dst,
          list_dot_product(va.rv, vb.rv)
            / (sqrt(list_dot_product(va.rv, va.rv))
               * sqrt(list_dot_product(vb.rv, vb.rv))) AS cos
        FROM i2 ia JOIN i2 ib ON ia.cell = ib.cell AND ia.id <> ib.id
        JOIN v va ON va.id = ia.id
        JOIN v vb ON vb.id = ib.id),
      ranked AS (
        SELECT src, dst, cos,
          row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rn
        FROM pairs WHERE NOT isnan(cos))
      SELECT src, CAST(rn AS BIGINT) AS rn, dst, cos
      FROM ranked WHERE rn <= 3 ORDER BY src, rn""",

    "q203_knn_graph_scaled" -> s"""${kmeansCte("TRUE", 80)},
      pairs AS (
        SELECT ia.id AS src, ib.id AS dst,
          list_dot_product(va.rv, vb.rv)
            / (sqrt(list_dot_product(va.rv, va.rv))
               * sqrt(list_dot_product(vb.rv, vb.rv))) AS cos
        FROM i2 ia JOIN i2 ib ON ia.cell = ib.cell AND ia.id <> ib.id
        JOIN v va ON va.id = ia.id
        JOIN v vb ON vb.id = ib.id),
      ranked AS (
        SELECT src, dst, cos,
          row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rn
        FROM pairs WHERE NOT isnan(cos))
      SELECT src, CAST(rn AS BIGINT) AS rn, dst, cos
      FROM ranked WHERE rn <= 3 ORDER BY src, rn""",

    "q151_proto_pruning" -> s"""$KmeansCte,
      d AS (
        SELECT i2.cell, i2.id,
          list_sum(list_transform(generate_series(1, len(v.sv)),
            i -> (v.sv[i] - ct.cv[i]) * (v.sv[i] - ct.cv[i]))) AS dist
        FROM i2 JOIN v ON v.id = i2.id JOIN ct ON ct.cell = i2.cell),
      ranked AS (
        SELECT cell, id, dist,
          row_number() OVER (PARTITION BY cell ORDER BY dist DESC, id) AS rn
        FROM d)
      SELECT cell, CAST(rn AS BIGINT) AS rn, id AS vec_id,
        CAST(dist AS BIGINT) AS dist
      FROM ranked WHERE rn <= 10 ORDER BY cell, rn""",

    "q125_int8_quant" -> """
      WITH t AS (
        SELECT CAST(vec_id AS BIGINT) AS vec_id,
          CAST(embedding AS DOUBLE[]) AS dv,
          list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x))) AS m
        FROM embeddings),
      q AS (
        SELECT vec_id, m,
          list_transform(dv, x -> CASE WHEN m = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST(floor(x * 127 / m + 0.5) AS BIGINT) END) AS qs
        FROM t)
      SELECT vec_id, m AS qscale,
        CAST(list_sum(qs) AS BIGINT) AS q_sum,
        CAST(list_sum(list_transform(qs, x -> x * x)) AS BIGINT) AS q_norm2
      FROM q ORDER BY vec_id""",

    "q80_cosine_dedup" -> s"""
      WITH b AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
          $BucketSql AS bucket
        FROM embeddings),
      losers AS (
        SELECT DISTINCT r.vec_id
        FROM b l JOIN b r ON l.bucket = r.bucket AND l.vec_id < r.vec_id
        WHERE list_dot_product(l.v, r.v)
          / (sqrt(list_dot_product(l.v, l.v)) * sqrt(list_dot_product(r.v, r.v)))
          >= 0.3)
      SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings
      WHERE vec_id NOT IN (SELECT vec_id FROM losers)
      ORDER BY vec_id""",
    "q41_ann_bruteforce" -> s"""
      WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
                 FROM embeddings WHERE vec_id < 10),
      c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
            FROM embeddings WHERE vec_id >= 10),
      scored AS (
        SELECT query_id, neighbor_id, $CosSql AS cosine FROM c CROSS JOIN q),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id
          ORDER BY cosine DESC, neighbor_id ASC) AS rank
        FROM scored)
      SELECT query_id, rank, neighbor_id, cosine FROM ranked
      WHERE rank <= 5 ORDER BY query_id, rank""",

    "q284_mmr_rerank" -> mmrSql(k = 10, m = 50, lambdaPpm = 700000L),

    "q283_retrieval_eval" -> s"""
      WITH q AS (
        SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv, label
        FROM embeddings WHERE vec_id < 20),
      c AS (
        SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv,
          label
        FROM embeddings WHERE vec_id >= 20),
      scored AS (
        SELECT query_id, neighbor_id, q.label AS ql, c.label AS nl,
          $CosSql AS cosine
        FROM c CROSS JOIN q),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id
          ORDER BY cosine DESC, neighbor_id ASC) AS r
        FROM scored),
      topk AS (
        SELECT query_id, r, (ql = nl) AS rel FROM ranked WHERE r <= 10),
      hits AS (
        SELECT query_id, r, rel,
          sum(CASE WHEN rel THEN 1 ELSE 0 END) OVER (
            PARTITION BY query_id ORDER BY r) AS h
        FROM topk),
      pq AS (
        SELECT query_id,
          CAST(sum(CASE WHEN rel THEN 1 ELSE 0 END) AS BIGINT) AS n_rel_k,
          min(CASE WHEN rel THEN r END) AS frr,
          sum(CASE WHEN rel THEN (1000000 * h) // r END) AS apn
        FROM hits GROUP BY 1),
      tot AS (
        SELECT q.query_id, CAST(count(c.neighbor_id) AS BIGINT) AS tot
        FROM q LEFT JOIN c ON c.label = q.label GROUP BY 1)
      SELECT pq.query_id, n_rel_k,
        CAST(frr AS BIGINT) AS first_rel_rank,
        CAST(coalesce(1000000 // frr, 0) AS BIGINT) AS mrr_ppm,
        CAST((1000000 * n_rel_k) // 10 AS BIGINT) AS p_at_k_ppm,
        CASE WHEN tot > 0 THEN CAST((1000000 * n_rel_k) // tot AS BIGINT)
          END AS recall_at_k_ppm,
        CASE WHEN tot > 0 THEN
          CAST(coalesce(apn, 0) // least(10, tot) AS BIGINT)
          END AS ap_at_k_ppm
      FROM pq JOIN tot ON tot.query_id = pq.query_id
      ORDER BY pq.query_id""",

    "q42_ann_lsh" -> s"""
      WITH b AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
          (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END)
          + (CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END)
          + (CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END)
          + (CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END)
          + (CASE WHEN embedding[5] > 0 THEN 16 ELSE 0 END)
          + (CASE WHEN embedding[6] > 0 THEN 32 ELSE 0 END)
          + (CASE WHEN embedding[7] > 0 THEN 64 ELSE 0 END)
          + (CASE WHEN embedding[8] > 0 THEN 128 ELSE 0 END) AS bucket
        FROM embeddings),
      q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM b WHERE vec_id < 10),
      c AS (SELECT vec_id AS neighbor_id, v AS cv, bucket FROM b WHERE vec_id >= 10),
      scored AS (
        SELECT query_id, neighbor_id, $CosSql AS cosine
        FROM c JOIN q USING (bucket)),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id
          ORDER BY cosine DESC, neighbor_id ASC) AS rank
        FROM scored)
      SELECT query_id, rank, neighbor_id, cosine FROM ranked
      WHERE rank <= 3 ORDER BY query_id, rank""",

    "q43_embedding_neardup" -> s"""
      WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings),
      pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1)
      SELECT p.id_a, p.id_b,
        list_dot_product(va.ve, vb.ve)
          / (sqrt(list_dot_product(va.ve, va.ve)) * sqrt(list_dot_product(vb.ve, vb.ve))) AS cosine,
        (list_dot_product(va.ve, vb.ve)
          / (sqrt(list_dot_product(va.ve, va.ve)) * sqrt(list_dot_product(vb.ve, vb.ve)))) > 0.3 AS near_dup
      FROM pairs p JOIN v va ON va.vec_id = p.id_a JOIN v vb ON vb.vec_id = p.id_b
      ORDER BY p.id_a""",

    "q101_label_centroids" -> """
      WITH t AS (
        SELECT CAST(label AS BIGINT) AS label,
          CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim,
          unnest(embedding) AS x
        FROM embeddings)
      SELECT label, dim,
        CAST(sum(CAST(round(CAST(x AS DOUBLE) * 1073741824) AS BIGINT))
          AS DOUBLE) / 1073741824 / count(*) AS mean
      FROM t GROUP BY label, dim ORDER BY label, dim""",

    "q44_vector_stats" -> """
      SELECT CAST(label AS BIGINT) AS label, count(*) AS n,
        min(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))) AS min_norm,
        max(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))) AS max_norm
      FROM embeddings GROUP BY label ORDER BY label""",

    // IVFADC replay: positional cells (row_number over the cell-source
    // order), codebook c for subspace i = 1-based slice [i*16+1, i*16+16]
    // of vector 3+c. Every distance is the operator's exact arithmetic:
    // assignment d = <c,c> - 2<v,c> (list_dot_product = the same
    // sequential fold), probe d = full L2 as a 0.0-seeded left fold,
    // table entries ((q-cent)-cb)^2 likewise, adist = left-assoc sum of
    // the m lookups.
    "q74_ivfpq_adc" -> """
      WITH cent AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
          CAST(embedding AS DOUBLE[]) AS mv
        FROM embeddings WHERE vec_id % 50 = 0),
      cb AS (
        SELECT CAST(vec_id - 3 AS BIGINT) AS c, CAST(embedding AS DOUBLE[]) AS cbv
        FROM embeddings WHERE vec_id >= 3 AND vec_id < 11),
      subs AS (SELECT unnest(generate_series(0, 3)) AS i),
      q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
            FROM embeddings WHERE vec_id < 3),
      c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
            FROM embeddings WHERE vec_id >= 3),
      assigned AS (
        SELECT neighbor_id, cv, cell, mv FROM (
          SELECT neighbor_id, cv, cell, mv,
            row_number() OVER (PARTITION BY neighbor_id ORDER BY
              (list_dot_product(mv, mv) - 2 * list_dot_product(cv, mv)), cell) AS rn
          FROM c CROSS JOIN cent) WHERE rn = 1),
      codedist AS (
        SELECT a.neighbor_id, a.cell, subs.i, cb.c,
          (list_dot_product(cb.cbv[subs.i*16+1 : subs.i*16+16],
                            cb.cbv[subs.i*16+1 : subs.i*16+16])
           - 2 * list_dot_product(
               list_transform(generate_series(1, 16),
                 j -> a.cv[subs.i*16+j] - a.mv[subs.i*16+j]),
               cb.cbv[subs.i*16+1 : subs.i*16+16])) AS d
        FROM assigned a CROSS JOIN subs CROSS JOIN cb),
      codes AS (
        SELECT neighbor_id, cell,
          max(CASE WHEN i = 0 THEN c END) AS c0,
          max(CASE WHEN i = 1 THEN c END) AS c1,
          max(CASE WHEN i = 2 THEN c END) AS c2,
          max(CASE WHEN i = 3 THEN c END) AS c3
        FROM (SELECT *, row_number() OVER (PARTITION BY neighbor_id, i
                ORDER BY d, c) AS rn FROM codedist)
        WHERE rn = 1 GROUP BY neighbor_id, cell),
      probed AS (
        SELECT query_id, qv, cell, mv FROM (
          SELECT q.query_id, q.qv, ct.cell, ct.mv,
            row_number() OVER (PARTITION BY q.query_id ORDER BY
              list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                list_transform(generate_series(1, 64),
                  j -> (q.qv[j] - ct.mv[j]) * (q.qv[j] - ct.mv[j]))),
                (a, b) -> a + b), ct.cell) AS rn
          FROM q CROSS JOIN cent ct) WHERE rn <= 2),
      adc AS (
        SELECT p.query_id, p.cell, subs.i, cb.c,
          list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
            list_transform(generate_series(1, 16),
              j -> (p.qv[subs.i*16+j] - p.mv[subs.i*16+j] - cb.cbv[subs.i*16+j])
                 * (p.qv[subs.i*16+j] - p.mv[subs.i*16+j] - cb.cbv[subs.i*16+j]))),
            (a, b) -> a + b) AS d
        FROM probed p CROSS JOIN subs CROSS JOIN cb),
      scored AS (
        SELECT p.query_id, e.neighbor_id,
          t0.d + t1.d + t2.d + t3.d AS adist
        FROM probed p
        JOIN codes e USING (cell)
        JOIN adc t0 ON t0.query_id = p.query_id AND t0.cell = p.cell
          AND t0.i = 0 AND t0.c = e.c0
        JOIN adc t1 ON t1.query_id = p.query_id AND t1.cell = p.cell
          AND t1.i = 1 AND t1.c = e.c1
        JOIN adc t2 ON t2.query_id = p.query_id AND t2.cell = p.cell
          AND t2.i = 2 AND t2.c = e.c2
        JOIN adc t3 ON t3.query_id = p.query_id AND t3.cell = p.cell
          AND t3.i = 3 AND t3.c = e.c3),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id
          ORDER BY adist, neighbor_id) AS rank
        FROM scored)
      SELECT query_id, rank, neighbor_id, adist FROM ranked
      WHERE rank <= 5 ORDER BY query_id, rank""",

    "q66_ann_ivf" -> s"""
      WITH cent AS (
        SELECT CAST(vec_id AS BIGINT) AS cell, CAST(embedding AS DOUBLE[]) AS mv
        FROM embeddings WHERE vec_id % 50 = 0),
      q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
            FROM embeddings WHERE vec_id < 10),
      c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
            FROM embeddings WHERE vec_id >= 10),
      cdist AS (
        SELECT neighbor_id, cv, cell,
          row_number() OVER (PARTITION BY neighbor_id ORDER BY
            (list_dot_product(mv, mv) - 2 * list_dot_product(cv, mv)), cell) AS rn
        FROM c CROSS JOIN cent),
      assigned AS (SELECT neighbor_id, cv, cell FROM cdist WHERE rn = 1),
      qdist AS (
        SELECT query_id, qv, cell,
          row_number() OVER (PARTITION BY query_id ORDER BY
            (list_dot_product(mv, mv) - 2 * list_dot_product(qv, mv)), cell) AS rn
        FROM q CROSS JOIN cent),
      probed AS (SELECT query_id, qv, cell FROM qdist WHERE rn <= 2),
      scored AS (
        SELECT query_id, neighbor_id, $CosSql AS cosine
        FROM assigned JOIN probed USING (cell)),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id
          ORDER BY cosine DESC, neighbor_id ASC) AS rank
        FROM scored)
      SELECT query_id, rank, neighbor_id, cosine FROM ranked
      WHERE rank <= 3 ORDER BY query_id, rank""")
}
