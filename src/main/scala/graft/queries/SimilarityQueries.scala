package graft.queries

import graft.Tables
import graft.operators.Similarity
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q41_ann_bruteforce" -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val queries = emb.filter(col("vec_id") < 10)
      val corpus = emb.filter(col("vec_id") >= 10)
      Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("neighbor_id"), col("cosine"))
        .orderBy(col("query_id"), col("rank"))
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

    "q44_vector_stats" -> { (s, d) =>
      // Per-label centroid norms — aggregation over vector columns using
      // position-wise sums (exact integer count + sequential-fold norm).
      val emb = Tables.embeddings(s, d)
      emb.groupBy(col("label"))
        .agg(count(lit(1)).as("n"),
          min(VectorFunctions.l2Norm(col("embedding"))).as("min_norm"),
          max(VectorFunctions.l2Norm(col("embedding"))).as("max_norm"))
        .orderBy(col("label"))
    })

  val oracle: Map[String, String] = Map(
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

    "q44_vector_stats" -> """
      SELECT label, count(*) AS n,
        min(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))) AS min_norm,
        max(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))) AS max_norm
      FROM embeddings GROUP BY label ORDER BY label""",

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
