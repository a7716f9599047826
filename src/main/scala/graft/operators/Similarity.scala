package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate / exact nearest-neighbor search over embedding columns.
  *
  * Scale design:
  *  - Brute force is query-broadcast: the (small) query set is broadcast
  *    against the (huge) corpus, so the corpus is scanned exactly once with
  *    no shuffle of the corpus side; the per-query top-k runs as a
  *    partial-topk aggregation (window over query id after a k-limited
  *    exchange). 10 queries × 100 TB corpus = one pass.
  *  - The LSH path buckets both sides by a sign-bit sketch first, so the
  *    join degenerates to an equi-join on the bucket id — candidates shrink
  *    by ~2^bits and the shuffle is key-partitioned, never a cross join.
  */
object Similarity {

  /** Exact top-k cosine neighbors for each query vector.
    *
    * @param corpus   (id, vec) DataFrame — the big side, scanned once
    * @param queries  (id, vec) DataFrame — small, broadcast
    * @return (query_id, neighbor_id, cosine, rank) with rank 1..k,
    *         ties broken by neighbor id ascending.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.crossJoin(q)
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Attach a sign-bit LSH bucket column. */
  def withBucket(df: DataFrame, vecCol: String, nBits: Int = 8): DataFrame =
    df.withColumn("bucket", signBucket(col(vecCol), nBits))

  /** Approximate top-k: candidates restricted to the query's LSH bucket.
    * Same output shape as [[bruteForceTopK]]; queries that land in an
    * empty bucket yield no rows (callers can fall back to brute force).
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int, nBits: Int = 8): DataFrame = {
    val q = broadcast(withBucket(queries, vecCol, nBits)
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"), col("bucket")))
    val c = withBucket(corpus, vecCol, nBits)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"), col("bucket"))
    val scored = c.join(q, "bucket")
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Cosine similarity for explicit id pairs (near-dup checking). */
  def pairCosine(vectors: DataFrame, idCol: String, vecCol: String,
                 pairs: DataFrame): DataFrame = {
    val va = vectors.select(col(idCol).as("id_a"), col(vecCol).as("va"))
    val vb = vectors.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
    pairs.join(va, "id_a").join(vb, "id_b")
      .select(col("id_a"), col("id_b"), cosine(col("va"), col("vb")).as("cosine"))
  }
}
