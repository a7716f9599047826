package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Train/test split construction and LEAKAGE audit — the eval-hygiene
  * gate: a hash split is uniform over documents, but near-duplicate
  * PAIRS that straddle the boundary leak training text into the test
  * set (Lee et al. 2021 measured the score inflation). The audit
  * counts straddling candidate pairs so a release can gate on
  * cross_ppm = 0 after cluster-aware reassignment.
  */
object Splits {

  /** Deterministic hash split: is_train ⇔ houseHash(id) mod 1000 <
    * trainPermille — re-run/engine stable (the q98 gate family), no
    * RNG. Output: (idCol, is_train).
    *
    * Caveat (measured, q291): the affine house hash is affine mod
    * 1000, so a DENSE SMALL id space stripes — ids 0..260 all land
    * train at 800 permille, and a 150-key corpus splits 100/0. At
    * production id ranges the stripes average out to the requested
    * rate; for dense small key spaces (user ids, enum codes) split on
    * [[Sampling.mixedBucket]] instead (the square-recombined mix).
    */
  def hashSplit(df: DataFrame, idCol: String,
                trainPermille: Int): DataFrame = {
    require(trainPermille >= 0 && trainPermille <= 1000,
      s"trainPermille must be in [0, 1000], got $trainPermille")
    df.filter(col(idCol).isNotNull)
      .select(col(idCol).cast("long").as(idCol)).distinct()
      .withColumn("is_train",
        pmod(col(idCol) * 1000003L + 17L, lit(1000000007L)) % 1000
          < trainPermille)
  }

  /** Leakage audit: given a split assignment and a near-dup candidate
    * pair set (any generator — banded LSH, CDC Jaccard, kNN), ONE
    * summary row: split sizes, pair count, straddling pairs, and
    * cross_ppm (null when there are no pairs). A pair with either id
    * missing from the assignment drops (it isn't part of the split).
    *
    * Scale shape: two co-partitioned equi-joins of the PAIR table
    * (edge-set-sized) against the assignment, one combinable aggregate
    * each side. Nothing corpus² anywhere — the pair generator owns its
    * own bound (the q73 capped-bucket contract).
    */
  def leakageAudit(assign: DataFrame, pairs: DataFrame,
                   idCol: String): DataFrame = {
    val a = assign.select(col(idCol).as("__id"),
      col("is_train").as("__ta"))
    val b = assign.select(col(idCol).as("__id2"),
      col("is_train").as("__tb"))
    val joined = pairs
      .join(a, col("id_a") === col("__id"))
      .join(b, col("id_b") === col("__id2"))
    val sizes = assign.agg(
      sum(when(col("is_train"), 1L).otherwise(0L)).as("n_train"),
      sum(when(col("is_train"), 0L).otherwise(1L)).as("n_test"))
    joined.agg(count(lit(1)).as("n_pairs"),
        sum(when(col("__ta") =!= col("__tb"), 1L).otherwise(0L))
          .as("n_cross"))
      .crossJoin(broadcast(sizes))
      .select(col("n_train"), col("n_test"), col("n_pairs"),
        col("n_cross"),
        when(col("n_pairs") > 0,
          expr("(n_cross * 1000000L) div n_pairs")).as("cross_ppm"))
  }
}
