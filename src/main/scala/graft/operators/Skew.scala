package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation joins for 100 TB fact tables. AQE's skew-join split
  * handles most cases at runtime; explicit salting is the deterministic
  * fallback when a handful of hot keys dominate (the classic power-law
  * key distribution of web/training corpora).
  */
object Skew {

  /** Salted equi-join — single-key facade over [[Joins.saltedJoin]]
    * (one implementation, one contract): the skewed (big) side scatters
    * across [0, factor) sub-keys via a DETERMINISTIC whole-row hash
    * (rand() was the original salt source; the hash keeps the plan
    * re-run- and retry-stable), the small side replicates `factor`
    * times, and the output is exactly the plain join. Left-preserving
    * join types only — see the delegate's scaladoc.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 factor: Int, joinType: String = "inner"): DataFrame =
    Joins.saltedJoin(big, small, Seq(key), factor, joinType)

  /** Per-key frequency histogram — use to pick `factor` and decide whether
    * salting is worth it (one cheap agg pass).
    */
  def keyHistogram(df: DataFrame, key: String, topN: Int = 20): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(key).asc)
      .limit(topN)
}
