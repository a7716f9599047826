package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation joins for 100 TB fact tables. AQE's skew-join split
  * handles most cases at runtime; explicit salting is the deterministic
  * fallback when a handful of hot keys dominate (the classic power-law
  * key distribution of web/training corpora).
  */
object Skew {

  /** Salted equi-join: the skewed (big) side gets a random salt in
    * [0, factor); the small side is replicated `factor` times with every
    * salt value. The join key becomes (key, salt), splitting each hot
    * key's rows across `factor` reducers. Row multiplicity is unchanged —
    * each big-side row matches exactly its salt's replica.
    *
    * Only inner and left(-outer) are supported: those preserve multiplicity
    * because every big-side row sees exactly one replica per key. Right/full
    * outer would emit `factor` copies of each unmatched small-side replica,
    * so they are rejected rather than silently wrong.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 factor: Int, joinType: String = "inner"): DataFrame = {
    require(factor > 0)
    val jt = joinType.toLowerCase.replace("_", "").replace("outer", "")
    require(jt == "inner" || jt == "left",
      s"saltedJoin supports inner/left join types only (got '$joinType'): " +
        "outer-on-the-replicated-side would duplicate unmatched small rows")
    val salted = big.withColumn("__salt", (rand(seed = 42) * factor).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Per-key frequency histogram — use to pick `factor` and decide whether
    * salting is worth it (one cheap agg pass).
    */
  def keyHistogram(df: DataFrame, key: String, topN: Int = 20): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(key).asc)
      .limit(topN)
}
