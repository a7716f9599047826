package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** KMV distinct-count sketches with set algebra — the deterministic
  * cardinality layer between exact count(DISTINCT) (an EXPAND shuffle)
  * and approx_count_distinct (HLL: engine-opaque, union-only). Built on
  * [[graft.functions.expressions.KminSketchAgg]]; every number here is
  * integer arithmetic both engines replay, so the q267 oracle
  * hash-compares sketches AND estimates.
  *
  * The set-algebra readout is the piece HLL cannot give: two sources'
  * sketches alone answer "how many documents do they SHARE" (Beyer et
  * al. 2007) — the cross-crawl overlap / dedup-planning number — with
  * no second corpus pass and no id shuffle.
  */
object Sketches {

  /** Hash domain modulus (prime). The affine map below is a bijection on
    * [0, M), so distinct ids < M stay distinct.
    */
  val M: Long = 1000000007L

  /** The house portable id hash: ((x·1000003 + 17) mod M + M) mod M —
    * same family as the q98/q235 sampling hashes, uniform enough for
    * KMV's order statistics and trivially replayed in SQL.
    */
  def idHash(c: Column): Column =
    pmod(c.cast("long") * lit(1000003L) + lit(17L), lit(M))

  /** Per-group KMV sketch over (hashed) `idCol`: (groupCols*, sketch,
    * ndv_est). One k-long buffer per (group, partition), map-side
    * combined — ids never shuffle. While a group holds fewer than k
    * distinct ids the estimate is EXACT (= sketch size); saturated
    * groups estimate (k−1)·M div h₍k₎ (±1/√(k−2) relative).
    */
  def kminNdv(df: DataFrame, groupCols: Seq[String], idCol: String,
              k: Int): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    val sk = ColumnBridge.column(
      graft.functions.expressions.KminSketchAgg(
        ColumnBridge.expression(idHash(col(idCol))), k)
        .toAggregateExpression())
    df.filter(col(idCol).isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(sk.as("sketch"))
      .withColumn("ndv_est", ndvEstimate(col("sketch"), k))
  }

  /** Exact integer division for non-negative longs (the fleschMilli
    * idiom): strip the remainder first so the double divide sees an
    * exact multiple (< 2^53 — exact); bare Column./ would round-trip
    * through an inexact quotient and can land on the wrong integer.
    */
  private def idiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("long")

  /** Distinct-count estimate from a sketch column (see [[kminNdv]]). */
  def ndvEstimate(sk: Column, k: Int): Column =
    when(size(sk) < k, size(sk).cast("long"))
      .otherwise(idiv(lit((k - 1).toLong * M), element_at(sk, k)))

  /** Pairwise set-operation estimates from a BOUNDED sketch table
    * ([[kminNdv]] output): for every unordered group pair, distinct
    * estimates of each side, of the union, the Jaccard (ppm), and the
    * intersection — all from the sketches alone.
    *
    * Correctness of the union trick: the k smallest of A ∪ B are a
    * subset of (k smallest of A) ∪ (k smallest of B), so merging
    * sketches loses nothing. The union's k-sample is a uniform random
    * sample of A ∪ B (under the hash), so the fraction of it lying in
    * BOTH sketches estimates the Jaccard; intersection = J · |A ∪ B|.
    *
    * Scale shape: a groups² × k cross of k-long arrays — group counts
    * are bounded (sources, languages, shards), so this is driver-scale
    * arithmetic, never a corpus op.
    */
  def pairwiseSetOps(sketches: DataFrame, groupCol: String,
                     k: Int): DataFrame = {
    val a = sketches.select(col(groupCol).as("group_a"),
      col("sketch").as("__ska"), col("ndv_est").as("ndv_a"))
    val b = sketches.select(col(groupCol).as("group_b"),
      col("sketch").as("__skb"), col("ndv_est").as("ndv_b"))
    a.join(b, col("group_a") < col("group_b"))
      .withColumn("__uk",
        slice(array_sort(array_union(col("__ska"), col("__skb"))), 1, k))
      .withColumn("__usz", size(col("__uk")).cast("long"))
      .withColumn("est_union", ndvEstimate(col("__uk"), k))
      .withColumn("__common",
        size(array_intersect(col("__uk"),
          array_intersect(col("__ska"), col("__skb")))).cast("long"))
      .select(col("group_a"), col("group_b"), col("ndv_a"), col("ndv_b"),
        col("est_union"),
        idiv(col("__common") * lit(1000000L), col("__usz"))
          .as("jaccard_ppm"),
        idiv(col("est_union") * col("__common"), col("__usz"))
          .as("est_intersect"))
  }
}
