package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic weighted sampling without replacement — the "pick k
  * representative documents per source, preferring the heavy ones" step
  * of a corpus audit or a scaling-law pilot run. Inspired by the
  * weighted-reservoir priority scheme of Efraimidis & Spirakis 2006
  * (Inf. Process. Lett. 97(5), "Weighted random sampling with a
  * reservoir"): every row gets a priority from a uniform hash and its
  * weight, and the sample is the k smallest priorities per group.
  *
  * The textbook scheme uses u^(1/w) — a transcendental float whose
  * cross-engine last-bit differences would flip selections near ties, so
  * this uses the RATIONAL priority `h div w` (h = the house portable
  * affine hash, uniform on [0, P)): exactly replayable in any engine,
  * re-run/repartition stable, monotone in w (heavier rows draw smaller
  * priorities on average — approximately weight-proportional, a
  * documented deviation from the exact E-S inclusion probabilities,
  * which are not expressible in portable integer arithmetic).
  *
  * Scale shape: the priority is narrow per-row arithmetic; the per-group
  * cut is the k-bounded heap ([[TopK.perGroupAgg]]), which ships at most
  * k (priority, id) pairs per group per map partition — a mega-group
  * collapses map-side instead of buffering in one window task. The
  * weight join-back touches only the broadcast k·|groups|-row sample.
  * Priorities stay below P < 2^30, so the heap's double ordering is
  * exact.
  */
object Sampling {

  /** k rows per group, smallest priority first; priority =
    * pmod(id·1000003 + 17, 1e9+7) div max(w, 1), ties broken by id.
    * pmod (not `%`, which keeps the dividend's sign) so NEGATIVE ids
    * still land uniformly on [0, P) and the monotone-in-weight property
    * holds for them too. `idCol` must be integral and unique across the
    * whole frame (it addresses rows); null ids/weights are excluded up
    * front (they cannot be addressed deterministically). Weights are
    * clamped to >= 1 so zero/negative weights behave like weight 1
    * instead of dividing by zero.
    *
    * Output: groupCols ++ (rn [1..k], idCol, weight, priority).
    */
  def weightedSample(df: DataFrame, groupCols: Seq[String], idCol: String,
                     weightCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val pri = pmod(col(idCol).cast("long") * 1000003L + 17L, lit(1000000007L))
      .divide(greatest(col(weightCol).cast("long"), lit(1L))).cast("long")
    val base = df
      .filter(col(idCol).isNotNull && col(weightCol).isNotNull)
      .select((groupCols.map(col) :+ col(idCol).cast("long").as("__id") :+
        col(weightCol).cast("long").as("__w") :+ pri.as("__p")): _*)
    // BoundedTopKAgg orders (value DESC, id ASC); negate the priority so
    // "largest value" = "smallest priority".
    val top = TopK
      .perGroupAgg(base, groupCols, -col("__p"), col("__id"), k)
      .select((groupCols.map(col) :+ col("rn").cast("long").as("rn") :+
        col("id").as("__id") :+ (-col("value")).cast("long").as("priority")): _*)
    base.select(col("__id"), col("__w"))
      .join(broadcast(top), Seq("__id"))
      .select((groupCols.map(col) :+ col("rn") :+ col("__id").as(idCol) :+
        col("__w").as("weight") :+ col("priority")): _*)
  }

  /** Largest-remainder (Hamilton) apportionment: split exactly `k` slots
    * across strata proportionally to a non-negative integer weight, in
    * exact integer arithmetic. base_i = (k·w_i) div W; the L = k − Σbase
    * leftover slots go to the largest remainders (k·w_i) mod W, ties to
    * the smaller key — the deterministic total order both engines
    * replay. Σ alloc = k exactly whenever W > 0 (the property float
    * rounding cannot give); W = 0 allocates nothing.
    *
    * `weights` is already stratum-level — a BOUNDED table (the
    * [[Doremi]] contract), so the remainder-rank window runs over k
    * rows, never a corpus. Output: (keyCol, weightCol, alloc).
    */
  def apportion(weights: DataFrame, keyCol: String, weightCol: String,
                k: Long): DataFrame = {
    require(k >= 0, s"k must be >= 0, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("__r").desc, col(keyCol).asc)
    val q = weights
      .filter(col(weightCol).isNotNull && col(weightCol) >= 0)
      .select(col(keyCol), col(weightCol).cast("long").as("__w"))
      .crossJoin(broadcast(weights
        .filter(col(weightCol).isNotNull && col(weightCol) >= 0)
        .agg(sum(col(weightCol).cast("long")).as("__tw"))))
      .withColumn("__base", when(col("__tw") > 0,
        expr(s"(__w * ${k}L) div __tw")).otherwise(lit(0L)))
      .withColumn("__r", when(col("__tw") > 0,
        expr(s"(__w * ${k}L) % __tw")).otherwise(lit(0L)))
    q.crossJoin(broadcast(q.agg(
        (lit(k) - coalesce(sum(col("__base")), lit(0L))).as("__l"))))
      .withColumn("__rk", row_number().over(w))
      .select(col(keyCol), col("__w").as(weightCol),
        (col("__base") + when(col("__rk") <= col("__l") && col("__tw") > 0,
          1L).otherwise(0L)).as("alloc"))
  }

  /** Stratified exact-allocation sample: `k` rows total, split across
    * strata by [[apportion]] on the stratum COUNTS (proportional
    * allocation), each stratum's quota filled by the smallest portable
    * hash priorities (uniform within stratum, re-run/repartition
    * stable). The per-stratum cut is the k-bounded heap — a mega-stratum
    * collapses map-side (its heap is ≤ k entries, the global sample
    * size, since no stratum can be allocated more).
    *
    * `idCol` integral and unique (the [[weightedSample]] contract).
    * Output: (stratumCol, idCol, rn, alloc) — rn ∈ [1, alloc].
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
                       k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val base = df.filter(col(idCol).isNotNull && col(stratumCol).isNotNull)
      .select(col(stratumCol), col(idCol).cast("long").as("__id"))
      .withColumn("__p",
        pmod(col("__id") * 1000003L + 17L, lit(1000000007L)))
    val alloc = apportion(
      base.groupBy(col(stratumCol)).agg(count(lit(1)).as("__n")),
      stratumCol, "__n", k)
    val top = TopK.perGroupAgg(base, Seq(stratumCol), -col("__p"),
        col("__id"), k)
      .select(col(stratumCol), col("rn").cast("long").as("rn"),
        col("id").as(idCol))
    top.join(broadcast(alloc.select(col(stratumCol), col("alloc"))),
        stratumCol)
      .filter(col("rn") <= col("alloc"))
      .select(col(stratumCol), col(idCol), col("rn"), col("alloc"))
  }
}
