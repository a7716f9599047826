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

  /** Square-recombined portable bucket on [0, 1000): the linear house
    * hash is AFFINE mod 1000, so a dense small key space stripes (ids
    * 0..260 all land below 800 — the q291 lesson); squaring first
    * restores spread while every op stays within a long
    * (km < 1e9+7 ⇒ km² < 1e18, the recombine < 1e15). The q213
    * correlation fix applied to gating.
    */
  def mixedBucket(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val p = 1000000007L
    val km = pmod(c.cast("long"), lit(p))
    pmod(pmod(km * km, lit(p)) * 1000003L + km * 12345L + 17L, lit(p)) % 1000
  }

  /** The SQL-text twin of [[mixedBucket]] for DuckDB oracles. */
  def mixedBucketSql(c: String): String = {
    val km = s"((($c) % 1000000007 + 1000000007) % 1000000007)"
    s"((((($km * $km) % 1000000007) * 1000003 + $km * 12345 + 17)" +
      s" % 1000000007 + 1000000007) % 1000000007 % 1000)"
  }

  /** Coordinated-sampling join audit (Broder 1997's min-wise
    * coordination applied to dev-sampling; the VerdictDB/BlinkDB
    * "universe sample" rule) — the measurement behind the one sampling
    * decision that ruins dev corpora at scale: sampling each table
    * INDEPENDENTLY at rate p keeps only ~p² of the join (two
    * independent coins must both land), while gating BOTH sides on the
    * SAME hash of the JOIN KEY keeps exactly the join restricted to the
    * sampled key universe — an unbiased 1/p scale-up, and the join of
    * the samples IS the sample of the join.
    *
    * One summary row, all exact integers: the true join size, the
    * coordinated-sample join size with its 1/p scale-up estimate and
    * signed error ppm, and the naive independent-gate join size (left
    * gated on key, right gated on a decorrelated second hash) with its
    * 1/p² scale-up — the naive estimate is unbiased too, but its
    * variance explodes with key multiplicity; on clustered corpora the
    * measured error SHOWS the difference (generators with one-sided
    * multiplicity exhibit it mildly; real power-law corpora violently).
    *
    * Scale shape: two narrow hash-gate passes + the gated joins (each
    * strictly smaller than the true join) + one exact-count join. The
    * gates are engine-replayable ([[mixedBucket]] — q98's contract,
    * de-striped).
    *
    * Output (1 row): (n_pairs, n_coord, coord_est, coord_err_ppm,
    * n_naive, naive_est, naive_err_ppm).
    */
  def coordinatedJoinAudit(left: DataFrame, leftKey: String,
                           right: DataFrame, rightKey: String,
                           permille: Int): DataFrame = {
    require(permille > 0 && permille < 1000,
      s"permille must be in (0, 1000), got $permille")
    val lk = left.filter(col(leftKey).isNotNull)
      .select(col(leftKey).as("__k"))
    val rk = right.filter(col(rightKey).isNotNull)
      .select(col(rightKey).as("__k"))
    def cnt(l: DataFrame, r: DataFrame, name: String) =
      l.join(r, "__k").agg(count(lit(1)).as(name))
    val exact = cnt(lk, rk, "n_pairs")
    val gate = mixedBucket(col("__k")) < permille
    val coord = cnt(lk.filter(gate), rk.filter(gate), "n_coord")
    // the naive side decorrelates via a second mix round (bucket of the
    // bucketed key shifted into a fresh range) — any independent second
    // hash works; this one is engine-replayable
    val gate2 = mixedBucket(mixedBucket(col("__k")) + 7919L) < permille
    val naive = cnt(lk.filter(gate), rk.filter(gate2), "n_naive")
    // signed ppm error, sign-split truncating toward zero (the q288
    // convention), DECIMAL(38,0) headroom for 1e12-row joins
    def errPpm(c: String) = expr(
      s"""CASE WHEN n_pairs > 0 THEN
            CASE WHEN $c >= n_pairs
              THEN (CAST($c - n_pairs AS decimal(38,0)) * 1000000)
                div n_pairs
              ELSE -((CAST(n_pairs - $c AS decimal(38,0)) * 1000000)
                div n_pairs)
            END END""").cast("long")
    exact.crossJoin(coord).crossJoin(naive)
      .withColumn("coord_est",
        expr(s"(n_coord * 1000L) div $permille"))
      .withColumn("naive_est",
        expr(s"(n_naive * 1000000L) div (${permille.toLong * permille})"))
      .select(col("n_pairs"), col("n_coord"), col("coord_est"),
        errPpm("coord_est").as("coord_err_ppm"),
        col("n_naive"), col("naive_est"),
        errPpm("naive_est").as("naive_err_ppm"))
  }
}
